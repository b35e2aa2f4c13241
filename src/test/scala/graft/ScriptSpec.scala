package graft

import org.apache.spark.sql.functions._

/** `$jslt` / `$jq` semantics (TestScript.java:18-56: both fixtures must turn
  * `{_id:"0", test:0}` into `{_id:"0", test:1}`; Script.java:71-73 re-key).
  */
class ScriptSpec extends SparkSpec {
  import spark.implicits._

  private val in = Seq(("0", "0", 0L)).toDF("key", "_id", "test")

  private def run1(stage: String, script: String) = {
    val out = pipeline.run(in, s"""[{"$stage": ${ujsonStr(script)}}]""")
    out.collect().map(r => (r.getAs[String]("key"), r.getAs[String]("_id"),
      r.getAs[Long]("test"))).toList
  }

  private def ujsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""

  test("$jslt inline object with matcher (TestScript jslt2)") {
    assert(run1("$jslt", """{"test": 1, *: .}""") == List(("0", "0", 1L)))
  }

  test("$jslt resource script (TestScript jslt1)") {
    assert(run1("$jslt", "resource:/test.jslt") == List(("0", "0", 1L)))
  }

  test("$jq inline merge (TestScript jq2)") {
    assert(run1("$jq", ". + {test: 1}") == List(("0", "0", 1L)))
  }

  test("$jq resource script (TestScript jq1)") {
    assert(run1("$jq", "resource:/test.jq") == List(("0", "0", 1L)))
  }

  test("$jslt re-keys when the result _id changes (Script.java:71-73)") {
    val out = pipeline.run(in,
      """[{"$jslt": "{\"_id\": \"9\", *: .}"}]""")
    val r = out.collect()(0)
    assert(r.getAs[String]("key") == "9" && r.getAs[String]("_id") == "9")
  }

  test("$jslt paths, arithmetic, if/else, let, functions") {
    val df = Seq(("a", 2L, "Hello World", Seq(1L, 2L, 3L)))
      .toDF("name", "n", "text", "xs")
    val out = pipeline.run(df,
      """[{"$jslt": "let two = 2 {\"dbl\": .n * $two, \"up\": uppercase(.name), \"nx\": size(.xs), \"first\": .xs[0], \"cls\": if (.n > 1) \"big\" else \"small\", \"w\": join(split(.text, \" \"), \"-\")}"}]""")
    val r = out.collect()(0)
    assert(r.getAs[Long]("dbl") == 4L)
    assert(r.getAs[String]("up") == "A")
    assert(r.getAs[Int]("nx") == 3)
    assert(r.getAs[Long]("first") == 1L)
    assert(r.getAs[String]("cls") == "big")
    assert(r.getAs[String]("w") == "Hello-World")
  }

  test("$jslt for-comprehension with filter") {
    val df = Seq((Seq(1L, 2L, 3L, 4L), 0L)).toDF("xs", "z")
    val out = pipeline.run(df,
      """[{"$jslt": "{\"doubled\": [for (.xs) . * 2 if (. > 2)], \"z\": .z}"}]""")
    assert(out.collect()(0).getAs[scala.collection.Seq[Long]]("doubled").toList == List(6L, 8L))
  }

  test("$jslt user def inline-expands in typed mode (non-recursive)") {
    val df = Seq((2L, 3L)).toDF("a", "b")
    val out = pipeline.run(df,
      """[{"$jslt": "def hyp2(x, y) $x * $x + $y * $y def twice(v) $v * 2 {\"h\": hyp2(.a, .b), \"t\": twice(.a)}"}]""")
    val r = out.collect()(0)
    assert(r.getAs[Long]("h") == 13L)
    assert(r.getAs[Long]("t") == 4L)
  }

  test("$jq typed: test/gsub compile to regexp columns") {
    val out = pipeline.run(in,
      """[{"$jq": "{_id, test: .test, num: (._id | test(\"[0-9]\")), z: (._id | gsub(\"0\"; \"9\"))}"}]""")
    val r = out.collect()(0)
    assert(r.getAs[Boolean]("num") && r.getAs[String]("z") == "9")
  }

  test("$jq typed: string interpolation compiles to concat") {
    val out = pipeline.run(in,
      """[{"$jq": "{_id, msg: \"id=\\(._id)/t=\\(.test + 1)!\"}"}]""")
    assert(out.collect()(0).getAs[String]("msg") == "id=0/t=1!")
  }

  test("$jslt fallback() returns the first non-null/non-missing argument") {
    assert(run1("$jslt", """{"test": fallback(.missing, .test + 1), *: .}""")
      == List(("0", "0", 1L)))
  }

  test("$jq namespaced import resolves ns::f and intra-module calls") {
    // `scaled` calls `base` module-locally; after `import .. as q` both are
    // spliced as q::base / q::scaled and the inner call is rewritten
    assert(run1("$jq",
      """import "resource:/ns.jq" as q; {_id: ._id, test: q::scaled(.test + 3)}""")
      == List(("0", "0", 30L)))
  }

  test("$jslt computed key in typed mode is a clear compile error") {
    val df = Seq((1L, "k")).toDF("a", "key2")
    val e = intercept[graft.operators.JsltCompiler.JsltCompileError] {
      pipeline.run(df, """[{"$jslt": "{.key2 : .a}"}]""").collect()
    }
    assert(e.getMessage.contains("dynamic"))
  }

  test("$jslt object + merge: left wins (JSLT spec)") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val out = pipeline.run(df,
      """[{"$jslt": "{\"a\": 99} + ."}]""")
    val r = out.collect()(0)
    assert(r.getAs[Long]("a") == 99L && r.getAs[Long]("b") == 2L)
  }

  test("$jslt matcher minus excludes fields") {
    val df = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
    val out = pipeline.run(df, """[{"$jslt": "{\"x\": .a, * - b : .}"}]""")
    assert(out.columns.toSet == Set("x", "a", "c"))
  }

  test("$jq pipe, select, object construction, builtins") {
    val df = Seq(("x", 5L, "Ab"), ("y", 1L, "Cd")).toDF("name", "n", "s")
    val out = pipeline.run(df,
      """[{"$jq": "select(.n > 2) | {name, big: (.n * 10), low: (.s | ascii_downcase)}"}]""")
    val r = out.collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("name") == "x")
    assert(r(0).getAs[Long]("big") == 50L)
    assert(r(0).getAs[String]("low") == "ab")
  }

  test("$jq alternative // and map") {
    val df = Seq((Seq(1L, 2L), null.asInstanceOf[String])).toDF("xs", "maybe")
    val out = pipeline.run(df,
      """[{"$jq": "{ys: (.xs | map(. + 1)), v: (.maybe // \"dflt\")}"}]""")
    val r = out.collect()(0)
    assert(r.getAs[scala.collection.Seq[Long]]("ys").toList == List(2L, 3L))
    assert(r.getAs[String]("v") == "dflt")
  }

  test("$jq select at any pipe depth drops the row; map(select) filters elements") {
    val df = Seq(("a", 5L, Seq(1L, 5L, 9L)), ("b", 1L, Seq(2L, 3L, 4L)))
      .toDF("name", "n", "xs")
    // nested select inside a value pipe: jq's empty stream propagates out
    val out = pipeline.run(df,
      """[{"$jq": "{name, big: (.n | select(. > 2))}"}]""")
    assert(out.collect().map(_.getString(0)).toList == List("a"))
    // map(select(c)) filters elements; map(select(c) | f) filters + maps
    val out2 = pipeline.run(df,
      """[{"$jq": "{name, odd: (.xs | map(select(. > 2))), dbl: (.xs | map(select(. > 2) | . * 2))}"}]""")
    val r = out2.filter(col("name") === "a").head()
    assert(r.getAs[scala.collection.Seq[Long]]("odd").toList == List(5L, 9L))
    assert(r.getAs[scala.collection.Seq[Long]]("dbl").toList == List(10L, 18L))
  }

  test("extended builtins: jslt replace/flatten/sum/min-max, jq add/sort/unique/trimstr") {
    val df = Seq(("x-y-z", Seq(Seq(1L, 2L), Seq(3L)), 7L, "pre.mid.post"))
      .toDF("s", "nested", "n", "p")
    val r1 = pipeline.run(df,
      """[{"$jslt": "{\"rep\": replace(.s, \"-\", \"_\"), \"fl\": flatten(.nested), \"sm\": sum(flatten(.nested)), \"mn\": min(.n, 3), \"mx\": max(.n, 3)}"}]""")
      .head()
    assert(r1.getAs[String]("rep") == "x_y_z")
    assert(r1.getAs[scala.collection.Seq[Long]]("fl").toList == List(1L, 2L, 3L))
    assert(r1.getAs[Double]("sm") == 6.0)
    assert(r1.getAs[Long]("mn") == 3L && r1.getAs[Long]("mx") == 7L)
    val r2 = pipeline.run(df,
      """[{"$jq": "{total: (.nested | map(add) | add), srt: ([3, 1, 2] | sort), uniq: ([2, 1, 2] | unique), lt: (.p | ltrimstr(\"pre.\")), rt: (.p | rtrimstr(\".post\"))}"}]""")
      .head()
    // integral arrays keep integer type through add, like jq prints 6 not 6.0
    assert(r2.getAs[Long]("total") == 6L)
    assert(r2.getAs[scala.collection.Seq[Long]]("srt").toList == List(1L, 2L, 3L))
    assert(r2.getAs[scala.collection.Seq[Long]]("uniq").toList == List(1L, 2L))
    assert(r2.getAs[String]("lt") == "mid.post")
    assert(r2.getAs[String]("rt") == "pre.mid")
  }

  test("duplicate object keys last-win in both script languages") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val r1 = pipeline.run(df, """[{"$jslt": "{\"k\": .a, \"k\": .b}"}]""").head()
    assert(r1.schema.fieldNames.count(_ == "k") == 1 && r1.getAs[Long]("k") == 2L)
    val r2 = pipeline.run(df, """[{"$jq": "{k: .a, k: .b}"}]""").head()
    assert(r2.schema.fieldNames.count(_ == "k") == 1 && r2.getAs[Long]("k") == 2L)
  }

  test("$jq select inside if branches only applies when the branch is taken") {
    val df = Seq(("a", 1L, 0L), ("b", 0L, 0L), ("c", 1L, 5L))
      .toDF("name", "c", "v")
    // jq: when .c > 0 require .v > 2, otherwise pass the row through —
    // the select's condition must NOT leak into the other branch
    val out = pipeline.run(df,
      """[{"$jq": "if (.c > 0) then select(.v > 2) else . end"}]""")
    assert(out.collect().map(_.getAs[String]("name")).toSet == Set("b", "c"))
  }

  test("$jq nested select inside a map body is rejected, not ignored") {
    val df = Seq((Seq(1L, 2L, 3L), 0L)).toDF("xs", "z")
    intercept[IllegalArgumentException] {
      pipeline.run(df,
        """[{"$jq": "{r: (.xs | map(select(. > 0) | select(. > 1))), z: .z}"}]""")
    }
  }

  test("$jq/$jslt non-object top-level result raises a clear shape error") {
    val e = intercept[IllegalArgumentException] {
      pipeline.run(in, """[{"$jq": ".test"}]""")
    }
    assert(e.getMessage.contains("must produce an object"))
  }

  test("jslt/jq compile errors are rethrown (Script.java:40-55)") {
    intercept[IllegalArgumentException] {
      pipeline.run(in, """[{"$jslt": "fnord(.x)"}]""")
    }
    intercept[IllegalArgumentException] {
      pipeline.run(in, """[{"$jq": "reduce .x as $i (0; .)"}]""")
    }
  }
}
