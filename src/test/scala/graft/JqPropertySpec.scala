package graft

import graft.operators.JqCompiler
import graft.operators.JqCompiler._
import org.json4s._

/** Differential testing of the jq→Column compiler, mirroring
  * [[JsltPropertySpec]]: an independent tree-walk interpreter over JSON
  * values vs the schema-compiled Columns, on seeded generated filters.
  * Generator constraints (same-kind `+`, no division, null-free docs) keep
  * static and dynamic semantics aligned by construction.
  */
class JqPropertySpec extends SparkSpec {
  import spark.implicits._

  private def truthy(v: JValue): Boolean = v match {
    case JNull | JNothing => false
    case JBool(b)         => b
    case _                => true // jq: only null/false are falsy
  }

  private def interp(q: Jq, context: JValue): JValue = q match {
    case JLit(null)       => JNull
    case JLit(b: Boolean) => JBool(b)
    case JLit(l: Long)    => JLong(l)
    case JLit(d: Double)  => JDouble(d)
    case JLit(s: String)  => JString(s)
    case JLit(o)          => sys.error(s"lit $o")
    case JPath(steps) => steps.foldLeft(context) {
      case (JObject(fs), JqCompiler.JField(n)) => fs.find(_._1 == n).map(_._2).getOrElse(JNull)
      case (JArray(xs), JqCompiler.JIndex(i)) =>
        val idx = if (i < 0) xs.length + i.toInt else i.toInt
        if (idx >= 0 && idx < xs.length) xs(idx) else JNull
      case (_, _) => JNull
    }
    case JObjC(pairs) => JObject(pairs.map { case (k, v) =>
      val key = k match {
        case JqCompiler.KLit(name) => name
        case JqCompiler.KExpr(ke) => interp(ke, context) match {
          case JString(s) => s
          case other      => sys.error(s"object key must be a string: $other")
        }
      }
      key -> interp(v, context)
    })
    case JArrC(items) => JArray(items.map(interp(_, context)))
    case JPipe(l, r)  => interp(r, interp(l, context))
    case JIf(c, t, e) =>
      if (truthy(interp(c, context))) interp(t, context) else interp(e, context)
    case JSelect(_) => sys.error("select not generated for the doc property")
    case JBin(op, l, r) => bin(op, interp(l, context), interp(r, context))
    case JCall(fn, args) => call(fn, args, context)
  }

  private def num(v: JValue): Either[Long, Double] = v match {
    case JLong(l)   => Left(l)
    case JInt(i)    => Left(i.toLong)
    case JDouble(d) => Right(d)
    case other      => sys.error(s"num $other")
  }

  private def cmp(l: JValue, r: JValue): Int = (num(l), num(r)) match {
    case (Left(a), Left(b)) => java.lang.Long.compare(a, b)
    case (na, nb) => java.lang.Double.compare(
      na.fold(_.toDouble, identity), nb.fold(_.toDouble, identity))
  }

  private def bin(op: String, l: JValue, r: JValue): JValue = op match {
    case "and" => JBool(truthy(l) && truthy(r))
    case "or"  => JBool(truthy(l) || truthy(r))
    case "//"  => if (truthy(l)) l else r
    case "==" => (l, r) match {
      case (JString(a), JString(b)) => JBool(a == b)
      case _                        => JBool(cmp(l, r) == 0)
    }
    case "!=" => (l, r) match {
      case (JString(a), JString(b)) => JBool(a != b)
      case _                        => JBool(cmp(l, r) != 0)
    }
    case "<"  => JBool(cmp(l, r) < 0)
    case "<=" => JBool(cmp(l, r) <= 0)
    case ">"  => JBool(cmp(l, r) > 0)
    case ">=" => JBool(cmp(l, r) >= 0)
    case "+" => (l, r) match {
      case (JString(a), JString(b)) => JString(a + b)
      case (JObject(a), JObject(b)) => // jq: RIGHT wins
        JObject(a.filterNot { case (k, _) => b.exists(_._1 == k) } ++ b)
      case (JArray(a), JArray(b)) => JArray(a ++ b)
      case _ => arith(l, r)(_ + _, _ + _)
    }
    case "-" => arith(l, r)(_ - _, _ - _)
    case "*" => arith(l, r)(_ * _, _ * _)
    case other => sys.error(s"op $other")
  }

  private def arith(l: JValue, r: JValue)(fl: (Long, Long) => Long,
      fd: (Double, Double) => Double): JValue = (num(l), num(r)) match {
    case (Left(a), Left(b)) => JLong(fl(a, b))
    case (na, nb) => JDouble(fd(
      na.fold(_.toDouble, identity), nb.fold(_.toDouble, identity)))
  }

  private def call(fn: String, args: List[Jq], context: JValue): JValue = fn match {
    case "length" => context match {
      case JString(s) => JLong(s.length.toLong)
      case JArray(xs) => JLong(xs.length.toLong)
      case JObject(f) => JLong(f.length.toLong)
      case _          => JNull
    }
    case "ascii_downcase" => JString(context.asInstanceOf[JString].s.toLowerCase)
    case "ascii_upcase"   => JString(context.asInstanceOf[JString].s.toUpperCase)
    case "floor" => JLong(num(context).fold(identity, d => Math.floor(d).toLong))
    case "ceil"  => JLong(num(context).fold(identity, d => Math.ceil(d).toLong))
    case "map" => context match {
      case JArray(xs) => JArray(xs.map(x => interp(args.head, x)))
      case _          => JNull
    }
    case "add" => context match {
      case JArray(Nil) => JNull
      case JArray(xs) => // like jq: an all-integer array sums to an integer
        val ns = xs.map(num)
        if (ns.forall(_.isLeft)) JLong(ns.map(_.swap.getOrElse(0L)).sum)
        else JDouble(ns.map(_.fold(_.toDouble, identity)).sum)
      case _ => JNull
    }
    case "sort" => context match {
      case JArray(xs) => JArray(xs.sortBy(num(_).fold(_.toDouble, identity)))
      case _          => JNull
    }
    case "unique" => context match {
      case JArray(xs) => JArray(xs.distinct.sortBy(num(_).fold(_.toDouble, identity)))
      case _          => JNull
    }
    case "reverse" => context match {
      case JArray(xs) => JArray(xs.reverse)
      case _          => JNull
    }
    case other => sys.error(s"fn $other")
  }

  // ---- doc + Row→JValue ----------------------------------------------------

  private def docDF(a: Long, b: Long, d: Double, s: String, arr: Seq[Long]) =
    Seq((a, b, d, s, arr)).toDF("a", "b", "d", "s", "arr")

  private def docJson(a: Long, b: Long, d: Double, s: String, arr: Seq[Long]) =
    JObject(List("a" -> JLong(a), "b" -> JLong(b), "d" -> JDouble(d),
      "s" -> JString(s), "arr" -> JArray(arr.toList.map(JLong(_)))))

  private def anyToJ(v: Any): JValue = v match {
    case null       => JNull
    case l: Long    => JLong(l)
    case i: Int     => JLong(i.toLong)
    case d: Double  => JDouble(d)
    case b: Boolean => JBool(b)
    case s: String  => JString(s)
    case r: org.apache.spark.sql.Row =>
      JObject(r.schema.fieldNames.toList.zipWithIndex.map { case (n, i) =>
        n -> anyToJ(r.get(i)) })
    case xs: scala.collection.Seq[_] => JArray(xs.toList.map(anyToJ))
    case other => sys.error(s"anyToJ ${other.getClass}")
  }

  // ---- generator (seeded) --------------------------------------------------

  private val rnd = new scala.util.Random(777)
  private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

  private def genNum(depth: Int): String =
    if (depth <= 0) pick(Seq(".a", ".b", ".arr[0]", ".arr[2]",
      rnd.between(-4L, 9L).toString))
    else rnd.nextInt(6) match {
      case 0 | 1 | 2 => genNum(0)
      case 3 | 4 =>
        s"(${genNum(depth - 1)} ${pick(Seq("+", "-", "*"))} ${genNum(depth - 1)})"
      case 5 =>
        s"(if ${genBool(depth - 1)} then ${genNum(depth - 1)} else ${genNum(depth - 1)} end)"
    }

  private def genStr(depth: Int): String =
    if (depth <= 0) pick(Seq(".s", "\"" + rnd.alphanumeric.take(4).mkString + "\""))
    else rnd.nextInt(5) match {
      case 0 | 1 => genStr(0)
      case 2     => s"(${genStr(depth - 1)} + ${genStr(depth - 1)})"
      case 3     => s"(${genStr(depth - 1)} | ascii_upcase)"
      case 4     => s"(${genStr(depth - 1)} | ascii_downcase)"
    }

  private def genBool(depth: Int): String =
    s"(${genNum(depth)} ${pick(Seq("<", "<=", ">", ">=", "==", "!="))} ${genNum(depth)})"

  private def genValue(depth: Int): String = rnd.nextInt(14) match {
    case 0 | 1 | 2 | 3 => genNum(depth)
    case 4 | 5         => genStr(depth)
    case 6             => genBool(depth)
    case 7             => s"(.arr | map(. * ${rnd.between(1L, 5L)}))"
    case 8             => "(.arr | length)"
    case 9             => "(.s | length)"
    case 10            => "(.arr | add)"
    case 11            => "(.arr | sort)"
    case 12            => "(.arr | unique)"
    case 13            => "(.arr | reverse)"
  }

  private def genFilter(): String = {
    val n = 1 + rnd.nextInt(4)
    val keys = rnd.shuffle(List("k1", "k2", "k3", "k4")).take(n)
    s"{${keys.map(k => s"$k: ${genValue(2)}").mkString(", ")}}"
  }

  // ---- the property --------------------------------------------------------

  test("compiled jq agrees with the independent interpreter on generated filters") {
    for (i <- 1 to 120) {
      val filter = genFilter()
      val (a, b, d, s, arr) = (rnd.between(-3L, 10L), rnd.between(0L, 7L),
        rnd.between(-8L, 25L) / 2.0, pick(Seq("Hello World", "xY z", "abc")),
        List.fill(4)(rnd.between(-2L, 9L)))
      val df = docDF(a, b, d, s, arr)
      val compiled = JqCompiler.compileProgram(filter,
        org.apache.spark.sql.types.StructType(df.schema))
      assert(compiled.keep.isEmpty)
      val got = anyToJ(df.select(compiled.doc.col.as("r")).head().get(0))
      val want = interp(JqCompiler.parse(filter), docJson(a, b, d, s, arr))
      assert(got == want, s"\ncase $i\nfilter: $filter\ndoc: a=$a b=$b d=$d s=$s arr=$arr")
    }
  }

  private def nodeToJ(n: com.fasterxml.jackson.databind.JsonNode): JValue = {
    import scala.jdk.CollectionConverters._
    if (n == null || n.isNull || n.isMissingNode) JNull
    else if (n.isIntegralNumber) JLong(n.longValue)
    else if (n.isNumber) JDouble(n.doubleValue)
    else if (n.isTextual) JString(n.textValue)
    else if (n.isBoolean) JBool(n.booleanValue)
    else if (n.isArray) JArray(n.elements.asScala.toList.map(nodeToJ))
    else JObject(n.properties.asScala.toList.map(e => e.getKey -> nodeToJ(e.getValue)))
  }

  test("dynamic JqInterp agrees with the independent interpreter on generated filters") {
    // single-output filters by construction: the stream engine must return
    // exactly one value equal to the tree-walk result
    for (i <- 1 to 120) {
      val filter = genFilter()
      val (a, b, d, s, arr) = (rnd.between(-3L, 10L), rnd.between(0L, 7L),
        rnd.between(-8L, 25L) / 2.0, pick(Seq("Hello World", "xY z", "abc")),
        List.fill(4)(rnd.between(-2L, 9L)))
      val doc = docJson(a, b, d, s, arr)
      val want = interp(JqCompiler.parse(filter), doc)
      val node = graft.dynamic.DynJson.parse(
        org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(doc)))
      val outs = graft.operators.JqInterp.run(filter, node)
      assert(outs.length == 1, s"case $i: ${outs.length} outputs for $filter")
      assert(nodeToJ(outs.head) == want,
        s"\ncase $i\nfilter: $filter\ndoc: a=$a b=$b d=$d s=$s arr=$arr")
    }
  }

  test("jq computed object keys: static fold in typed mode, full evaluation in dynamic") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq((7L, "size")).toDF("a", "s")
    // constant-foldable computed keys compile to Columns
    val compiled = JqCompiler.compileProgram(
      """{("k" + "1"): .a, "pre\("fix")": .s}""", df.schema)
    val r = df.select(compiled.doc.col.as("o")).head().getStruct(0)
    assert(r.schema.fieldNames.toList == List("k1", "prefix"))
    assert(r.getLong(0) == 7L && r.getString(1) == "size")
    // data-dependent keys raise the dynamic-mode pointer in typed mode...
    val e = intercept[JqCompiler.JqCompileError] {
      JqCompiler.compileProgram("""{(.s): .a}""", df.schema)
    }
    assert(e.getMessage.contains("dynamic pipeline mode"))
    // ...and evaluate fully in dynamic mode, incl. the cartesian key rule
    val node = graft.dynamic.DynJson.parse("""{"a":7,"s":"size"}""")
    val dyn = graft.operators.JqInterp.run("""{(.s): .a}""", node)
    assert(dyn.map(nodeToJ) == List(JObject(List("size" -> JLong(7)))))
    val multi = graft.operators.JqInterp.run("""{(.s, "t"): .a}""", node)
    assert(multi.map(nodeToJ) == List(
      JObject(List("size" -> JLong(7))), JObject(List("t" -> JLong(7)))))
    // interpolated computed key with a data part
    val interp2 = graft.operators.JqInterp.run("""{"k_\(.s)": .a}""", node)
    assert(interp2.map(nodeToJ) == List(JObject(List("k_size" -> JLong(7)))))
    // non-string key errors like jq
    intercept[Exception] {
      graft.operators.JqInterp.run("""{(.a): 1}""", node)
    }
  }
}
