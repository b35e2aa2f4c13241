package graft

import graft.operators.JsltCompiler
import graft.operators.JsltCompiler._
import org.json4s._

/** Differential testing of the JSLT→Column compiler: an independent
  * tree-walk interpreter evaluates the same parsed script over plain JSON
  * values, and the compiled Column result (collected off a one-row
  * DataFrame) must agree structurally. Scripts are GENERATED (seeded,
  * deterministic — house property-test style, see [[PropertySpec]]) — the
  * parser, the type rules, and the Column compilation are all exercised on
  * shapes no hand-written test enumerates.
  *
  * The generator stays inside semantics where compiled (static, Spark) and
  * interpreted (dynamic) agree by construction: same-kind `+` operands,
  * non-zero divisors avoided by construction (no `/`), null-free docs.
  */
class JsltPropertySpec extends SparkSpec {
  import spark.implicits._

  // ---- the independent interpreter ----------------------------------------

  private def truthy(v: JValue): Boolean = v match {
    case JNull | JNothing => false
    case JBool(b)         => b
    case JLong(l)         => l != 0
    case JInt(i)          => i != 0
    case JDouble(d)       => d != 0
    case JString(s)       => s.nonEmpty
    case JArray(xs)       => xs.nonEmpty
    case _                => true
  }

  private def interp(ast: Ast, context: JValue, vars: Map[String, JValue]): JValue =
    ast match {
      case Lit(null)       => JNull
      case Lit(b: Boolean) => JBool(b)
      case Lit(l: Long)    => JLong(l)
      case Lit(d: Double)  => JDouble(d)
      case Lit(s: String)  => JString(s)
      case Lit(o)          => sys.error(s"lit $o")
      case Path(steps)     => steps.foldLeft(context)(step(_, _, context, vars))
      case Sel(base, s)    => step(interp(base, context, vars), s, context, vars)
      case Var(n)          => vars(n)
      case ObjC(pairs, matcher) =>
        // generator emits literal string keys only (the static subset)
        def key(k: Ast): String = k match {
          case Lit(s: String) => s
          case other          => sys.error(s"non-literal key $other")
        }
        val explicit = pairs.map { case (k, v) => key(k) -> interp(v, context, vars) }
        val matched = matcher match {
          case None => Nil
          case Some((minus, expr)) =>
            val taken = pairs.map(p => key(p._1)).toSet ++ minus
            interp(expr, context, vars) match {
              case JObject(fs) => fs.filterNot { case (k, _) => taken(k) }
              case _           => Nil
            }
        }
        JObject(explicit ++ matched)
      case ArrC(items) => JArray(items.map(interp(_, context, vars)))
      case ForArr(input, body, cond) =>
        interp(input, context, vars) match {
          case JArray(xs) =>
            val kept = cond match {
              case Some(c) => xs.filter(x => truthy(interp(c, x, vars)))
              case None    => xs
            }
            JArray(kept.map(x => interp(body, x, vars)))
          case _ => JNull
        }
      case If(c, t, e) =>
        if (truthy(interp(c, context, vars))) interp(t, context, vars)
        else interp(e, context, vars)
      case Neg(e) => interp(e, context, vars) match {
        case JLong(l)   => JLong(-l)
        case JDouble(d) => JDouble(-d)
        case other      => sys.error(s"neg $other")
      }
      case Let(bs, body) =>
        val v2 = bs.foldLeft(vars) { case (m, (n, e)) =>
          m + (n -> interp(e, context, m))
        }
        interp(body, context, v2)
      case Bin(op, l, r) => bin(op, interp(l, context, vars), interp(r, context, vars))
      case Call(fn, args) => call(fn, args.map(interp(_, context, vars)))
    }

  private def step(v: JValue, s: Step, context: JValue,
      vars: Map[String, JValue]): JValue = s match {
    case FieldStep(name) => v match {
      case JObject(fs) => fs.find(_._1 == name).map(_._2).getOrElse(JNull)
      case _           => JNull
    }
    case IndexStep(iAst) =>
      val i = interp(iAst, context, vars) match {
        case JLong(l) => l.toInt
        case JInt(b)  => b.toInt
        case other    => sys.error(s"index $other")
      }
      v match {
        case JArray(xs) =>
          val idx = if (i < 0) xs.length + i else i
          if (idx >= 0 && idx < xs.length) xs(idx) else JNull
        case _ => JNull
      }
  }

  private def num(v: JValue): Either[Long, Double] = v match {
    case JLong(l)   => Left(l)
    case JInt(i)    => Left(i.toLong)
    case JDouble(d) => Right(d)
    case other      => sys.error(s"num $other")
  }

  private def arith(l: JValue, r: JValue)(fl: (Long, Long) => Long,
      fd: (Double, Double) => Double): JValue = (num(l), num(r)) match {
    case (Left(a), Left(b))   => JLong(fl(a, b))
    case (na, nb) =>
      JDouble(fd(na.fold(_.toDouble, identity), nb.fold(_.toDouble, identity)))
  }

  private def cmp(l: JValue, r: JValue): Int = (num(l), num(r)) match {
    case (Left(a), Left(b)) => java.lang.Long.compare(a, b)
    case (na, nb) =>
      java.lang.Double.compare(na.fold(_.toDouble, identity), nb.fold(_.toDouble, identity))
  }

  private def bin(op: String, l: JValue, r: JValue): JValue = op match {
    case "and" => JBool(truthy(l) && truthy(r))
    case "or"  => JBool(truthy(l) || truthy(r))
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
      case (JObject(a), JObject(b)) => // left wins
        JObject(a ++ b.filterNot { case (k, _) => a.exists(_._1 == k) })
      case (JArray(a), JArray(b))   => JArray(a ++ b)
      case _ => arith(l, r)(_ + _, _ + _)
    }
    case "-" => arith(l, r)(_ - _, _ - _)
    case "*" => arith(l, r)(_ * _, _ * _)
    case other => sys.error(s"op $other")
  }

  private def call(fn: String, args: List[JValue]): JValue = fn match {
    case "size" => args.head match {
      case JString(s) => JLong(s.length.toLong)
      case JArray(xs) => JLong(xs.length.toLong)
      case JObject(f) => JLong(f.length.toLong)
      case _          => JNull
    }
    case "lowercase" => JString(args.head.asInstanceOf[JString].s.toLowerCase)
    case "uppercase" => JString(args.head.asInstanceOf[JString].s.toUpperCase)
    case "trim"      => JString(args.head.asInstanceOf[JString].s.trim)
    case "not"       => JBool(!truthy(args.head))
    case "starts-with" =>
      JBool(args.head.asInstanceOf[JString].s.startsWith(args(1).asInstanceOf[JString].s))
    case "ends-with" =>
      JBool(args.head.asInstanceOf[JString].s.endsWith(args(1).asInstanceOf[JString].s))
    case "contains" => (args(1), args.head) match {
      case (JString(seq), JString(el)) => JBool(seq.contains(el))
      case (JArray(xs), el)            => JBool(xs.contains(el))
      case _                           => JNull
    }
    case "join" =>
      val JArray(xs) = (args.head: @unchecked)
      val sep = args(1).asInstanceOf[JString].s
      JString(xs.map { case JString(s) => s; case JLong(l) => l.toString
        case other => other.toString }.mkString(sep))
    case "split" =>
      JArray(args.head.asInstanceOf[JString].s
        .split(args(1).asInstanceOf[JString].s, -1).toList.map(JString(_)))
    case "round"   => JLong(num(args.head).fold(identity, d => Math.round(d)))
    case "floor"   => JLong(num(args.head).fold(identity, d => Math.floor(d).toLong))
    case "ceiling" => JLong(num(args.head).fold(identity, d => Math.ceil(d).toLong))
    case other => sys.error(s"fn $other")
  }

  // ---- doc model + Row → JValue --------------------------------------------

  // fixed test schema: a,b long; d double; s,t string; arr array<long>
  private def docDF(a: Long, b: Long, d: Double, s: String, t: String, arr: Seq[Long]) =
    Seq((a, b, d, s, t, arr)).toDF("a", "b", "d", "s", "t", "arr")

  private def docJson(a: Long, b: Long, d: Double, s: String, t: String, arr: Seq[Long]) =
    JObject(List("a" -> JLong(a), "b" -> JLong(b), "d" -> JDouble(d),
      "s" -> JString(s), "t" -> JString(t),
      "arr" -> JArray(arr.toList.map(JLong(_)))))

  private def anyToJ(v: Any): JValue = v match {
    case null                => JNull
    case l: Long             => JLong(l)
    case i: Int              => JLong(i.toLong)
    case d: Double           => JDouble(d)
    case b: Boolean          => JBool(b)
    case s: String           => JString(s)
    case r: org.apache.spark.sql.Row =>
      JObject(r.schema.fieldNames.toList.zipWithIndex.map { case (n, i) =>
        n -> anyToJ(r.get(i)) })
    case xs: scala.collection.Seq[_] => JArray(xs.toList.map(anyToJ))
    case other => sys.error(s"anyToJ ${other.getClass}")
  }

  // ---- script generator (seeded, deterministic) ----------------------------

  private val rnd = new scala.util.Random(4242)
  private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

  private def genNumExpr(depth: Int): String =
    if (depth <= 0) pick(Seq(".a", ".b", ".arr[0]", ".arr[1]",
      rnd.between(-5L, 10L).toString))
    else rnd.nextInt(7) match {
      case 0 | 1 | 2 => genNumExpr(0)
      case 3 | 4 =>
        s"(${genNumExpr(depth - 1)} ${pick(Seq("+", "-", "*"))} ${genNumExpr(depth - 1)})"
      case 5 =>
        s"(if (${genBoolExpr(depth - 1)}) ${genNumExpr(depth - 1)} else ${genNumExpr(depth - 1)})"
      case 6 => s"round(${genNumExpr(depth - 1)})"
    }

  private def genStrExpr(depth: Int): String =
    if (depth <= 0) pick(Seq(".s", ".t",
      "\"" + rnd.alphanumeric.take(4).mkString + "\""))
    else rnd.nextInt(6) match {
      case 0 | 1 | 2 => genStrExpr(0)
      case 3 => s"(${genStrExpr(depth - 1)} + ${genStrExpr(depth - 1)})"
      case 4 => s"uppercase(${genStrExpr(depth - 1)})"
      case 5 => s"lowercase(${genStrExpr(depth - 1)})"
    }

  private def genBoolExpr(depth: Int): String =
    s"(${genNumExpr(depth)} ${pick(Seq("<", "<=", ">", ">=", "==", "!="))} ${genNumExpr(depth)})"

  private def genForExpr(): String = {
    val cond = if (rnd.nextBoolean()) s" if (. > ${rnd.nextInt(5)})" else ""
    s"[for (.arr) . * ${rnd.between(1L, 6L)}$cond]"
  }

  private def genValue(depth: Int): String = rnd.nextInt(12) match {
    case 0 | 1 | 2 | 3 => genNumExpr(depth)
    case 4 | 5 | 6     => genStrExpr(depth)
    case 7 | 8         => genBoolExpr(depth)
    case 9             => genForExpr()
    case 10            => "size(.arr)"
    case 11            => "join(split(.s, \" \"), \"-\")"
  }

  private def genScript(): String = {
    val n = 1 + rnd.nextInt(4)
    val keys = rnd.shuffle(List("k1", "k2", "k3", "k4")).take(n)
    val pairs = keys.map(k => s""""$k": ${genValue(2)}""")
    val matcher = if (rnd.nextBoolean()) List("*: .") else Nil
    s"{${(pairs ++ matcher).mkString(", ")}}"
  }

  private def genDoc(): (Long, Long, Double, String, String, List[Long]) = (
    rnd.between(-3L, 10L), rnd.between(0L, 7L),
    rnd.between(-10L, 31L) / 2.0, // binary-exact halves
    pick(Seq("hello world", "Foo Bar", "x", "a b c")),
    pick(Seq("abc", "XYZ", "mid dle")),
    List.fill(4)(rnd.between(-2L, 9L)))

  // ---- the property --------------------------------------------------------

  test("compiled JSLT agrees with the independent interpreter on generated scripts") {
    // one Spark job for ALL generated cases: distinct doc per case via a
    // per-case one-row select would be 120 jobs; instead reuse the compiled
    // column per (script, doc) pair — scripts depend on the fixed schema
    for (i <- 1 to 120) {
      val script = genScript()
      val (a, b, d, s, t, arr) = genDoc()
      val df = docDF(a, b, d, s, t, arr)
      val schema = org.apache.spark.sql.types.StructType(df.schema)
      val compiled = JsltCompiler.compileProgram(script, schema)
      val row = df.select(compiled.col.as("r")).head().get(0)
      val got = anyToJ(row)
      val want = interp(JsltCompiler.parse(script),
        docJson(a, b, d, s, t, arr), Map.empty)
      assert(got == want,
        s"\ncase $i\nscript: $script\ndoc: a=$a b=$b d=$d s=$s t=$t arr=$arr")
    }
  }

  // ---- the DYNAMIC engine against the same oracle --------------------------

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

  test("dynamic JsltInterp agrees with the independent interpreter on generated scripts") {
    // the generator never produces null pair values, so the JSLT null-drop
    // rule (dynamic engine) and the keep-as-null static behavior coincide —
    // the three engines must agree exactly
    for (i <- 1 to 120) {
      val script = genScript()
      val (a, b, d, s, t, arr) = genDoc()
      val doc = docJson(a, b, d, s, t, arr)
      val want = interp(JsltCompiler.parse(script), doc, Map.empty)
      val node = graft.dynamic.DynJson.parse(
        org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(doc)))
      val got = nodeToJ(graft.operators.JsltInterp.run(script, node))
      assert(got == want,
        s"\ncase $i\nscript: $script\ndoc: a=$a b=$b d=$d s=$s t=$t arr=$arr")
    }
  }

  test("typed mode compiles computed keys that FOLD to compile-time constants") {
    val df = docDF(7L, 2L, 1.5, "hi", "yo", Seq(1L, 2L))
    def run(script: String): org.apache.spark.sql.Row = {
      val tc = JsltCompiler.compileProgram(script, df.schema)
      df.select(tc.col.as("o")).head().getStruct(0)
    }
    // let-bound constant string as a key, and a concatenation of constants
    val r = run("""let k = "score" { $k : .a, "pre_" + $k : .b }""")
    assert(r.schema.fieldNames.toList == List("score", "pre_score"))
    assert(r.getLong(0) == 7L && r.getLong(1) == 2L)
    // nested let folding through concatenation
    val r2 = run("""let p = "x" let q = $p + "y" { $q + "z" : .a }""")
    assert(r2.schema.fieldNames.toList == List("xyz"))
    assert(r2.getLong(0) == 7L)
    // genuinely data-dependent keys still point at dynamic mode
    val e = intercept[JsltCompiler.JsltCompileError] {
      JsltCompiler.compileProgram("""{ .s : .a }""", df.schema)
    }
    assert(e.getMessage.contains("dynamic pipeline mode"))
  }
}
