package graft.operators

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.dynamic.DynJson
import graft.dynamic.DynJson._
import JsltCompiler._

import scala.jdk.CollectionConverters._

/** Full JSLT tree-walk interpreter over Jackson trees — the DYNAMIC-mode
  * engine behind `$jslt` (Jslt.java:18-36 runs the real JSLT engine; this is
  * the schemaless counterpart of [[JsltCompiler]]'s static Column subset).
  * Everything the static compiler rejects as data-dependent runs here:
  * computed object keys, object comprehensions, `get-key` on unknown
  * objects, and recursive user functions (depth-capped).
  *
  * Semantic notes (matching the JSLT spec where the static subset cannot):
  *  - object constructors and comprehensions DROP pairs whose value is null
  *    (the JSLT rule; a fixed schema cannot drop fields, so the static
  *    subset keeps them as nulls — a documented divergence)
  *  - `for` over an OBJECT iterates `{"key": k, "value": v}` pairs
  *  - falsiness: null, false, 0, "", empty array, empty object
  */
object JsltInterp {

  private val MaxDepth = 500

  final case class Env(vars: Map[String, JsonNode], defs: Map[String, FnDef],
      depth: Int)

  def run(src: String, doc: JsonNode): JsonNode =
    eval(JsltCompiler.parse(src), doc, Env(Map.empty, Map.empty, 0))

  /** Compile once, evaluate per document (the stage-side entry point). */
  def compiled(src: String): JsonNode => JsonNode = {
    val ast = JsltCompiler.parse(src)
    doc => eval(ast, doc, Env(Map.empty, Map.empty, 0))
  }

  def truthy(v: JsonNode): Boolean =
    !(isMissing(v) || v.isNull ||
      (v.isBoolean && !v.booleanValue) ||
      (v.isNumber && v.doubleValue == 0) ||
      (v.isTextual && v.textValue.isEmpty) ||
      (v.isArray && v.isEmpty) ||
      (v.isObject && v.isEmpty))

  private def pairNode(k: String, v: JsonNode): JsonNode = {
    val o = obj()
    o.set[JsonNode]("key", text(k))
    o.set[JsonNode]("value", v)
    o
  }

  /** Iteration source: array elements, or {"key","value"} pairs of an
    * object (JSLT for-loop rule). Null/missing iterates nothing (JSLT
    * returns null for a null loop input — handled by callers). */
  private def iterSource(v: JsonNode): Option[Seq[JsonNode]] =
    if (v.isArray) Some(v.elements.asScala.toSeq)
    else if (v.isObject)
      Some(v.properties.asScala.toSeq.map(e => pairNode(e.getKey, e.getValue)))
    else None

  private def step(base: JsonNode, s: Step, ctx: JsonNode, env: Env): JsonNode =
    s match {
      case FieldStep(name) =>
        if (base == null || !base.isObject) NULL
        else missingToNull(base.path(name))
      case IndexStep(iAst) =>
        val iv = eval(iAst, ctx, env)
        if (!iv.isNumber || base == null || !base.isArray) NULL
        else {
          val n = base.size
          val i0 = iv.intValue
          val i = if (i0 < 0) n + i0 else i0
          if (i < 0 || i >= n) NULL else base.get(i)
        }
    }

  def eval(ast: Ast, ctx: JsonNode, env: Env): JsonNode = ast match {
    case Lit(null)       => NULL
    case Lit(b: Boolean) => bool(b)
    case Lit(l: Long)    => long(l)
    case Lit(d: Double)  => double(d)
    case Lit(s: String)  => text(s)
    case Lit(o)          => throw new JsltCompileError(s"bad literal $o")

    case Path(steps) => steps.foldLeft(ctx)(step(_, _, ctx, env))

    case Sel(base, s) => step(eval(base, ctx, env), s, ctx, env)

    case Var(n) => env.vars.getOrElse(n,
      throw new JsltCompileError(s"undefined variable $$$n"))

    case ObjC(pairs, matcher) =>
      val o = obj()
      pairs.foreach { case (kAst, vAst) =>
        val kv = eval(kAst, ctx, env)
        if (!kv.isTextual) throw new IllegalArgumentException(
          s"object key must be a string, got: ${render(kv)}")
        val v = eval(vAst, ctx, env)
        if (!(v.isNull || isMissing(v))) o.set[JsonNode](kv.textValue, v)
      }
      matcher.foreach { case (minus, expr) =>
        val taken = pairs.collect { case (Lit(s: String), _) => s }.toSet ++ minus
        val src = eval(expr, ctx, env)
        if (src.isObject) src.properties.asScala.foreach { e =>
          if (!taken(e.getKey) && !o.has(e.getKey) && !e.getValue.isNull)
            o.set[JsonNode](e.getKey, e.getValue)
        }
      }
      o

    case ArrC(items) =>
      val a = arr()
      items.foreach(i => a.add(missingToNull(eval(i, ctx, env))))
      a

    case ForArr(input, body, cond) =>
      iterSource(eval(input, ctx, env)) match {
        case None => NULL
        case Some(xs) =>
          val a = arr()
          xs.foreach { x =>
            if (cond.forall(c => truthy(eval(c, x, env))))
              a.add(missingToNull(eval(body, x, env)))
          }
          a
      }

    case ObjFor(input, key, value, cond) =>
      iterSource(eval(input, ctx, env)) match {
        case None => NULL
        case Some(xs) =>
          val o = obj()
          xs.foreach { x =>
            if (cond.forall(c => truthy(eval(c, x, env)))) {
              val kv = eval(key, x, env)
              if (!kv.isTextual) throw new IllegalArgumentException(
                s"object-for key must be a string, got: ${render(kv)}")
              val v = eval(value, x, env)
              if (!(v.isNull || isMissing(v))) o.set[JsonNode](kv.textValue, v)
            }
          }
          o
      }

    case If(c, t, e) =>
      if (truthy(eval(c, ctx, env))) eval(t, ctx, env) else eval(e, ctx, env)

    case Neg(e) =>
      eval(e, ctx, env) match {
        case n if n.isIntegralNumber => long(-n.longValue)
        case n if n.isNumber         => double(-n.doubleValue)
        case other => throw new IllegalArgumentException(s"negating ${render(other)}")
      }

    case Bin(op, lAst, rAst) =>
      op match {
        case "and" => bool(truthy(eval(lAst, ctx, env)) && truthy(eval(rAst, ctx, env)))
        case "or"  => bool(truthy(eval(lAst, ctx, env)) || truthy(eval(rAst, ctx, env)))
        case "==" | "!=" | "<" | "<=" | ">" | ">=" =>
          val (l, r) = (eval(lAst, ctx, env), eval(rAst, ctx, env))
          op match {
            case "==" => bool(jEq(l, r))
            case "!=" => bool(!jEq(l, r))
            case _ =>
              val c = jCmp(l, r)
              bool(op match {
                case "<" => c < 0; case "<=" => c <= 0
                case ">" => c > 0; case _    => c >= 0
              })
          }
        case "+" =>
          val (l, r) = (eval(lAst, ctx, env), eval(rAst, ctx, env))
          if (l.isTextual || r.isTextual) text(asStr(l) + asStr(r))
          else if (l.isArray && r.isArray) {
            val a = arr(); a.addAll(l.asInstanceOf[ArrayNode])
            a.addAll(r.asInstanceOf[ArrayNode]); a
          } else if (l.isObject && r.isObject) {
            // JSLT object +: LEFT wins on conflicts
            val o = obj()
            o.setAll[ObjectNode](r.asInstanceOf[ObjectNode])
            o.setAll[ObjectNode](l.asInstanceOf[ObjectNode])
            o
          } else if (l.isNull || isMissing(l) || r.isNull || isMissing(r)) NULL
          else num(l.doubleValue + r.doubleValue, isIntegral(l) && isIntegral(r))
        case "-" | "*" | "/" =>
          val (l, r) = (eval(lAst, ctx, env), eval(rAst, ctx, env))
          if (!l.isNumber || !r.isNumber) NULL
          else op match {
            case "-" => num(l.doubleValue - r.doubleValue, isIntegral(l) && isIntegral(r))
            case "*" => num(l.doubleValue * r.doubleValue, isIntegral(l) && isIntegral(r))
            case _   => double(l.doubleValue / r.doubleValue) // JSLT / is real division
          }
        case other => throw new JsltCompileError(s"operator $other")
      }

    case Call(fn, args) => call(fn, args, ctx, env)

    case Let(bs, body) =>
      val env2 = bs.foldLeft(env) { case (e, (n, ast2)) =>
        e.copy(vars = e.vars + (n -> eval(ast2, ctx, e)))
      }
      eval(body, ctx, env2)

    case Prog(defs, body) =>
      eval(body, ctx, env.copy(defs = env.defs ++ defs.map(d => d.name -> d)))
  }

  private def asStr(v: JsonNode): String =
    if (v.isTextual) v.textValue else if (v.isNull || isMissing(v)) "null"
    else render(v)

  private def jEq(l: JsonNode, r: JsonNode): Boolean =
    if (l.isNumber && r.isNumber) l.doubleValue == r.doubleValue
    else missingToNull(l) == missingToNull(r)

  private def jCmp(l: JsonNode, r: JsonNode): Int =
    if (l.isNumber && r.isNumber) java.lang.Double.compare(l.doubleValue, r.doubleValue)
    else if (l.isTextual && r.isTextual) l.textValue.compareTo(r.textValue)
    else throw new IllegalArgumentException(
      s"cannot compare ${render(l)} and ${render(r)}")

  private def call(fn: String, args: List[Ast], ctx: JsonNode, env: Env): JsonNode = {
    def a(i: Int): JsonNode = eval(args(i), ctx, env)
    fn match {
      case "size" =>
        val v = a(0)
        if (v.isTextual) long(v.textValue.length.toLong)
        else if (v.isArray || v.isObject) long(v.size.toLong)
        else if (v.isNull || isMissing(v)) NULL
        else throw new IllegalArgumentException(s"size(${render(v)})")
      case "string" => val v = a(0); if (v.isTextual) v else text(asStr(v))
      case "number" =>
        val v = a(0)
        if (v.isNumber) v
        else if (v.isTextual)
          try {
            val s = v.textValue
            if (s.contains('.') || s.contains('e') || s.contains('E'))
              double(s.toDouble)
            else long(s.toLong)
          } catch { case _: NumberFormatException => NULL }
        else NULL
      case "boolean" => bool(truthy(a(0)))
      case "not"     => bool(!truthy(a(0)))
      case "lowercase" => text(a(0).textValue.toLowerCase)
      case "uppercase" => text(a(0).textValue.toUpperCase)
      case "trim"      => text(a(0).textValue.trim)
      case "contains" => // contains(element, sequence)
        val (el, seq) = (a(0), a(1))
        if (seq.isTextual) bool(el.isTextual && seq.textValue.contains(el.textValue))
        else if (seq.isArray) bool(seq.elements.asScala.exists(jEq(_, el)))
        else if (seq.isObject) bool(el.isTextual && seq.has(el.textValue))
        else bool(false)
      case "join" =>
        val sep = asStr(a(1))
        text(a(0).elements.asScala.map(asStr).mkString(sep))
      case "split" =>
        val parts = a(0).textValue.split(a(1).textValue, -1)
        val out = arr(); parts.foreach(p => out.add(text(p))); out
      case "starts-with" => bool(a(0).textValue.startsWith(a(1).textValue))
      case "ends-with"   => bool(a(0).textValue.endsWith(a(1).textValue))
      case "round"   => val v = a(0); if (!v.isNumber) NULL else long(math.round(v.doubleValue))
      case "floor"   => val v = a(0); if (!v.isNumber) NULL else long(math.floor(v.doubleValue).toLong)
      case "ceiling" => val v = a(0); if (!v.isNumber) NULL else long(math.ceil(v.doubleValue).toLong)
      case "replace" => text(a(0).textValue.replaceAll(a(1).textValue, a(2).textValue))
      case "flatten" =>
        val out = arr()
        a(0).elements.asScala.foreach {
          case x if x.isArray => x.elements.asScala.foreach(out.add)
          case x              => out.add(x)
        }
        out
      case "sum" =>
        val xs = a(0).elements.asScala.filter(_.isNumber).toSeq
        num(xs.map(_.doubleValue).sum, xs.forall(isIntegral))
      case "min" => val (x, y) = (a(0), a(1)); if (jCmp(x, y) <= 0) x else y
      case "max" => val (x, y) = (a(0), a(1)); if (jCmp(x, y) >= 0) x else y
      case "error" => throw new IllegalStateException(asStr(a(0)))
      case "fallback" => // first non-null/non-missing argument, lazily
        args.iterator.map(eval(_, ctx, env)).map(missingToNull)
          .find(!_.isNull).getOrElse(NULL)
      case "get-key" =>
        val (o, k) = (a(0), a(1))
        val v = if (o.isObject && k.isTextual) missingToNull(o.path(k.textValue)) else NULL
        if (v.isNull && args.length > 2) a(2) else v
      case "is-object"  => bool(a(0).isObject)
      case "is-array"   => bool(a(0).isArray)
      case "is-string"  => bool(a(0).isTextual)
      case "is-number"  => bool(a(0).isNumber)
      case "is-boolean" => bool(a(0).isBoolean)
      case "is-integer" => bool(a(0).isIntegralNumber)
      case "is-decimal" => bool(a(0).isFloatingPointNumber)
      case other =>
        env.defs.get(other) match {
          case Some(d) =>
            if (env.depth >= MaxDepth) throw new IllegalStateException(
              s"JSLT recursion depth > $MaxDepth in '$other'")
            if (d.params.length != args.length) throw new JsltCompileError(
              s"$other expects ${d.params.length} arguments, got ${args.length}")
            val bound = d.params.zip(args.map(eval(_, ctx, env))).toMap
            // function body sees the call-site context, params, and globals
            eval(d.body, ctx, env.copy(vars = env.vars ++ bound, depth = env.depth + 1))
          case None => throw new JsltCompileError(s"unsupported function: $other")
        }
    }
  }

  /** Canonical render for keys etc. */
  private def render(n: JsonNode): String = DynJson.render(missingToNull(n))
}
