package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A jq-subset compiler for the reference's `$jq` stage (Jq.java:16-33;
  * jackson-jq underneath). Same columnar strategy as [[JsltCompiler]]: the
  * filter is compiled against the input schema to Catalyst `Column`s.
  *
  * Supported subset:
  *  - identity `.`, paths `.foo.bar`, `.foo[0]`, `.[1]`
  *  - pipe `f | g` (the right side's context is the left side's output —
  *    the right side must be path/constructor-shaped so its type is known)
  *  - literals, object construction `{a: .b, "c": 1, d}` (shorthand `d` =
  *    `d: .d`), array construction
  *  - `+` (numbers add, strings/arrays concatenate, objects merge — RIGHT
  *    wins, per jq), `- * /`, comparisons, `and or not`
  *  - `//` (alternative: left if not null/false, else right)
  *  - `if c then a else b end`
  *  - `select(cond)` at the TOP level of the filter (drops non-matching
  *    messages, like the stage-level semantics of emitting nothing)
  *  - functions: length, keys, has(k), ascii_downcase, ascii_upcase,
  *    tostring, tonumber, floor, ceil, round, map(f), join(s), split(s)
  *  - modules: `include "m";` splices defs; `import "m" as ns;` exposes
  *    them as `ns::name` (jackson-jq's loader hook, Jq.java:25-27)
  *
  * Anything else raises `JqCompileError` at stage-build time (the reference
  * rethrows script errors — Script.java:40-55).
  */
object JqCompiler {

  final class JqCompileError(msg: String) extends IllegalArgumentException(msg)

  import JsltCompiler.TC

  sealed trait Jq
  case class JPath(steps: List[JStep]) extends Jq
  case class JLit(v: Any) extends Jq
  /** `"a\(expr)b"` — string interpolation; Right parts stringify like jq
    * (strings verbatim, everything else JSON-encoded). */
  case class JStrI(parts: List[Either[String, Jq]]) extends Jq
  /** Object-constructor key: a literal name, or a computed `("expr")` /
    * interpolated-string key. Computed keys that fold to compile-time
    * constants still compile statically; data-dependent ones are a
    * dynamic-mode construct. */
  sealed trait JqKey
  case class KLit(name: String) extends JqKey
  case class KExpr(e: Jq) extends JqKey
  case class JObjC(pairs: List[(JqKey, Jq)]) extends Jq
  case class JArrC(items: List[Jq]) extends Jq
  case class JPipe(l: Jq, r: Jq) extends Jq
  case class JBin(op: String, l: Jq, r: Jq) extends Jq
  case class JIf(c: Jq, t: Jq, e: Jq) extends Jq
  case class JCall(fn: String, args: List[Jq]) extends Jq
  case class JSelect(cond: Jq) extends Jq
  /** `f, g` — output concatenation (dynamic mode; static rejects). */
  case class JComma(l: Jq, r: Jq) extends Jq
  /** `$name` variable reference (`as`-bound or def param). */
  case class JVar(name: String) extends Jq
  /** `EXPR as $x | BODY`. */
  case class JAs(src: Jq, name: String, body: Jq) extends Jq
  /** `reduce SRC as $x (INIT; UPDATE)` — `.` in UPDATE is the accumulator. */
  case class JReduce(src: Jq, name: String, init: Jq, update: Jq) extends Jq
  /** `def name: body;` / `def name(a; b): body;` — params are FILTERS,
    * substituted call-by-name (jq's closure rule for the supported shapes). */
  case class JqDef(name: String, params: List[String], body: Jq)
  case class JDefs(defs: List[JqDef], body: Jq) extends Jq

  sealed trait JStep
  case class JField(name: String) extends JStep
  case class JIndex(i: Long) extends JStep
  /** `.[]` — iterate array elements / object values (dynamic mode). */
  case object JIterate extends JStep

  // ---- parser ---------------------------------------------------------------

  private case class Tok(kind: String, text: String, pos: Int)

  private def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && src(i) != '\n') i += 1 }
      else if (c == '"') {
        // mode-aware scan: `\(expr)` interpolations may nest strings which
        // may themselves interpolate, so string and paren scanning recurse
        val end = scanStringEnd(src, i)
        val raw = src.substring(i + 1, end - 1)
        if (rawHasInterp(raw)) out += Tok("istr", raw, i)
        else out += Tok("str", unescape(raw), i)
        i = end
      } else if (c.isDigit) {
        var j = i
        while (j < n && (src(j).isDigit || src(j) == '.')) j += 1
        out += Tok("num", src.substring(i, j), i); i = j
      } else if (c.isLetter || c == '_') {
        var j = i
        while (j < n && (src(j).isLetterOrDigit || src(j) == '_')) j += 1
        out += Tok("id", src.substring(i, j), i); i = j
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=", "//", "::").contains(two)) {
          out += Tok("op", two, i); i += 2
        } else { out += Tok("op", c.toString, i); i += 1 }
      }
    }
    out += Tok("eof", "", n)
    out.result()
  }

  /** Index just past the closing quote of the string starting at `start`
    * (src(start) == '"'), skipping escapes and whole `\(...)` blocks. */
  private def scanStringEnd(src: String, start: Int): Int = {
    val n = src.length
    var j = start + 1
    while (j < n) {
      src(j) match {
        case '\\' if j + 1 < n && src(j + 1) == '(' =>
          j = scanParensEnd(src, j + 2)
        case '\\' => j += 2
        case '"'  => return j + 1
        case _    => j += 1
      }
    }
    throw new JqCompileError(s"unterminated string at $start")
  }

  /** Index just past the `)` matching the `(` that ends at `k` (k = first
    * char inside the parens); nested strings are skipped whole. */
  private def scanParensEnd(src: String, k: Int): Int = {
    val n = src.length
    var j = k
    var depth = 1
    while (j < n && depth > 0) {
      src(j) match {
        case '"' => j = scanStringEnd(src, j)
        case '(' => depth += 1; j += 1
        case ')' => depth -= 1; j += 1
        case _   => j += 1
      }
    }
    if (depth > 0) throw new JqCompileError(s"unbalanced interpolation at $k")
    j
  }

  /** Does the RAW (still escaped) string body contain a top-level `\(`? */
  private def rawHasInterp(raw: String): Boolean = {
    var j = 0
    while (j < raw.length - 1) {
      if (raw(j) == '\\') {
        if (raw(j + 1) == '(') return true
        j += 2
      } else j += 1
    }
    false
  }

  private def unescape(raw: String): String = {
    val sb = new StringBuilder
    var j = 0
    while (j < raw.length) {
      if (raw(j) == '\\' && j + 1 < raw.length) {
        sb.append(raw(j + 1) match {
          case 'n' => '\n'; case 't' => '\t'; case other => other
        })
        j += 2
      } else { sb.append(raw(j)); j += 1 }
    }
    sb.toString
  }

  /** Split a raw interpolated-string body into literal / expression parts;
    * each expression sub-source parses with the full grammar. */
  private def splitInterp(raw: String): List[Either[String, Jq]] = {
    val parts = List.newBuilder[Either[String, Jq]]
    val litBuf = new StringBuilder
    var j = 0
    def flushLit(): Unit =
      if (litBuf.nonEmpty) { parts += Left(litBuf.toString); litBuf.clear() }
    while (j < raw.length) {
      if (raw(j) == '\\' && j + 1 < raw.length && raw(j + 1) == '(') {
        val end = scanParensEnd(raw, j + 2)
        flushLit()
        parts += Right(parse(raw.substring(j + 2, end - 1)))
        j = end
      } else if (raw(j) == '\\' && j + 1 < raw.length) {
        litBuf.append(raw(j + 1) match {
          case 'n' => '\n'; case 't' => '\t'; case other => other
        })
        j += 2
      } else { litBuf.append(raw(j)); j += 1 }
    }
    flushLit()
    parts.result()
  }

  private final class Parser(toks: Vector[Tok]) {
    private var p = 0
    private def peek = toks(p)
    private def next() = { val t = toks(p); p += 1; t }
    private def expect(s: String): Unit = {
      val t = next()
      if (!(t.kind == "op" && t.text == s))
        throw new JqCompileError(s"expected '$s', got '${t.text}' at ${t.pos}")
    }
    // operator tokens only — a STRING literal "-" must not match an operator
    private def at(s: String) = peek.kind == "op" && peek.text == s
    private def atId(s: String) = peek.kind == "id" && peek.text == s

    def parseProgram(): Jq = {
      val defs = List.newBuilder[JqDef]
      var header = true
      while (header) {
        if (atId("def")) defs += parseDef()
        else if (atId("include")) {
          // `include "module";` — splice the module's defs (the reference
          // exposes jackson-jq's module loader via Features.jqModuleLoader,
          // Jq.java:25-27; here a module is a defs-only script resolved
          // like any script spec: resource:/x, a file path, or inline)
          next()
          val m = next()
          if (m.kind != "str") throw new JqCompileError(
            s"include expects a string at ${m.pos}")
          expect(";")
          defs ++= parseModule(loadModule(m.text))
        } else if (atId("import")) defs ++= parseImport()
        else header = false
      }
      val e = parsePipe()
      if (peek.kind != "eof")
        throw new JqCompileError(s"trailing input at ${peek.pos}: '${peek.text}'")
      val db = defs.result()
      if (db.isEmpty) e else JDefs(db, e)
    }

    def parseModuleDefs(): List[JqDef] = {
      val defs = List.newBuilder[JqDef]
      var header = true
      while (header) { // modules may include other modules
        if (atId("def")) defs += parseDef()
        else if (atId("include")) {
          next()
          val m = next()
          if (m.kind != "str") throw new JqCompileError(
            s"include expects a string at ${m.pos}")
          expect(";")
          defs ++= parseModule(loadModule(m.text))
        } else if (atId("import")) defs ++= parseImport()
        else header = false
      }
      if (peek.kind != "eof") throw new JqCompileError(
        s"a jq module may only contain defs; found '${peek.text}' at ${peek.pos}")
      defs.result()
    }

    /** `import "module" as ns;` — the module's defs become visible as
      * `ns::name` (jackson-jq resolves the same loader for both forms,
      * Jq.java:25-27). Splicing with renamed defs keeps one flat def list;
      * calls INSIDE the module to its own defs are rewritten to the
      * namespaced names unless shadowed by a local def or a param. */
    private def parseImport(): List[JqDef] = {
      next() // import
      val m = next()
      if (m.kind != "str") throw new JqCompileError(
        s"import expects a string at ${m.pos}")
      if (!atId("as")) throw new JqCompileError(
        s"import requires 'as <namespace>' at ${peek.pos}")
      next()
      val ns = next()
      if (ns.kind != "id") throw new JqCompileError(
        s"import namespace must be an identifier at ${ns.pos}")
      expect(";")
      namespaced(ns.text, parseModule(loadModule(m.text)))
    }

    private def parseDef(): JqDef = {
      next() // def
      val name = next().text
      val params = List.newBuilder[String]
      if (at("(")) {
        next()
        def param(): String = {
          if (at("$")) next()
          next().text
        }
        params += param()
        while (at(";")) { next(); params += param() }
        expect(")")
      }
      expect(":")
      val body = parsePipe()
      expect(";")
      JqDef(name, params.result(), body)
    }

    def parsePipe(): Jq = {
      var l = parseSeg()
      while (at("|")) { next(); l = JPipe(l, parseSeg()) }
      l
    }

    // one pipe segment: comma-concatenation of alts, or an `as` binding
    // (which swallows the rest of the pipe as its body)
    private def parseSeg(): Jq = {
      var l = parseAlt()
      if (atId("as")) {
        next()
        expect("$")
        val name = next().text
        expect("|")
        return JAs(l, name, parsePipe())
      }
      while (at(",")) { next(); l = JComma(l, parseAlt()) }
      l
    }

    private def parseAlt(): Jq = {
      var l = parseOr()
      while (at("//")) { next(); l = JBin("//", l, parseOr()) }
      l
    }
    private def parseOr(): Jq = {
      var l = parseAnd()
      while (atId("or")) { next(); l = JBin("or", l, parseAnd()) }
      l
    }
    private def parseAnd(): Jq = {
      var l = parseCmp()
      while (atId("and")) { next(); l = JBin("and", l, parseCmp()) }
      l
    }
    private def parseCmp(): Jq = {
      val l = parseAdd()
      if (peek.kind == "op" && Set("==", "!=", "<", "<=", ">", ">=").contains(peek.text)) {
        val op = next().text
        JBin(op, l, parseAdd())
      } else l
    }
    private def parseAdd(): Jq = {
      var l = parseMul()
      while (at("+") || (at("-") && toks(p + 1).text != ">")) {
        val op = next().text
        l = JBin(op, l, parseMul())
      }
      l
    }
    private def parseMul(): Jq = {
      var l = parsePrimary()
      while (at("*") || at("/") || at("%")) {
        val op = next().text
        l = JBin(op, l, parsePrimary())
      }
      l
    }

    // jq reserves these — `. end` must terminate the path, not read `.end`
    private val keywords =
      Set("then", "else", "elif", "end", "and", "or", "if", "as", "reduce")

    private def parsePath(): JPath = {
      // already consumed "."
      val steps = List.newBuilder[JStep]
      var continue = true
      while (continue) {
        if (peek.kind == "id" && !keywords.contains(peek.text)) {
          steps += JField(next().text)
          if (at(".")) next()
          else if (at("[")) { next(); steps += parseIndex(); expect("]"); if (at(".")) next() else continue = false }
          else continue = false
        } else if (at("[")) {
          next(); steps += parseIndex(); expect("]")
          if (at(".")) next() else continue = false
        } else continue = false
      }
      JPath(steps.result())
    }

    private def parseIndex(): JStep = {
      if (at("]")) JIterate // `.[]` — caller's expect("]") consumes the bracket
      else {
        val t = next()
        if (t.kind == "num") JIndex(t.text.toLong)
        else if (t.kind == "str") JField(t.text)
        else throw new JqCompileError(s"unsupported index '${t.text}' at ${t.pos}")
      }
    }

    private def parsePrimary(): Jq = {
      val t = peek
      t.kind match {
        case "num" =>
          next()
          if (t.text.contains('.')) JLit(t.text.toDouble) else JLit(t.text.toLong)
        case "str"  => next(); JLit(t.text)
        case "istr" => next(); JStrI(splitInterp(t.text))
        case "id" =>
          t.text match {
            case "true"  => next(); JLit(true)
            case "false" => next(); JLit(false)
            case "null"  => next(); JLit(null)
            case "if" =>
              next()
              val c = parsePipe()
              if (!atId("then")) throw new JqCompileError("expected 'then'")
              next()
              val thn = parsePipe()
              val els = if (atId("else")) { next(); parsePipe() } else JLit(null)
              if (!atId("end")) throw new JqCompileError("expected 'end'")
              next()
              JIf(c, thn, els)
            case "select" =>
              next(); expect("(")
              val c = parsePipe()
              expect(")")
              JSelect(c)
            case "reduce" =>
              next()
              val src = parseAlt()
              if (!atId("as")) throw new JqCompileError("expected 'as' in reduce")
              next(); expect("$")
              val name = next().text
              expect("(")
              val init = parsePipe()
              expect(";")
              val update = parsePipe()
              expect(")")
              JReduce(src, name, init, update)
            case "not" => next(); JCall("not", Nil)
            case name0 =>
              next()
              // namespaced call: `ns::fn` (from `import "m" as ns;`)
              val name = if (at("::")) {
                next()
                val member = next()
                if (member.kind != "id") throw new JqCompileError(
                  s"expected identifier after '::' at ${member.pos}")
                s"$name0::${member.text}"
              } else name0
              if (at("(")) {
                next()
                val args = List.newBuilder[Jq]
                args += parsePipe()
                while (at(";")) { next(); args += parsePipe() }
                expect(")")
                JCall(name, args.result())
              } else JCall(name, Nil)
          }
        case _ =>
          t.text match {
            case "-" => next(); JBin("-", JLit(0L), parsePrimary()) // unary minus
            case "$" => next(); JVar(next().text)
            case "." => next(); parsePath()
            case "(" =>
              next()
              val e = parsePipe()
              expect(")")
              e
            case "[" =>
              next()
              val items = List.newBuilder[Jq]
              if (!at("]")) {
                items += parsePipe()
                while (at(",")) { next(); items += parsePipe() }
              }
              expect("]")
              JArrC(items.result())
            case "{" =>
              next()
              val pairs = List.newBuilder[(JqKey, Jq)]
              if (!at("}")) {
                def pair(): Unit = {
                  if (at("(")) { // {(expr): value} — computed key
                    next()
                    val ke = parsePipe()
                    expect(")")
                    expect(":")
                    pairs += (KExpr(ke): JqKey) -> parseAlt()
                  } else {
                    val k = next()
                    k.kind match {
                      case "id" | "str" =>
                        if (at(":")) { next(); pairs += (KLit(k.text): JqKey) -> parseAlt() }
                        else // {a} == {a: .a}
                          pairs += (KLit(k.text): JqKey) -> JPath(List(JField(k.text)))
                      case "istr" => // {"a\(.b)": value} — interpolated key
                        expect(":")
                        pairs += (KExpr(JStrI(splitInterp(k.text))): JqKey) -> parseAlt()
                      case _ => throw new JqCompileError(s"bad key '${k.text}' at ${k.pos}")
                    }
                  }
                }
                pair()
                while (at(",")) { next(); pair() }
              }
              expect("}")
              JObjC(pairs.result())
            case other => throw new JqCompileError(s"unexpected '$other' at ${t.pos}")
          }
      }
    }
  }

  def parse(src: String): Jq = new Parser(tokenize(src)).parseProgram()

  /** A jq module: definitions only. */
  private def parseModule(src: String): List[JqDef] =
    new Parser(tokenize(src)).parseModuleDefs()

  /** Rename a module's defs to `ns::name` and rewrite intra-module calls to
    * the renamed defs. jq scope rule preserved: a call inside the module
    * resolves to the nearest enclosing def/param of that name, so rewrites
    * skip names shadowed by inner `def`s or by a def's own params. */
  private def namespaced(ns: String, defs: List[JqDef]): List[JqDef] = {
    val top = defs.map(_.name).toSet
    def rw(e: Jq, shadow: Set[String]): Jq = e match {
      case JCall(fn, args) =>
        val fn2 = if (top(fn) && !shadow(fn)) s"$ns::$fn" else fn
        JCall(fn2, args.map(rw(_, shadow)))
      case JDefs(ds, b) =>
        val sh = shadow ++ ds.map(_.name)
        JDefs(ds.map(d => JqDef(d.name, d.params, rw(d.body, sh ++ d.params))),
          rw(b, sh))
      case JPath(_) | JLit(_) | JVar(_) => e
      case JStrI(parts)   => JStrI(parts.map(_.map(rw(_, shadow))))
      case JObjC(ps)      => JObjC(ps.map { case (k, v) =>
        (k match { case KExpr(ke) => KExpr(rw(ke, shadow)); case lit => lit }) ->
          rw(v, shadow) })
      case JArrC(items)   => JArrC(items.map(rw(_, shadow)))
      case JPipe(l, r)    => JPipe(rw(l, shadow), rw(r, shadow))
      case JBin(op, l, r) => JBin(op, rw(l, shadow), rw(r, shadow))
      case JIf(c, t, f)   => JIf(rw(c, shadow), rw(t, shadow), rw(f, shadow))
      case JSelect(c)     => JSelect(rw(c, shadow))
      case JComma(l, r)   => JComma(rw(l, shadow), rw(r, shadow))
      case JAs(s, n, b)   => JAs(rw(s, shadow), n, rw(b, shadow))
      case JReduce(s, n, i, u) =>
        JReduce(rw(s, shadow), n, rw(i, shadow), rw(u, shadow))
    }
    defs.map(d => JqDef(s"$ns::${d.name}", d.params, rw(d.body, d.params.toSet)))
  }

  private def loadModule(path: String): String =
    ScriptStages.scriptSource(org.json4s.JString(path))

  // ---- compiler -------------------------------------------------------------

  /** Compiled filter: the document transform plus an optional row predicate
    * (from top-level `select`). */
  final case class CompiledJq(doc: TC, keep: Option[Column])

  final case class JCtx(root: StructType, context: Option[TC],
      keeps: scala.collection.mutable.Buffer[Column],
      guard: Option[Column] = None)

  def compileProgram(src: String, root: StructType): CompiledJq = {
    val ast = expand(parse(src), Map.empty, Map.empty, Set.empty)
    // jq's empty stream propagates outward: a failing `select` ANYWHERE in
    // a single-output filter means the whole filter emits nothing for that
    // input — i.e. the row is dropped. Each compiled select contributes its
    // condition (in its own pipe context) to one conjunctive row predicate.
    val keeps = scala.collection.mutable.Buffer.empty[Column]
    val doc = comp(ast, JCtx(root, None, keeps))
    CompiledJq(doc, keeps.reduceOption(_ && _))
  }

  /** Macro-expand user `def`s (static mode): a call site becomes the def
    * body with param references — `$p` or bare `p` — replaced by the
    * ARGUMENT AST, jq's call-by-name rule. Recursion cannot expand. */
  private[operators] def expand(e: Jq, defs: Map[String, JqDef],
      params: Map[String, Jq], stack: Set[String]): Jq = {
    def go(x: Jq): Jq = expand(x, defs, params, stack)
    e match {
      case JDefs(ds, b) => expand(b, defs ++ ds.map(d => d.name -> d), params, stack)
      case JVar(n) if params.contains(n)        => params(n)
      case JCall(fn, Nil) if params.contains(fn) => params(fn)
      case JCall(fn, args) if defs.contains(fn) =>
        val d = defs(fn)
        if (stack(fn)) throw new JqCompileError(
          s"recursive function '$fn' cannot compile statically; use the dynamic pipeline mode")
        if (d.params.length != args.length) throw new JqCompileError(
          s"$fn expects ${d.params.length} arguments, got ${args.length}")
        val argSub = d.params.zip(args.map(go)).toMap
        expand(d.body, defs, argSub, stack + fn)
      case JPath(_) | JLit(_) | JVar(_) => e
      case JStrI(parts)   => JStrI(parts.map(_.map(go)))
      case JObjC(ps)      => JObjC(ps.map { case (k, v) =>
        (k match { case KExpr(ke) => KExpr(go(ke)); case lit => lit }) -> go(v) })
      case JArrC(items)   => JArrC(items.map(go))
      case JPipe(l, r)    => JPipe(go(l), go(r))
      case JBin(op, l, r) => JBin(op, go(l), go(r))
      case JIf(c, t, f)   => JIf(go(c), go(t), go(f))
      case JCall(fn, args) => JCall(fn, args.map(go))
      case JSelect(c)     => JSelect(go(c))
      case JComma(l, r)   => JComma(go(l), go(r))
      case JAs(s, n, b)   => JAs(go(s), n, expand(b, defs, params - n, stack))
      case JReduce(s, n, i, u) =>
        JReduce(go(s), n, go(i), expand(u, defs, params - n, stack))
    }
  }

  private def rootTC(ctx: JCtx): TC =
    ctx.context.getOrElse(TC(
      struct(ctx.root.fields.map(f => col(f.name).as(f.name)).toIndexedSeq: _*),
      Some(ctx.root)))

  private def truthy(tc: TC): Column = tc.typ match {
    case Some(BooleanType) => coalesce(tc.col, lit(false))
    case Some(NullType)    => lit(false)
    // jq truthiness: only null and false are falsy
    case Some(_)           => tc.col.isNotNull
    case None              => tc.col.isNotNull
  }

  private def walk(tc: TC, steps: List[JStep]): TC = steps match {
    case Nil => tc
    case JField(name) :: rest =>
      tc.typ match {
        case Some(st: StructType) =>
          st.find(_.name == name) match {
            case Some(f) => walk(TC(tc.col.getField(name), Some(f.dataType)), rest)
            case None    => TC(lit(null), Some(NullType))
          }
        case _ => walk(TC(tc.col.getField(name), None), rest)
      }
    case JIndex(i) :: rest =>
      val elemT = tc.typ.collect { case ArrayType(t, _) => t }
      val idx = if (i >= 0) lit(i + 1) else lit(i) // jq 0-based, element_at 1-based
      walk(TC(element_at(tc.col, idx.cast(IntegerType)), elemT), rest)
    case JIterate :: _ => throw new JqCompileError(
      ".[] iteration emits multiple outputs; use the dynamic pipeline mode")
  }

  private def objFields(e: Jq, ctx: JCtx): Option[List[(String, Column)]] = e match {
    case JPath(steps) =>
      val base = walk(rootTC(ctx), steps)
      base.typ.collect { case st: StructType =>
        st.fields.map(f => f.name -> base.col.getField(f.name)).toList
      }
    case JObjC(pairs) => // only statically-foldable keys join a merge/matcher
      val folded = pairs.map { case (k, v) => staticKey(k).map(_ -> comp(v, ctx).col) }
      if (folded.forall(_.isDefined)) Some(folded.map(_.get)) else None
    case JBin("+", l, r) => // jq object +: RIGHT wins
      for (lf <- objFields(l, ctx); rf <- objFields(r, ctx))
        yield lf.filterNot { case (k, _) => rf.exists(_._1 == k) } ++ rf
    case _ => None
  }

  /** Fold an object key to a compile-time constant string: literal names,
    * literal-string computed keys `("k")`, `+`-concatenations of literals,
    * and interpolated strings with only literal parts. */
  private def staticKey(k: JqKey): Option[String] = k match {
    case KLit(name) => Some(name)
    case KExpr(e)   => staticStr(e)
  }
  private def staticStr(e: Jq): Option[String] = e match {
    case JLit(s: String) => Some(s)
    case JLit(l: Long)   => Some(l.toString)
    case JBin("+", l, r) =>
      for (a <- staticStr(l); b <- staticStr(r)) yield a + b
    case JStrI(parts) =>
      val folded = parts.map {
        case Left(s)  => Some(s)
        case Right(x) => staticStr(x)
      }
      if (folded.forall(_.isDefined)) Some(folded.flatten.mkString) else None
    case _ => None
  }

  private def comp(e: Jq, ctx: JCtx): TC = e match {
    case JPath(steps) => walk(rootTC(ctx), steps)
    case JLit(null)       => TC(lit(null), Some(NullType))
    case JLit(b: Boolean) => TC(lit(b), Some(BooleanType))
    case JLit(l: Long)    => TC(lit(l), Some(LongType))
    case JLit(d: Double)  => TC(lit(d), Some(DoubleType))
    case JLit(s: String)  => TC(lit(s), Some(StringType))
    case JLit(o)          => throw new JqCompileError(s"bad literal $o")
    // interpolation stringifies like jq: strings verbatim, null -> "null",
    // containers JSON-encoded (Spark cast renders 1.0 as "1.0" where jq
    // prints "1" — integral-typed columns keep integer rendering)
    case JStrI(parts) =>
      val cols = parts.map {
        case Left(s)  => lit(s)
        case Right(e) =>
          val tc = comp(e, ctx)
          val s = tc.typ match {
            case Some(StringType) => tc.col
            case Some(_: ArrayType) | Some(_: StructType) | Some(_: MapType) =>
              to_json(tc.col)
            case _ => tc.col.cast(StringType)
          }
          coalesce(s, lit("null"))
      }
      TC(concat(cols: _*), Some(StringType))
    case JObjC(pairs) =>
      if (pairs.isEmpty) throw new JqCompileError("empty object")
      // duplicate keys: last wins (JSON object semantics); computed keys
      // compile when they FOLD to compile-time constants (the schema stays
      // static), otherwise they are a dynamic-mode construct
      val compiled = pairs.map { case (k, v) =>
        staticKey(k).getOrElse(throw new JqCompileError(
          s"computed object keys require the dynamic pipeline mode: $k")) ->
          comp(v, ctx).col
      }
      val dedup = compiled.map(_._1).distinct.map { k =>
        k -> compiled.reverse.find(_._1 == k).get._2
      }
      TC(struct(dedup.map { case (k, c) => c.as(k) }: _*), None)
    case JArrC(items) =>
      // `[f, g]` collects the comma-stream's outputs as elements — the one
      // place the static subset CAN express `,`
      def flat(x: Jq): List[Jq] = x match {
        case JComma(l, r) => flat(l) ++ flat(r)
        case other        => List(other)
      }
      val cs = items.flatMap(flat).map(comp(_, ctx))
      TC(array(cs.map(_.col): _*), None)
    case JPipe(l, r) =>
      val lv = comp(l, ctx)
      comp(r, ctx.copy(context = Some(lv)))
    case JIf(c, t, f) =>
      // a `select` inside a branch only drops the row when that branch is
      // TAKEN — thread the branch condition as a guard so contributed keeps
      // become (branch-active => cond) instead of unconditional conjuncts
      val g = truthy(comp(c, ctx))
      def branch(b: Jq, bg: Column) =
        comp(b, ctx.copy(guard = Some(ctx.guard.fold(bg)(_ && bg))))
      val (tv, fv) = (branch(t, g), branch(f, !g))
      val typ = (tv.typ, fv.typ) match {
        case (Some(a), Some(b)) if a == b => Some(a)
        case (Some(a), Some(NullType))    => Some(a)
        case (Some(NullType), Some(b))    => Some(b)
        case _                            => None
      }
      TC(when(g, tv.col).otherwise(fv.col), typ)
    case JSelect(c) =>
      // contributes to the row predicate; the value passes through unchanged.
      // Under an if-branch guard the keep only applies when the branch runs.
      val cond = truthy(comp(c, ctx))
      ctx.keeps += ctx.guard.fold(cond)(g => !g || cond)
      rootTC(ctx)
    case JBin(op, l, r) => op match {
      case "and" => TC(truthy(comp(l, ctx)) && truthy(comp(r, ctx)), Some(BooleanType))
      case "or"  => TC(truthy(comp(l, ctx)) || truthy(comp(r, ctx)), Some(BooleanType))
      case "//" =>
        val (lv, rv) = (comp(l, ctx), comp(r, ctx))
        val typ = if (lv.typ == rv.typ) lv.typ else None
        TC(when(truthy(lv), lv.col).otherwise(rv.col), typ)
      case "==" => TC(comp(l, ctx).col === comp(r, ctx).col, Some(BooleanType))
      case "!=" => TC(comp(l, ctx).col =!= comp(r, ctx).col, Some(BooleanType))
      case "<"  => TC(comp(l, ctx).col < comp(r, ctx).col, Some(BooleanType))
      case "<=" => TC(comp(l, ctx).col <= comp(r, ctx).col, Some(BooleanType))
      case ">"  => TC(comp(l, ctx).col > comp(r, ctx).col, Some(BooleanType))
      case ">=" => TC(comp(l, ctx).col >= comp(r, ctx).col, Some(BooleanType))
      case "+" =>
        (objFields(l, ctx), objFields(r, ctx)) match {
          case (Some(lf), Some(rf)) => // jq merge: right wins
            val merged = lf.filterNot { case (k, _) => rf.exists(_._1 == k) } ++ rf
            TC(struct(merged.map { case (k, c) => c.as(k) }: _*), None)
          case _ =>
            val (lv, rv) = (comp(l, ctx), comp(r, ctx))
            if (lv.typ.contains(StringType) || rv.typ.contains(StringType))
              TC(concat(lv.col.cast(StringType), rv.col.cast(StringType)), Some(StringType))
            else if (lv.typ.exists(_.isInstanceOf[ArrayType]) &&
              rv.typ.exists(_.isInstanceOf[ArrayType]))
              TC(concat(lv.col, rv.col), lv.typ)
            else TC(lv.col + rv.col, None)
        }
      case "-" => TC(comp(l, ctx).col - comp(r, ctx).col, None)
      case "*" => TC(comp(l, ctx).col * comp(r, ctx).col, None)
      case "/" => TC(comp(l, ctx).col.cast(DoubleType) / comp(r, ctx).col.cast(DoubleType),
        Some(DoubleType))
      case "%" => TC(comp(l, ctx).col % comp(r, ctx).col, None)
      case o => throw new JqCompileError(s"operator $o")
    }
    case JCall(fn, args) => call(fn, args, ctx)
    case JVar(n) => throw new JqCompileError(
      s"$$$n is unbound; 'as' variable bindings require the dynamic pipeline mode")
    case _: JComma => throw new JqCompileError(
      "',' emits multiple outputs; use the dynamic pipeline mode")
    case _: JAs => throw new JqCompileError(
      "'as' bindings require the dynamic pipeline mode")
    case _: JReduce => throw new JqCompileError(
      "'reduce' requires the dynamic pipeline mode")
    case _: JDefs => throw new JqCompileError("unexpanded defs") // unreachable
  }

  private def call(fn: String, args: List[Jq], ctx: JCtx): TC = {
    val me = rootTC(ctx)
    fn match {
      case "length" => me.typ match {
        case Some(StringType)   => TC(length(me.col), Some(IntegerType))
        case Some(_: ArrayType) => TC(size(me.col), Some(IntegerType))
        case Some(st: StructType) => TC(lit(st.size), Some(IntegerType))
        case _ => TC(size(me.col), Some(IntegerType))
      }
      case "keys" => me.typ match {
        case Some(st: StructType) =>
          TC(array(st.fieldNames.sorted.map(lit).toIndexedSeq: _*), Some(ArrayType(StringType)))
        case _ => throw new JqCompileError("keys needs a schema-known object")
      }
      case "has" =>
        val k = args.headOption match {
          case Some(JLit(s: String)) => s
          case _ => throw new JqCompileError("has(\"key\") needs a literal key")
        }
        me.typ match {
          case Some(st: StructType) => TC(lit(st.fieldNames.contains(k)), Some(BooleanType))
          case _ => throw new JqCompileError("has needs a schema-known object")
        }
      case "not" => TC(!truthy(me), Some(BooleanType))
      case "ascii_downcase" => TC(lower(me.col), Some(StringType))
      case "ascii_upcase"   => TC(upper(me.col), Some(StringType))
      case "tostring" => TC(me.col.cast(StringType), Some(StringType))
      case "tonumber" => TC(me.col.cast(DoubleType), Some(DoubleType))
      case "floor" => TC(floor(me.col).cast(LongType), Some(LongType))
      case "ceil"  => TC(ceil(me.col).cast(LongType), Some(LongType))
      case "round" => TC(round(me.col).cast(LongType), Some(LongType))
      case "map" =>
        val body = args.headOption.getOrElse(throw new JqCompileError("map(f)"))
        val elemT = me.typ.collect { case ArrayType(t, _) => t }
        // inside map, select filters ELEMENTS (jq's map(select(...)) idiom),
        // not rows — compile with a local buffer and reject other placements
        def elemCtx(x: Column) = ctx.copy(context = Some(TC(x, elemT)),
          keeps = scala.collection.mutable.Buffer.empty, guard = None)
        body match {
          case JSelect(c) =>
            TC(filter(me.col, x => truthy(comp(c, elemCtx(x)))), me.typ)
          case JPipe(JSelect(c), rest) =>
            val kept = filter(me.col, x => truthy(comp(c, elemCtx(x))))
            TC(transform(kept, { x =>
              val ec = elemCtx(x)
              val r = comp(rest, ec)
              // a FURTHER select inside `rest` would be silently dropped —
              // reject it like the plain-body branch below does
              if (ec.keeps.nonEmpty) throw new JqCompileError(
                "select inside map is supported as map(select(c)) or map(select(c) | f)")
              r.col
            }), None)
          case other =>
            TC(transform(me.col, { x =>
              val c = elemCtx(x)
              val r = comp(other, c)
              if (c.keeps.nonEmpty) throw new JqCompileError(
                "select inside map is supported as map(select(c)) or map(select(c) | f)")
              r.col
            }), None)
        }
      case "join" =>
        val sep = args.headOption.map(comp(_, ctx).col).getOrElse(lit(""))
        TC(when(size(me.col) === 0, lit(""))
          .otherwise(aggregate(slice(me.col, lit(2), greatest(size(me.col) - 1, lit(0))),
            element_at(me.col, 1).cast(StringType),
            (acc, x) => concat(acc, sep.cast(StringType), x.cast(StringType)))),
          Some(StringType))
      case "split" => // jq split is literal, not regex — quote it
        val sepRe = args.headOption match {
          case Some(JLit(s: String)) => java.util.regex.Pattern.quote(s)
          case _ => throw new JqCompileError("split needs a literal separator")
        }
        TC(split(me.col, sepRe), Some(ArrayType(StringType)))
      case "add" => // numeric arrays; empty -> null, like jq
        // seed with the FIRST element so the sum keeps the element type
        // (jq prints 6 for [1,2,3]|add, not 6.0 — a 0.0 seed forced Double)
        TC(when(size(me.col) > 0,
          aggregate(slice(me.col, lit(2), greatest(size(me.col) - 1, lit(0))),
            element_at(me.col, 1), (acc, x) => acc + x)),
          me.typ.collect { case ArrayType(t, _) => t })
      case "min" => TC(array_min(me.col), me.typ.collect { case ArrayType(t, _) => t })
      case "max" => TC(array_max(me.col), me.typ.collect { case ArrayType(t, _) => t })
      case "first"   => TC(element_at(me.col, 1), me.typ.collect { case ArrayType(t, _) => t })
      case "last"    => TC(element_at(me.col, -1), me.typ.collect { case ArrayType(t, _) => t })
      case "reverse" => TC(reverse(me.col), me.typ)
      case "sort"    => TC(array_sort(me.col), me.typ)
      case "unique"  => TC(array_sort(array_distinct(me.col)), me.typ)
      case "abs"     => TC(abs(me.col), me.typ)
      case "test" => args.headOption match {
        case Some(JLit(re: String)) =>
          TC(regexp_like(me.col, lit(re)), Some(BooleanType))
        case _ => throw new JqCompileError("test needs a literal regex")
      }
      case "gsub" => (args.headOption, args.lift(1)) match {
        case (Some(JLit(re: String)), Some(JLit(repl: String))) =>
          TC(regexp_replace(me.col, lit(re), lit(repl)), Some(StringType))
        case _ => throw new JqCompileError("gsub needs literal regex and replacement")
      }
      case "ltrimstr" => args.headOption match {
        case Some(JLit(s: String)) =>
          TC(when(me.col.startsWith(s),
            me.col.substr(lit(s.length + 1), length(me.col))).otherwise(me.col),
            Some(StringType))
        case _ => throw new JqCompileError("ltrimstr needs a literal string")
      }
      case "rtrimstr" => args.headOption match {
        case Some(JLit(s: String)) =>
          TC(when(me.col.endsWith(s),
            me.col.substr(lit(1), length(me.col) - s.length)).otherwise(me.col),
            Some(StringType))
        case _ => throw new JqCompileError("rtrimstr needs a literal string")
      }
      case other => throw new JqCompileError(s"unsupported function: $other")
    }
  }
}
