package graft.dynamic

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.json4s._

import scala.jdk.CollectionConverters._

/** Mongo aggregation-expression compiler for the DYNAMIC document mode: a
  * json4s spec compiles ONCE (driver side) to a serializable [[DOp]] tree
  * that executors evaluate per document against Jackson trees. The typed
  * twin is [[graft.mongo.MongoExpr]] (spec → Catalyst Column); this one
  * exists for documents whose shape is unknowable at plan time
  * (Expression.function in the reference, via pincette-mongo).
  *
  * Semantics notes:
  *  - missing ≠ null: path misses evaluate to MISSING and vanish from
  *    object constructors (like Mongo drops missing fields)
  *  - integral arithmetic stays integral; `/` is always double
  *  - comparisons use the Mongo cross-type total order (DynJson.compare)
  */
object DynExpr {

  import DynJson._

  /** Evaluation context: the current document plus `$$var` bindings. */
  final case class DCtx(doc: JsonNode, vars: Map[String, JsonNode])

  sealed trait DOp extends Serializable { def eval(ctx: DCtx): JsonNode }

  /** Sentinel result of `$$REMOVE`. */
  val REMOVE: JsonNode = com.fasterxml.jackson.databind.node.MissingNode.getInstance

  // ---- path resolution ------------------------------------------------------

  /** Mongo path semantics incl. descent into arrays: a non-index segment on
    * an array maps over the elements, collecting present values. */
  def resolve(n: JsonNode, path: List[String]): JsonNode = path match {
    case Nil => n
    case seg :: rest =>
      n match {
        case o: ObjectNode =>
          val child = o.get(seg)
          if (child == null) MISSING else resolve(child, rest)
        case a: ArrayNode =>
          if (seg.nonEmpty && seg.forall(_.isDigit)) {
            val i = seg.toInt
            if (i < a.size) resolve(a.get(i), rest) else MISSING
          } else {
            val out = arr()
            a.asScala.foreach { el =>
              val v = resolve(el, seg :: rest)
              if (!isMissing(v)) out.add(v)
            }
            out
          }
        case _ => MISSING
      }
  }

  final case class DPath(segs: List[String]) extends DOp {
    def eval(ctx: DCtx): JsonNode = resolve(ctx.doc, segs)
  }
  final case class DVar(name: String, segs: List[String]) extends DOp {
    def eval(ctx: DCtx): JsonNode = name match {
      case "ROOT" | "CURRENT" => resolve(ctx.doc, segs)
      case "REMOVE"           => REMOVE
      case "NOW"              => text(java.time.Instant.now.toString)
      case _ =>
        ctx.vars.get(name) match {
          case Some(v) => resolve(v, segs)
          case None => throw new IllegalArgumentException(s"unbound variable $$$$$name")
        }
    }
  }
  final case class DConst(json: String) extends DOp {
    @transient private lazy val node: JsonNode = parse(json)
    def eval(ctx: DCtx): JsonNode = node
  }
  final case class DObj(fields: List[(String, DOp)]) extends DOp {
    def eval(ctx: DCtx): JsonNode = {
      val out = obj()
      fields.foreach { case (k, op) =>
        val v = op.eval(ctx)
        if (!isMissing(v)) out.set[JsonNode](k, v) // $$REMOVE / missing drop
      }
      out
    }
  }
  final case class DArr(items: List[DOp]) extends DOp {
    def eval(ctx: DCtx): JsonNode = {
      val out = arr()
      items.foreach(op => out.add(missingToNull(op.eval(ctx))))
      out
    }
  }
  final case class DFn(name: String, args: List[DOp]) extends DOp {
    def eval(ctx: DCtx): JsonNode = Ops.eval(name, args, ctx)
  }
  /** A pre-evaluated node as a DOp (internal plumbing for [[DConvert]]). */
  private final case class DWrap(v: JsonNode) extends DOp {
    def eval(ctx: DCtx): JsonNode = v
  }
  /** `$convert` {input, to, onError, onNull}: `to` by name or BSON type
    * code; delegates to the `$toX` evaluators; a failed conversion falls to
    * `onError` (else rethrows), null/missing input to `onNull` (else null). */
  final case class DConvert(input: DOp, to: DOp,
      onError: Option[DOp], onNull: Option[DOp]) extends DOp {
    def eval(ctx: DCtx): JsonNode = {
      val v = input.eval(ctx)
      if (v == null || v.isNull || isMissing(v))
        return onNull.map(o => missingToNull(o.eval(ctx))).getOrElse(NULL)
      val toV = to.eval(ctx)
      val toName =
        if (toV.isTextual) toV.textValue
        else toV.intValue match {
          case 1 => "double"; case 2 => "string"; case 8 => "bool"
          case 9 => "date"; case 16 => "int"; case 18 => "long"
          case 19 => "decimal"
          case other => throw new IllegalArgumentException(s"$$convert to: $other")
        }
      val fn = toName match {
        case "int"                => "$toInt"
        case "long"               => "$toLong"
        case "double" | "decimal" => "$toDouble"
        case "bool"               => "$toBool"
        case "string"             => "$toString"
        case "date"               => "$toDate"
        case other => throw new IllegalArgumentException(s"$$convert to $other")
      }
      try Ops.eval(fn, List(DWrap(v)), ctx)
      catch {
        case e: Exception => onError match {
          case Some(o) => missingToNull(o.eval(ctx))
          case None    => throw e
        }
      }
    }
  }
  final case class DLet(vars: List[(String, DOp)], in: DOp) extends DOp {
    def eval(ctx: DCtx): JsonNode = {
      val bound = vars.foldLeft(ctx.vars) { case (vs, (n, op)) =>
        vs + (n -> missingToNull(op.eval(ctx.copy(vars = vs))))
      }
      in.eval(ctx.copy(vars = bound))
    }
  }
  /** $map / $filter with an `as` binding evaluated per element. */
  final case class DMapArr(input: DOp, as: String, in: DOp) extends DOp {
    def eval(ctx: DCtx): JsonNode = input.eval(ctx) match {
      case a: ArrayNode =>
        val out = arr()
        a.asScala.foreach(el =>
          out.add(missingToNull(in.eval(ctx.copy(vars = ctx.vars + (as -> el))))))
        out
      case n if n.isNull || isMissing(n) => NULL
      case _ => throw new IllegalArgumentException("$map input must be an array")
    }
  }
  final case class DFilterArr(input: DOp, as: String, cond: DOp,
      limit: Option[DOp] = None) extends DOp {
    def eval(ctx: DCtx): JsonNode = input.eval(ctx) match {
      case a: ArrayNode =>
        // Mongo: null/missing limit = no limit; < 1 or non-numeric = error
        // (matches mongo/MongoExpr's $filter — differential-pinned)
        val max = limit.map(_.eval(ctx)) match {
          case None                                          => Int.MaxValue
          case Some(n) if n == null || n.isNull || isMissing(n) => Int.MaxValue
          case Some(n) if n.isNumber =>
            val v = n.intValue
            if (v < 1) throw new IllegalArgumentException(
              s"$$filter limit must be >= 1: $v")
            v
          case Some(other) => throw new IllegalArgumentException(
            s"$$filter limit must be numeric: $other")
        }
        val out = arr()
        val it = a.asScala.iterator
        while (it.hasNext && out.size < max) {
          val el = it.next()
          if (truthy(cond.eval(ctx.copy(vars = ctx.vars + (as -> el))))) out.add(el)
        }
        out
      case n if n.isNull || isMissing(n) => NULL
      case _ => throw new IllegalArgumentException("$filter input must be an array")
    }
  }
  final case class DReduce(input: DOp, init: DOp, in: DOp) extends DOp {
    def eval(ctx: DCtx): JsonNode = input.eval(ctx) match {
      case a: ArrayNode =>
        var acc = missingToNull(init.eval(ctx))
        a.asScala.foreach { el =>
          acc = missingToNull(
            in.eval(ctx.copy(vars = ctx.vars + ("value" -> acc) + ("this" -> el))))
        }
        acc
      case n if n.isNull || isMissing(n) => NULL
      case _ => throw new IllegalArgumentException("$reduce input must be an array")
    }
  }
  final case class DSwitch(branches: List[(DOp, DOp)], default: Option[DOp]) extends DOp {
    def eval(ctx: DCtx): JsonNode =
      branches.find { case (c, _) => truthy(c.eval(ctx)) } match {
        case Some((_, t)) => t.eval(ctx)
        case None => default.map(_.eval(ctx)).getOrElse(
          throw new IllegalArgumentException("$switch fell through without default"))
      }
  }

  // ---- compile --------------------------------------------------------------

  def compile(spec: JValue): DOp = spec match {
    case JString(s) if s.startsWith("$$") =>
      val segs = s.drop(2).split('.').toList
      DVar(segs.head, segs.tail)
    case JString(s) if s.startsWith("$") => DPath(s.drop(1).split('.').toList)
    case JString(s)  => DConst(DynJson.render(text(s)))
    case JInt(i)     => DConst(i.toString)
    case JLong(l)    => DConst(l.toString)
    case JDouble(d)  => DConst(d.toString)
    case JDecimal(d) => DConst(d.toString)
    case JBool(b)    => DConst(b.toString)
    case JNull       => DConst("null")
    case JArray(items) => DArr(items.map(compile))
    case JObject(List((op, arg))) if op.startsWith("$") => compileOp(op, arg)
    case JObject(fields) =>
      DObj(fields.map { case (k, v) => k -> compile(v) })
    case other => throw new IllegalArgumentException(s"bad expression: $other")
  }

  private def argList(arg: JValue): List[DOp] = arg match {
    case JArray(items) => items.map(compile)
    case single        => List(compile(single))
  }

  private def compileOp(op: String, arg: JValue): DOp = op match {
    case "$literal" =>
      DConst(org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(arg)))
    case "$meta" => arg match {
      // $vectorSearch leaves its score in the hidden __vsScore field
      case JString("vectorSearchScore") => DPath(List("__vsScore"))
      // $rankFusion leaves its fused score in the hidden __score field
      case JString("score") => DPath(List("__score"))
      // $search leaves its BM25 relevance in __searchScore
      case JString("searchScore") => DPath(List("__searchScore"))
      case other => throw new IllegalArgumentException(s"$$meta: $other")
    }
    case "$let" =>
      val vars = (arg \ "vars") match {
        case JObject(vs) => vs.map { case (n, e) => n -> compile(e) }
        case _           => Nil
      }
      DLet(vars, compile(arg \ "in"))
    case "$map" =>
      val as = arg \ "as" match { case JString(a) => a; case _ => "this" }
      DMapArr(compile(arg \ "input"), as, compile(arg \ "in"))
    case "$filter" =>
      val as = arg \ "as" match { case JString(a) => a; case _ => "this" }
      DFilterArr(compile(arg \ "input"), as, compile(arg \ "cond"),
        arg \ "limit" match { case JNothing => None; case l => Some(compile(l)) })
    case "$reduce" =>
      DReduce(compile(arg \ "input"), compile(arg \ "initialValue"), compile(arg \ "in"))
    case "$cond" =>
      arg match {
        case JArray(List(c, t, e)) => DSwitch(List((compile(c), compile(t))), Some(compile(e)))
        case o: JObject =>
          DSwitch(List((compile(o \ "if"), compile(o \ "then"))), Some(compile(o \ "else")))
        case other => throw new IllegalArgumentException(s"$$cond: $other")
      }
    case "$switch" =>
      val branches = (arg \ "branches") match {
        case JArray(bs) =>
          bs.map(b => (compile(b \ "case"), compile(b \ "then")))
        case _ => Nil
      }
      val default = (arg \ "default") match {
        case JNothing => None
        case d        => Some(compile(d))
      }
      DSwitch(branches, default)
    case "$dateToString" =>
      DFn(op, List(compile(arg \ "date"), compile(arg \ "format")))
    case "$dateFromString" =>
      DFn("$toDate", List(compile(arg \ "dateString")))
    case "$dateAdd" | "$dateSubtract" =>
      DFn(op, List(compile(arg \ "startDate"), compile(arg \ "unit"),
        compile(arg \ "amount")))
    case "$dateDiff" =>
      DFn(op, List(compile(arg \ "startDate"), compile(arg \ "endDate"),
        compile(arg \ "unit")))
    case "$dateTrunc" =>
      DFn(op, List(compile(arg \ "date"), compile(arg \ "unit")))
    case "$regexMatch" | "$regexFind" | "$regexFindAll" =>
      DFn(op, List(compile(arg \ "input"), compile(arg \ "regex")) ++
        (arg \ "options" match { case JNothing => Nil; case o => List(compile(o)) }))
    case "$replaceAll" | "$replaceOne" =>
      DFn(op, List(compile(arg \ "input"), compile(arg \ "find"),
        compile(arg \ "replacement")))
    case "$trim" | "$ltrim" | "$rtrim" =>
      DFn(op, compile(arg \ "input") :: (arg \ "chars" match {
        case JNothing => Nil; case c => List(compile(c)) }))
    case "$sortArray" => // sortBy passes through whole: 1/-1 scalar, or a
      // {field: dir} document spec for arrays of documents
      DFn(op, List(compile(arg \ "input"),
        DConst(org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(arg \ "sortBy" match {
            case JNothing => JInt(1); case sb => sb })))))
    case "$firstN" | "$lastN" | "$maxN" | "$minN" =>
      DFn(op, List(compile(arg \ "input"), compile(arg \ "n")))
    case "$median" => // Mongo 7.0 expression form over an array input
      DFn(op, List(compile(arg \ "input")))
    case "$percentile" =>
      DFn(op, List(compile(arg \ "input"), compile(arg \ "p")))
    case "$convert" =>
      DConvert(compile(arg \ "input"), compile(arg \ "to"),
        arg \ "onError" match { case JNothing => None; case e => Some(compile(e)) },
        arg \ "onNull" match { case JNothing => None; case e => Some(compile(e)) })
    case "$dateFromParts" =>
      val defaults = List("year" -> "null", "month" -> "1", "day" -> "1",
        "hour" -> "0", "minute" -> "0", "second" -> "0", "millisecond" -> "0")
      DFn(op, defaults.map { case (f, d) =>
        arg \ f match { case JNothing => DConst(d); case e => compile(e) } })
    case "$dateToParts" =>
      DFn(op, List(compile(arg \ "date"),
        DConst(arg \ "iso8601" match { case JBool(true) => "true"; case _ => "false" })))
    case "$zip" => // inputs..., then defaults (or null) and the
      // useLongestLength flag as trailing constant args
      DFn(op, argList(arg \ "inputs") ++ List(
        arg \ "defaults" match { case JNothing => DConst("null")
                                 case d        => compile(d) },
        DConst(if ((arg \ "useLongestLength") == JBool(true)) "true"
               else "false")))
    // field accessors for names the path syntax can't reach ('.', '$'-led)
    case "$getField" => arg match {
      case JString(f) => DFn(op, List(DConst("\"" + f.replace("\"", "\\\"") + "\""),
        DVar("CURRENT", Nil)))
      case o: JObject => DFn(op, List(compile(o \ "field"),
        o \ "input" match { case JNothing => DVar("CURRENT", Nil)
                            case in       => compile(in) }))
      case other => throw new IllegalArgumentException(s"$$getField: $other")
    }
    case "$setField" | "$unsetField" =>
      DFn(op, List(compile(arg \ "field"), compile(arg \ "input")) ++
        (op match { case "$setField" => List(compile(arg \ "value"))
                    case _           => Nil }))
    case name => DFn(name, argList(arg))
  }

  /** Operator evaluators (the `DFn` body) — n-ary ops over evaluated args. */
  /** Mongo-ish date coercion (epoch millis, ISO-8601 variants) — shared
    * with DynStages' `$densify` date units. */
  private[dynamic] def parseInstant(n: JsonNode): Option[java.time.Instant] =
    Ops.toInstant(n)

  private object Ops {

    /** Mongo regex `options` (`i`/`m`/`s`/`x`) as Java Pattern flags;
      * anything else rejects — mirrors the typed RegexFindAllExpr. */
    private def regexPattern(re: JsonNode,
        optsArg: Option[JsonNode]): java.util.regex.Pattern = {
      val options = optsArg.filter(o => !o.isNull && !isMissing(o))
        .map(_.textValue).getOrElse("")
      require(options.forall("imsx".contains(_)),
        s"unsupported regex options '$options' (allowed: i m s x)")
      var flags = 0
      if (options.contains('i'))
        flags |= java.util.regex.Pattern.CASE_INSENSITIVE |
          java.util.regex.Pattern.UNICODE_CASE
      if (options.contains('m')) flags |= java.util.regex.Pattern.MULTILINE
      if (options.contains('s')) flags |= java.util.regex.Pattern.DOTALL
      if (options.contains('x')) flags |= java.util.regex.Pattern.COMMENTS
      java.util.regex.Pattern.compile(re.textValue, flags)
    }

    private def numArith(name: String, args: List[JsonNode])(
        fl: (Long, Long) => Long, fd: (Double, Double) => Double): JsonNode = {
      if (args.exists(a => a.isNull || isMissing(a))) return NULL
      if (!args.forall(_.isNumber))
        throw new IllegalArgumentException(s"$name needs numbers, got ${args.map(typeName)}")
      if (args.forall(_.isIntegralNumber))
        long(args.map(_.longValue).reduce(fl))
      else double(args.map(_.doubleValue).reduce(fd))
    }

    private def mathFn(args: List[JsonNode])(f: Double => Double): JsonNode =
      args.head match {
        case n if n.isNull || isMissing(n) => NULL
        case n if n.isNumber               => double(f(n.doubleValue))
        case other => throw new IllegalArgumentException(s"math op on ${typeName(other)}")
      }

    /** Two-arg math: a null/missing SECOND operand yields null too (Mongo),
      * and a non-numeric one is a hard error — never fed to doubleValue. */
    private def math2(name: String, x: JsonNode, y: JsonNode)(
        f: (Double, Double) => Double): JsonNode =
      if (y == null || y.isNull || isMissing(y)) NULL
      else if (!y.isNumber)
        throw new IllegalArgumentException(s"$name operand on ${typeName(y)}")
      else mathFn(List(x))(f(_, y.doubleValue))

    private[dynamic] def toInstant(n: JsonNode): Option[java.time.Instant] =
      if (n == null || n.isNull || isMissing(n)) None
      else if (n.isIntegralNumber) Some(java.time.Instant.ofEpochMilli(n.longValue))
      else if (n.isTextual) {
        val s = n.textValue
        (try Some(java.time.Instant.parse(s)) catch { case _: Exception => None })
          .orElse(try Some(java.time.OffsetDateTime.parse(s).toInstant)
            catch { case _: Exception => None })
          .orElse(try Some(java.time.LocalDateTime.parse(s.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC)) catch { case _: Exception => None })
          .orElse(try Some(java.time.LocalDate.parse(s).atStartOfDay
            .toInstant(java.time.ZoneOffset.UTC)) catch { case _: Exception => None })
      } else None

    private def utc(n: JsonNode): Option[java.time.ZonedDateTime] =
      toInstant(n).map(i => java.time.ZonedDateTime.ofInstant(i, java.time.ZoneOffset.UTC))

    def eval(name: String, argOps: List[DOp], ctx: DCtx): JsonNode = {
      def a(i: Int): JsonNode = argOps(i).eval(ctx)
      lazy val args: List[JsonNode] = argOps.map(_.eval(ctx))
      name match {
        // Mongo date arithmetic (typed-engine parity): a TEXTUAL operand
        // that parses as an instant is a date — $add shifts it by the
        // numeric operands' milliseconds, $subtract of two dates yields
        // millis, date minus number shifts. Numbers stay plain arithmetic
        // (an epoch-millis NUMBER is deliberately NOT auto-dated here).
        case "$add" =>
          def isDateN(x: JsonNode) = x != null && x.isTextual &&
            parseInstant(x).isDefined
          val dateIdx = args.indexWhere(isDateN)
          if (args.exists(x => x == null || x.isNull || isMissing(x))) NULL
          else if (dateIdx >= 0 &&
              args.zipWithIndex.forall { case (x, i) => i == dateIdx || x.isNumber }) {
            val shift = args.zipWithIndex.collect {
              case (x, i) if i != dateIdx => x.longValue }.sum
            text(parseInstant(args(dateIdx)).get.plusMillis(shift).toString)
          } else numArith(name, args)(_ + _, _ + _)
        case "$subtract" =>
          def isDateN(x: JsonNode) = x != null && x.isTextual &&
            parseInstant(x).isDefined
          if (args.exists(x => x == null || x.isNull || isMissing(x))) NULL
          else (args: @unchecked) match {
            case List(a0, b0) if isDateN(a0) && isDateN(b0) =>
              long(parseInstant(a0).get.toEpochMilli -
                parseInstant(b0).get.toEpochMilli)
            case List(a0, b0) if isDateN(a0) && b0.isNumber =>
              text(parseInstant(a0).get.minusMillis(b0.longValue).toString)
            case List(a0, b0) if a0.isNumber && isDateN(b0) =>
              // Mongo errors; mirror mongo/MongoExpr's explicit rejection
              throw new IllegalArgumentException(
                "$subtract: cannot subtract a date from a number (swap the " +
                  "operands or $toLong the date first)")
            case _ => numArith(name, args)(_ - _, _ - _)
          }
        case "$multiply" => numArith(name, args)(_ * _, _ * _)
        case "$divide" =>
          val List(x, y) = args
          if (x.isNull || y.isNull || isMissing(x) || isMissing(y)) NULL
          else double(x.doubleValue / y.doubleValue)
        case "$mod" => numArith(name, args)(_ % _, _ % _)
        case "$abs" =>
          args.head match {
            case n if n.isNull || isMissing(n) => NULL
            case n if n.isIntegralNumber       => long(math.abs(n.longValue))
            case n if n.isNumber               => double(math.abs(n.doubleValue))
            case other => throw new IllegalArgumentException(s"$$abs on ${typeName(other)}")
          }
        case "$pow"   => math2("$pow", a(0), a(1))(math.pow)
        case "$sqrt"  => mathFn(args)(math.sqrt)
        case "$exp"   => mathFn(args)(math.exp)
        case "$ln"    => mathFn(args)(math.log)
        case "$log10" => mathFn(args)(math.log10)
        case "$log" => // log base b: [x, b]
          math2("$log", a(0), a(1))((x, b) => math.log(x) / math.log(b))
        case "$sin"   => mathFn(args)(math.sin)
        case "$cos"   => mathFn(args)(math.cos)
        case "$tan"   => mathFn(args)(math.tan)
        case "$asin"  => mathFn(args)(math.asin)
        case "$acos"  => mathFn(args)(math.acos)
        case "$atan"  => mathFn(args)(math.atan)
        case "$atan2" => math2("$atan2", a(0), a(1))(math.atan2)
        case "$sinh"  => mathFn(args)(math.sinh)
        case "$cosh"  => mathFn(args)(math.cosh)
        case "$tanh"  => mathFn(args)(math.tanh)
        // JDK has no inverse hyperbolics; the log identities are exact enough
        case "$asinh" => mathFn(args)(x => math.log(x + math.sqrt(x * x + 1)))
        case "$acosh" => mathFn(args)(x => math.log(x + math.sqrt(x * x - 1)))
        case "$atanh" => mathFn(args)(x => 0.5 * math.log((1 + x) / (1 - x)))
        case "$degreesToRadians" => mathFn(args)(math.toRadians)
        case "$radiansToDegrees" => mathFn(args)(math.toDegrees)
        case "$floor" =>
          args.head match {
            case n if n.isNull || isMissing(n) => NULL
            case n => long(math.floor(n.doubleValue).toLong)
          }
        case "$ceil" =>
          args.head match {
            case n if n.isNull || isMissing(n) => NULL
            case n => long(math.ceil(n.doubleValue).toLong)
          }
        case "$round" | "$trunc" =>
          args.head match {
            case n if n.isNull || isMissing(n) => NULL
            case n =>
              val places = if (args.size > 1) args(1).intValue else 0
              val f = math.pow(10, places)
              val v =
                if (name == "$round")
                  BigDecimal(n.doubleValue).setScale(places, BigDecimal.RoundingMode.HALF_EVEN).toDouble
                else math.floor(math.abs(n.doubleValue) * f) / f * math.signum(n.doubleValue)
              num(v, places <= 0)
          }

        case "$concat" =>
          if (args.exists(x => x.isNull || isMissing(x))) NULL
          else text(args.map(_.textValue).mkString)
        case "$toUpper" => if (a(0).isNull || isMissing(a(0))) text("") else text(a(0).textValue.toUpperCase)
        case "$toLower" => if (a(0).isNull || isMissing(a(0))) text("") else text(a(0).textValue.toLowerCase)
        case "$strLenCP" => // null/missing -> null, like the typed Columns
          if (a(0) == null || a(0).isNull || isMissing(a(0))) NULL
          else long(a(0).textValue.codePointCount(0, a(0).textValue.length).toLong)
        case "$toUUID" => // Mongo 8.0; same canonical-lowercase-string
          // convention as the typed engine (no BinData in either model)
          if (a(0) == null || a(0).isNull || isMissing(a(0))) NULL
          else {
            val v = a(0).textValue
            if (v != null && v.matches("[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-" +
                "[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"))
              text(v.toLowerCase(java.util.Locale.ROOT))
            else throw new IllegalArgumentException(
              s"$$toUUID: invalid UUID string: $v")
          }
        case "$strLenBytes" | "$binarySize" =>
          if (a(0) == null || a(0).isNull || isMissing(a(0))) NULL
          else long(a(0).textValue
            .getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong)
        case "$bsonSize" =>
          // byte size of the BSON encoding (Mongo 4.4) — same sizing rules
          // as the typed BsonSizeExpr: all integrals are int64 (8), textual
          // instants are BSON dates (8, the engine's date convention);
          // dynamic objects keep explicit null fields as real elements.
          if (a(0) == null || a(0).isNull || isMissing(a(0))) NULL
          else {
            def keyBytes(k: String): Int =
              k.getBytes(java.nio.charset.StandardCharsets.UTF_8).length + 1
            def valueSize(n: JsonNode): Int = n match {
              case o: com.fasterxml.jackson.databind.node.ObjectNode =>
                4 + o.fields.asScala
                  .map(e => 1 + keyBytes(e.getKey) + valueSize(e.getValue))
                  .sum + 1
              case arr if arr.isArray =>
                4 + arr.asScala.zipWithIndex
                  .map { case (e, i) =>
                    1 + keyBytes(i.toString) + valueSize(e) }.sum + 1
              case t if t.isTextual =>
                if (parseInstant(t).isDefined) 8
                else 4 + t.textValue
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8).length + 1
              case num if num.isNumber => 8
              case b if b.isBoolean => 1
              case x if x.isNull => 0
              case other => throw new IllegalArgumentException(
                s"$$bsonSize: unsupported node ${other.getNodeType}")
            }
            require(a(0).isObject, s"$$bsonSize requires a document")
            long(valueSize(a(0)).toLong)
          }
        case "$bitAnd" | "$bitOr" | "$bitXor" =>
          if (args.exists(x => x.isNull || isMissing(x))) NULL
          else long(args.map(_.longValue).reduce((x, y) => name match {
            case "$bitAnd" => x & y
            case "$bitOr"  => x | y
            case _         => x ^ y
          }))
        case "$bitNot" =>
          if (a(0).isNull || isMissing(a(0))) NULL else long(~a(0).longValue)
        case "$substrCP" =>
          if (a(0) == null || a(0).isNull || isMissing(a(0))) return NULL
          val s = a(0).textValue
          val start = a(1).intValue
          val len = a(2).intValue
          val from = math.min(math.max(start, 0), s.length)
          text(s.substring(from, math.min(from + math.max(len, 0), s.length)))
        case "$split" =>
          val s = a(0); val sep = a(1)
          if (s.isNull || isMissing(s)) NULL
          else {
            val out = arr()
            // literal separator, like Mongo (not a regex)
            s.textValue.split(java.util.regex.Pattern.quote(sep.textValue), -1)
              .foreach(p => out.add(text(p)))
            out
          }
        case "$indexOfCP" =>
          if (a(0) == null || a(0).isNull || isMissing(a(0))) NULL
          else {
            // Mongo searches the code-point WINDOW s[start, end): the
            // occurrence must fit entirely inside it
            val s = a(0).textValue
            val sub = a(1).textValue
            val total = s.codePointCount(0, s.length)
            val start = if (argOps.length > 2) a(2).intValue else 0
            val end =
              if (argOps.length > 3) math.min(a(3).intValue, total) else total
            require(start >= 0 && end >= 0,
              "$indexOfCP start/end must be non-negative")
            if (start > total || end < start) long(-1L)
            else {
              val from = s.offsetByCodePoints(0, start)
              val to = s.offsetByCodePoints(0, end)
              val idx = s.substring(from, to).indexOf(sub)
              if (idx < 0) long(-1L)
              else long((start + s.substring(from, to).codePointCount(0, idx)).toLong)
            }
          }

        case "$substrBytes" | "$substr" =>
          // byte-indexed slice; splitting a UTF-8 code point ERRORS like the
          // server (and the typed SubstrBytesExpr — differential-pinned).
          // Deprecated `$substr` is the same op except a negative count
          // means "rest of the string" (the legacy server rule).
          if (args.exists(x => x == null || x.isNull || isMissing(x))) NULL
          else {
            val bytes = a(0).textValue
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val start = a(1).intValue
            val rawCount = a(2).intValue
            val count =
              if (name == "$substr" && rawCount < 0) Int.MaxValue else rawCount
            require(start >= 0 && count >= 0,
              s"$$substrBytes: negative start/count ($start, $count)")
            def isCont(b: Byte): Boolean = (b & 0xc0) == 0x80
            if (start >= bytes.length) text("")
            else {
              val end = math.min(start.toLong + count, bytes.length).toInt
              require(!isCont(bytes(start)),
                s"$$substrBytes: byte index $start splits a UTF-8 character")
              require(end == bytes.length || !isCont(bytes(end)),
                s"$$substrBytes: byte index $end splits a UTF-8 character")
              text(new String(bytes, start, end - start,
                java.nio.charset.StandardCharsets.UTF_8))
            }
          }
        case "$indexOfBytes" =>
          // pure byte search inside the byte window [start, end) — the
          // occurrence must FIT in the window; indices need not align to
          // character boundaries (matches the typed IndexOfBytesExpr)
          if (args.exists(x => x == null || x.isNull || isMissing(x))) NULL
          else {
            val h = a(0).textValue
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val n = a(1).textValue
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val start = if (argOps.length > 2) a(2).intValue else 0
            val rawEnd =
              if (argOps.length > 3) a(3).longValue else Long.MaxValue
            require(start >= 0 && rawEnd >= 0,
              "$indexOfBytes start/end must be non-negative")
            val end = math.min(rawEnd, h.length.toLong).toInt
            if (start > h.length || end < start) long(-1L)
            else {
              var res = -1L
              var i = start
              val last = end - n.length
              while (res < 0 && i <= last) {
                var j = 0
                while (j < n.length && h(i + j) == n(j)) j += 1
                if (j == n.length) res = i.toLong
                i += 1
              }
              long(res)
            }
          }

        case "$eq"  => bool(deepEq(a(0), a(1)))
        case "$ne"  => bool(!deepEq(a(0), a(1)))
        case "$gt"  => bool(compare(a(0), a(1)) > 0)
        case "$gte" => bool(compare(a(0), a(1)) >= 0)
        case "$lt"  => bool(compare(a(0), a(1)) < 0)
        case "$lte" => bool(compare(a(0), a(1)) <= 0)
        case "$cmp" => long(Integer.signum(compare(a(0), a(1))).toLong)
        case "$strcasecmp" =>
          long(Integer.signum(a(0).asText.toLowerCase
            .compareTo(a(1).asText.toLowerCase)).toLong)

        case "$and" => bool(argOps.forall(op => truthy(op.eval(ctx))))
        case "$or"  => bool(argOps.exists(op => truthy(op.eval(ctx))))
        case "$not" => bool(!truthy(a(0)))

        case "$ifNull" =>
          argOps.iterator.map(_.eval(ctx)).find(v => !v.isNull && !isMissing(v))
            .getOrElse(NULL)

        case "$mergeObjects" =>
          val out = obj()
          args.foreach {
            case o: ObjectNode =>
              o.fields().asScala.foreach(e => out.set[JsonNode](e.getKey, e.getValue))
            case n if n.isNull || isMissing(n) => ()
            case other =>
              throw new IllegalArgumentException(s"$$mergeObjects on ${typeName(other)}")
          }
          out
        case "$objectToArray" =>
          a(0) match {
            case o: ObjectNode =>
              val out = arr()
              o.fields().asScala.foreach { e =>
                val kv = obj()
                kv.set[JsonNode]("k", text(e.getKey))
                kv.set[JsonNode]("v", e.getValue)
                out.add(kv)
              }
              out
            case _ => NULL
          }
        case "$arrayToObject" =>
          a(0) match {
            case ar: ArrayNode =>
              val out = obj()
              ar.asScala.foreach {
                case kv: ObjectNode => out.set[JsonNode](kv.get("k").textValue, kv.get("v"))
                case pair: ArrayNode => out.set[JsonNode](pair.get(0).textValue, pair.get(1))
                case other =>
                  throw new IllegalArgumentException(s"$$arrayToObject entry ${typeName(other)}")
              }
              out
            case _ => NULL
          }

        case "$rand" => // uniform [0, 1) per evaluation (nondeterministic)
          double(java.util.concurrent.ThreadLocalRandom.current().nextDouble())

        // field accessors for names the path syntax can't reach (Mongo 5.0):
        // $getField misses on non-objects; $setField needs object-or-null
        // input; value $$REMOVE (MISSING) deletes the field
        case "$getField" =>
          val f = a(0)
          if (!f.isTextual)
            throw new IllegalArgumentException("$getField field must be a string")
          a(1) match {
            case o: ObjectNode =>
              val v = o.get(f.textValue)
              if (v == null) MISSING else v
            case _ => MISSING
          }
        case "$setField" | "$unsetField" =>
          val f = a(0)
          if (!f.isTextual)
            throw new IllegalArgumentException(s"$name field must be a string")
          a(1) match {
            case o: ObjectNode =>
              val out = o.deepCopy[ObjectNode]()
              val v = if (name == "$setField") a(2) else MISSING
              if (isMissing(v)) out.remove(f.textValue)
              else out.set[JsonNode](f.textValue, v)
              out
            case n if n.isNull || isMissing(n) => NULL
            case other => throw new IllegalArgumentException(
              s"$name input must be an object, got ${typeName(other)}")
          }

        case "$size" =>
          a(0) match {
            case ar: ArrayNode => long(ar.size.toLong)
            case n if n == null || n.isNull || isMissing(n) => NULL // typed
            // engine convention: absent input -> null, not an error
            case other => throw new IllegalArgumentException(s"$$size of ${typeName(other)}")
          }
        case "$arrayElemAt" =>
          a(0) match {
            case ar: ArrayNode =>
              val i0 = a(1).intValue
              val i = if (i0 < 0) ar.size + i0 else i0
              if (i >= 0 && i < ar.size) ar.get(i) else MISSING
            case _ => NULL
          }
        case "$first" => eval("$arrayElemAt", List(argOps.head, DConst("0")), ctx)
        case "$last"  => eval("$arrayElemAt", List(argOps.head, DConst("-1")), ctx)
        case "$concatArrays" =>
          if (args.exists(x => x.isNull || isMissing(x))) NULL
          else {
            val out = arr()
            args.foreach { case ar: ArrayNode => out.addAll(ar); case _ => () }
            out
          }
        case "$slice" =>
          a(0) match {
            case ar: ArrayNode =>
              val out = arr()
              val (from, n) =
                if (args.size == 3) (a(1).intValue, a(2).intValue)
                else { val k = a(1).intValue; if (k < 0) (ar.size + k, -k) else (0, k) }
              val start = math.max(if (from < 0) ar.size + from else from, 0)
              (start until math.min(start + math.max(n, 0), ar.size)).foreach(i => out.add(ar.get(i)))
              out
            case _ => NULL
          }
        case "$reverseArray" =>
          a(0) match {
            case ar: ArrayNode =>
              val out = arr()
              (ar.size - 1 to 0 by -1).foreach(i => out.add(ar.get(i)))
              out
            case _ => NULL
          }
        case "$in" =>
          a(1) match {
            case ar: ArrayNode => bool(ar.asScala.exists(deepEq(_, a(0))))
            case n if n == null || n.isNull || isMissing(n) => NULL // typed
            // engine convention: absent input -> null, not an error
            case _ => throw new IllegalArgumentException("$in needs an array")
          }
        case "$range" =>
          val step = if (args.size > 2) a(2).longValue else 1L
          val out = arr()
          var i = a(0).longValue
          val end = a(1).longValue
          while (if (step > 0) i < end else i > end) { out.add(long(i)); i += step }
          out
        // array-context aggregates (the accumulator forms live in DynGroupAgg):
        // one array arg flattens; the n-ary scalar form aggregates the args
        case "$sum" | "$avg" | "$max" | "$min" =>
          val in =
            if (args.size > 1) args
            else args.head match {
              case ar: ArrayNode => ar.asScala.toList
              case single        => List(single)
            }
          name match {
            case "$sum" =>
              val nums = in.filter(_.isNumber)
              if (nums.isEmpty) long(0)
              else if (nums.forall(_.isIntegralNumber)) long(nums.map(_.longValue).sum)
              else double(nums.map(_.doubleValue).sum)
            case "$avg" =>
              val nums = in.filter(_.isNumber)
              if (nums.isEmpty) NULL else double(nums.map(_.doubleValue).sum / nums.size)
            case "$max" =>
              val vs = in.filterNot(v => v.isNull || isMissing(v))
              if (vs.isEmpty) NULL else vs.max(mongoOrder)
            case "$min" =>
              val vs = in.filterNot(v => v.isNull || isMissing(v))
              if (vs.isEmpty) NULL else vs.min(mongoOrder)
          }

        case "$type" => text(typeName(a(0)))
        case "$toString" =>
          a(0) match {
            case n if n.isNull || isMissing(n) => NULL
            case n if n.isTextual              => n
            case n                             => text(canonicalScalar(n))
          }
        case "$toInt" | "$toLong" =>
          a(0) match {
            case n if n.isNull || isMissing(n) => NULL
            case n if n.isNumber  => long(n.longValue)
            case n if n.isTextual => long(n.textValue.trim.toDouble.toLong)
            case n if n.isBoolean => long(if (n.booleanValue) 1 else 0)
            case other => throw new IllegalArgumentException(s"$$toLong of ${typeName(other)}")
          }
        case "$toDouble" =>
          a(0) match {
            case n if n.isNull || isMissing(n) => NULL
            case n if n.isNumber  => double(n.doubleValue)
            case n if n.isTextual => double(n.textValue.trim.toDouble)
            case n if n.isBoolean => double(if (n.booleanValue) 1 else 0)
            case other => throw new IllegalArgumentException(s"$$toDouble of ${typeName(other)}")
          }
        case "$toBool" =>
          a(0) match {
            case n if n.isNull || isMissing(n) => NULL
            case n => bool(truthy(n))
          }

        // ---- dates (ISO-8601 strings or epoch millis in; ISO strings out:
        // JSON has no date type and the reference's documents carry ISO
        // strings; extraction fields mirror the typed engine's Spark
        // functions — dayOfWeek 1=Sunday, week = ISO week) ----------------
        case "$toDate" =>
          toInstant(a(0)).map(i => text(i.toString): JsonNode).getOrElse(NULL)
        case "$year" | "$month" | "$dayOfMonth" | "$hour" | "$minute" |
             "$second" | "$millisecond" | "$dayOfWeek" | "$dayOfYear" | "$week" |
             "$isoWeek" | "$isoDayOfWeek" | "$isoWeekYear" =>
          utc(a(0)) match {
            case None => NULL
            case Some(z) => long(name match {
              case "$year"        => z.getYear.toLong
              case "$month"       => z.getMonthValue.toLong
              case "$dayOfMonth"  => z.getDayOfMonth.toLong
              case "$hour"        => z.getHour.toLong
              case "$minute"      => z.getMinute.toLong
              case "$second"      => z.getSecond.toLong
              case "$millisecond" => (z.getNano / 1000000).toLong
              case "$dayOfWeek"   => (z.getDayOfWeek.getValue % 7 + 1).toLong
              case "$isoDayOfWeek" => z.getDayOfWeek.getValue.toLong // 1 = Monday
              case "$dayOfYear"   => z.getDayOfYear.toLong
              case "$isoWeekYear" =>
                z.get(java.time.temporal.WeekFields.ISO.weekBasedYear).toLong
              case _ => z.get(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear).toLong
            })
          }
        case "$dateToString" =>
          utc(a(0)) match {
            case None => NULL
            case Some(z) => text(java.time.format.DateTimeFormatter
              .ofPattern(graft.mongo.MongoExpr.mongoDateFormat(a(1).textValue))
              .format(z))
          }
        case "$dateAdd" | "$dateSubtract" =>
          utc(a(0)) match {
            case None => NULL
            case Some(z) =>
              val amt = if (name == "$dateSubtract") -a(2).longValue
                        else a(2).longValue
              val z2 = a(1).textValue match {
                case "year"        => z.plusYears(amt)
                case "quarter"     => z.plusMonths(amt * 3)
                case "month"       => z.plusMonths(amt)
                case "week"        => z.plusWeeks(amt)
                case "day"         => z.plusDays(amt)
                case "hour"        => z.plusHours(amt)
                case "minute"      => z.plusMinutes(amt)
                case "second"      => z.plusSeconds(amt)
                case "millisecond" => z.plus(amt, java.time.temporal.ChronoUnit.MILLIS)
                case u => throw new IllegalArgumentException(s"$$dateAdd unit $u")
              }
              text(z2.toInstant.toString)
          }
        case "$dateFromParts" =>
          // out-of-range parts CARRY like Mongo (month 13 -> next January):
          // anchor at Jan 1 of `year` and add each part as an offset
          val parts = args
          if (parts.exists(p => p == null || p.isNull || isMissing(p))) NULL
          else {
            val List(y, mo, d, h, mi, s, ms) = parts.map(_.longValue)
            val z = java.time.ZonedDateTime
              .of(y.toInt, 1, 1, 0, 0, 0, 0, java.time.ZoneOffset.UTC)
              .plusMonths(mo - 1).plusDays(d - 1).plusHours(h)
              .plusMinutes(mi).plusSeconds(s)
              .plus(ms, java.time.temporal.ChronoUnit.MILLIS)
            text(z.toInstant.toString)
          }
        case "$dateToParts" =>
          utc(a(0)) match {
            case None => NULL
            case Some(z) =>
              val out = obj()
              if (a(1).booleanValue) {
                val wf = java.time.temporal.WeekFields.ISO
                out.put("isoWeekYear", z.get(wf.weekBasedYear).toLong)
                out.put("isoWeek", z.get(wf.weekOfWeekBasedYear).toLong)
                out.put("isoDayOfWeek", z.getDayOfWeek.getValue.toLong)
              } else {
                out.put("year", z.getYear.toLong)
                out.put("month", z.getMonthValue.toLong)
                out.put("day", z.getDayOfMonth.toLong)
              }
              out.put("hour", z.getHour.toLong)
              out.put("minute", z.getMinute.toLong)
              out.put("second", z.getSecond.toLong)
              out.put("millisecond", (z.getNano / 1000000).toLong)
              out
          }
        case "$dateDiff" =>
          (utc(a(0)), utc(a(1))) match {
            case (Some(zs), Some(ze)) =>
              val unit = a(2).textValue
              // Sunday-start week buckets (Mongo's default startOfWeek):
              // epoch day 0 is a Thursday -> (epochDay + 4) / 7
              def weekIdx(z: java.time.ZonedDateTime): Long =
                Math.floorDiv(z.toLocalDate.toEpochDay + 4, 7)
              long(unit match {
                case "day" => java.time.temporal.ChronoUnit.DAYS
                  .between(zs.toLocalDate, ze.toLocalDate)
                case "week" => weekIdx(ze) - weekIdx(zs)
                case "hour" => Math.floorDiv(
                  ze.toEpochSecond - zs.toEpochSecond, 3600L)
                case "minute" => Math.floorDiv(
                  ze.toEpochSecond - zs.toEpochSecond, 60L)
                case "second" => ze.toEpochSecond - zs.toEpochSecond
                case "millisecond" =>
                  ze.toInstant.toEpochMilli - zs.toInstant.toEpochMilli
                case "year"   => (ze.getYear - zs.getYear).toLong
                case "quarter" => (ze.getYear - zs.getYear) * 4L +
                  ((ze.getMonthValue - 1) / 3 - (zs.getMonthValue - 1) / 3)
                case "month"  =>
                  (ze.getYear - zs.getYear) * 12L + (ze.getMonthValue - zs.getMonthValue)
                case u => throw new IllegalArgumentException(s"$$dateDiff unit $u")
              })
            case _ => NULL
          }
        case "$dateTrunc" =>
          utc(a(0)) match {
            case None => NULL
            case Some(z) =>
              val t = a(1).textValue match {
                case "year"   => z.withDayOfYear(1).truncatedTo(java.time.temporal.ChronoUnit.DAYS)
                case "month"  => z.withDayOfMonth(1).truncatedTo(java.time.temporal.ChronoUnit.DAYS)
                case "week"   => z.minusDays((z.getDayOfWeek.getValue % 7).toLong)
                  .truncatedTo(java.time.temporal.ChronoUnit.DAYS)
                case "day"    => z.truncatedTo(java.time.temporal.ChronoUnit.DAYS)
                case "hour"   => z.truncatedTo(java.time.temporal.ChronoUnit.HOURS)
                case "minute" => z.truncatedTo(java.time.temporal.ChronoUnit.MINUTES)
                case "second" => z.truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
                case u => throw new IllegalArgumentException(s"$$dateTrunc unit $u")
              }
              text(t.toInstant.toString)
          }

        // ---- regex / string family -------------------------------------
        case "$regexMatch" =>
          val (in, re) = (a(0), a(1))
          if (in.isNull || isMissing(in)) bool(false)
          else bool(regexPattern(re, if (argOps.length > 2) Some(a(2)) else None).matcher(in.textValue).find)
        case "$regexFind" =>
          val (in, re) = (a(0), a(1))
          if (in.isNull || isMissing(in)) NULL
          else {
            val m = regexPattern(re, if (argOps.length > 2) Some(a(2)) else None).matcher(in.textValue)
            if (!m.find) NULL
            else {
              val o = obj()
              o.set[JsonNode]("match", text(m.group))
              // code-point idx, like the typed expression (astral-plane
              // text would drift under a raw char index)
              o.set[JsonNode]("idx",
                long(in.textValue.codePointCount(0, m.start).toLong))
              val caps = arr()
              (1 to m.groupCount).foreach(g =>
                caps.add(if (m.group(g) == null) NULL else text(m.group(g))))
              o.set[JsonNode]("captures", caps)
              o
            }
          }
        case "$regexFindAll" => // every match, Mongo's {match, idx, captures}
          val (in, re) = (a(0), a(1))
          if (in.isNull || isMissing(in)) arr()
          else {
            val m = regexPattern(re, if (argOps.length > 2) Some(a(2)) else None).matcher(in.textValue)
            val out = arr()
            while (m.find) {
              val o = obj()
              o.set[JsonNode]("match", text(m.group))
              o.set[JsonNode]("idx",
                long(in.textValue.codePointCount(0, m.start).toLong))
              val caps = arr()
              (1 to m.groupCount).foreach(g =>
                caps.add(if (m.group(g) == null) NULL else text(m.group(g))))
              o.set[JsonNode]("captures", caps)
              out.add(o)
            }
            out
          }
        case "$replaceAll" | "$replaceOne" => // Mongo: LITERAL find, not regex
          val (in, find, repl) = (a(0), a(1), a(2))
          if (in.isNull || isMissing(in)) NULL
          else if (name == "$replaceAll") text(in.textValue.replace(find.textValue, repl.textValue))
          else {
            val s0 = in.textValue
            val i = s0.indexOf(find.textValue)
            text(if (i < 0) s0
              else s0.substring(0, i) + repl.textValue + s0.substring(i + find.textValue.length))
          }
        case "$trim" | "$ltrim" | "$rtrim" =>
          val in = a(0)
          if (in.isNull || isMissing(in)) NULL
          else {
            val chars: Set[Char] =
              if (args.size > 1) args(1).textValue.toSet else " \t\n\r".toSet
            var str = in.textValue
            if (name != "$rtrim") str = str.dropWhile(chars)
            if (name != "$ltrim") str = str.reverse.dropWhile(chars).reverse
            text(str)
          }
        case "$isArray"  => bool(a(0).isArray)
        case "$isNumber" => bool(a(0).isNumber)

        // ---- set operators (arrays as sets; deterministic Mongo-ordered
        // output for cross-engine replay) ---------------------------------
        case "$setUnion" | "$setIntersection" | "$setDifference" =>
          if (args.exists(x => x.isNull || isMissing(x))) NULL
          else {
            val sets = args.map(_.asScala.toList.distinctBy(canonical))
            val keys = sets.map(_.map(canonical).toSet)
            val kept = name match {
              case "$setUnion"        => sets.flatten.distinctBy(canonical)
              case "$setIntersection" =>
                sets.head.filter(v => keys.tail.forall(_(canonical(v))))
              case _ =>
                sets.head.filterNot(v => keys.tail.exists(_(canonical(v))))
            }
            val out = arr()
            kept.sorted(mongoOrder).foreach(out.add)
            out
          }
        case "$setEquals" => // Mongo ERRORS on non-array operands (unlike
          // union/intersection/difference, which yield null)
          if (!args.forall(_.isArray)) throw new IllegalArgumentException(
            s"$$setEquals: all operands must be arrays, got ${args.map(typeName)}")
          val keys = args.map(_.asScala.map(canonical).toSet)
          bool(keys.forall(_ == keys.head))
        case "$setIsSubset" =>
          if (!args.forall(_.isArray)) throw new IllegalArgumentException(
            s"$$setIsSubset: both operands must be arrays, got ${args.map(typeName)}")
          val (x, y) = (a(0).asScala.map(canonical).toSet, a(1).asScala.map(canonical).toSet)
          bool(x.subsetOf(y))
        case "$allElementsTrue" => bool(a(0).asScala.forall(truthy))
        case "$anyElementTrue"  => bool(a(0).asScala.exists(truthy))

        // ---- more array ops ---------------------------------------------
        case "$indexOfArray" =>
          a(0) match {
            case ar: ArrayNode =>
              long(ar.asScala.toList.indexWhere(deepEq(_, a(1))).toLong)
            case _ => NULL
          }
        case "$sortArray" =>
          a(0) match {
            case ar: ArrayNode =>
              val out = arr()
              val sorted0 = a(1) match {
                case o: ObjectNode => // document sort spec: per-field
                  // direction with the cross-type BSON order
                  val keys = o.properties.asScala.toList.map(e =>
                    (e.getKey.split('.').toList, e.getValue.asInt(1) >= 0))
                  ar.asScala.toList.sortWith { (x, y) =>
                    keys.iterator.map { case (path, asc) =>
                      val c = DynJson.compare(resolve(x, path), resolve(y, path))
                      if (asc) c else -c
                    }.find(_ != 0).exists(_ < 0)
                  }
                case n =>
                  val s0 = ar.asScala.toList.sorted(mongoOrder)
                  if (n.intValue >= 0) s0 else s0.reverse
              }
              sorted0.foreach(out.add)
              out
            case _ => NULL
          }
        case "$firstN" | "$lastN" =>
          a(0) match {
            case ar: ArrayNode =>
              val n = math.max(a(1).intValue, 0)
              val out = arr()
              val xs = ar.asScala.toList
              (if (name == "$firstN") xs.take(n) else xs.takeRight(n)).foreach(out.add)
              out
            case _ => NULL
          }
        case "$median" | "$percentile" => // Mongo 7.0 expression forms:
          // exact linear interpolation over the sorted numeric values —
          // the same definition as the typed engine and the accumulators
          def interp(nums: IndexedSeq[Double], p: Double): Double = {
            val rank = p * (nums.size - 1)
            val lo = math.floor(rank).toInt
            val hi = math.ceil(rank).toInt
            nums(lo) + (nums(hi) - nums(lo)) * (rank - lo)
          }
          a(0) match {
            case ar: ArrayNode =>
              val nums = ar.asScala.toList.filter(_.isNumber)
                .map(_.doubleValue).sorted.toIndexedSeq
              if (nums.isEmpty) NULL
              else if (name == "$median") double(interp(nums, 0.5))
              else a(1) match {
                case ps: ArrayNode =>
                  val out = arr()
                  ps.asScala.foreach(p => out.add(double(interp(nums, p.doubleValue))))
                  out
                case _ => NULL
              }
            case _ => NULL
          }
        case "$maxN" | "$minN" => // nulls ignored; $maxN descending
          a(0) match {
            case ar: ArrayNode =>
              val n = math.max(a(1).intValue, 0)
              val xs = ar.asScala.toList
                .filterNot(x => x.isNull || isMissing(x)).sorted(mongoOrder)
              val out = arr()
              (if (name == "$maxN") xs.reverse.take(n) else xs.take(n)).foreach(out.add)
              out
            case _ => NULL
          }
        case "$zip" =>
          // trailing args: defaults array (or null), useLongestLength flag
          val useLongest = args.last.asBoolean
          val defaultsN = args(args.size - 2)
          val inputs = args.dropRight(2)
          if (inputs.exists(x => x == null || x.isNull || isMissing(x))) NULL
          else {
            val arrays = inputs.map(_.asScala.toList)
            val n = if (useLongest) arrays.map(_.length).max
                    else arrays.map(_.length).min
            val defs: List[JsonNode] =
              if (defaultsN != null && defaultsN.isArray)
                defaultsN.asScala.toList
              else inputs.map(_ => NULL)
            val out = arr()
            (0 until n).foreach { i =>
              val tup = arr()
              arrays.zipWithIndex.foreach { case (xs, j) =>
                tup.add(if (i < xs.length) xs(i)
                        else missingToNull(defs.lift(j).getOrElse(NULL)))
              }
              out.add(tup)
            }
            out
          }

        case other =>
          throw new IllegalArgumentException(
            s"dynamic mode: unsupported expression operator $other " +
              "(supported subset documented in DynExpr; use typed mode for the rest)")
      }
    }

    /** Mongo $toString of a number: integral without decimal point. */
    private def canonicalScalar(n: JsonNode): String =
      if (n.isIntegralNumber) n.longValue.toString
      else if (n.isNumber) n.doubleValue.toString
      else if (n.isBoolean) n.booleanValue.toString
      else n.toString
  }
}
