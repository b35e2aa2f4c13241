package graft.dynamic

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.types.StringType
import org.json4s._

import scala.jdk.CollectionConverters._

/** The DYNAMIC (schemaless) pipeline: the same stage language as
  * [[graft.Pipeline]], but over messages carried as ONE JSON string column
  * (`doc`, plus the optional `key` column), for inputs whose shape is
  * unknowable at plan time — heterogeneously-typed fields, computed keys,
  * arbitrary deep merges (reference Pipeline.java:273 processes any
  * `JsonObject`; the typed engine needs a StructType).
  *
  * Execution model, designed for the 100 TB case:
  *  - Every document-local stage ($addFields, $project, $match, $unwind,
  *    $replaceWith, $redact, …) compiles to a `Msg => Iterator[Msg]` and
  *    consecutive runs FUSE into one `mapPartitions` pass: one JSON parse
  *    and one render per document for the whole run, regardless of how many
  *    stages it contains. No shuffle, no driver involvement, fully
  *    distributed and pipelined with the parquet scan.
  *  - `$group` is the only shuffle: the group key is computed map-side, all
  *    accumulators fuse into ONE [[graft.functions.DynGroupAgg]] with
  *    map-side partial aggregation, so accumulator states — never documents
  *    — cross the wire.
  *
  * Stage dispatch mirrors Pipeline.java:243-273; unrecognized stages are
  * silently ignored (Pipeline.java:265).
  */
object DynPipeline {

  import DynJson._

  /** One message: (key or null, parsed document). */
  type Msg = (String, JsonNode)
  type DocFn = Msg => Iterator[Msg]

  def run(df: DataFrame, pipelineJson: String): DataFrame =
    run(df, org.json4s.jackson.JsonMethods.parse(pipelineJson))

  def run(df: DataFrame, pipeline: JValue): DataFrame = pipeline match {
    case JArray(stages) =>
      var cur = normalize(df)
      var pending = List.newBuilder[DocFn]
      var pendingN = 0
      def flush(): Unit = {
        val fns = pending.result()
        if (fns.nonEmpty) { cur = applyFused(cur, fns); pending = List.newBuilder[DocFn]; pendingN = 0 }
      }
      stages.foreach {
        case JObject(List((name, spec))) =>
          compileDocStage(name, spec) match {
            case Some(fn) => pending += fn; pendingN += 1
            case None =>
              flush()
              cur = applyBarrier(cur, name, spec)
          }
        case other => throw new IllegalArgumentException(s"bad stage: $other")
      }
      flush()
      cur
    case other => throw new IllegalArgumentException(s"pipeline must be an array: $other")
  }

  /** Accept (key, doc) or just (doc); everything else is an error. */
  private def normalize(df: DataFrame): DataFrame =
    if (df.columns.contains("key")) df.select(col("key").cast(StringType), col("doc"))
    else df.select(lit(null).cast(StringType).as("key"), col("doc"))

  private val tuple2Enc = Encoders.tuple(Encoders.STRING, Encoders.STRING)

  /** One mapPartitions pass applying a fused run of document-local stages. */
  private def applyFused(df: DataFrame, fns: List[DocFn]): DataFrame = {
    val composed: DocFn = fns match {
      case single :: Nil => single
      case many =>
        msg => many.foldLeft(Iterator.single(msg))((it, f) => it.flatMap(f))
    }
    val out = df.as(tuple2Enc).mapPartitions { it =>
      it.flatMap { case (k, s) =>
        composed((k, parse(s))).map { case (k2, d2) => (k2, render(d2)) }
      }
    }(tuple2Enc)
    out.toDF("key", "doc")
  }

  // ---- document-local stages --------------------------------------------------

  /** Stages that are per-document (fusable). Returns None for barrier stages. */
  private def compileDocStage(name: String, spec: JValue): Option[DocFn] = name match {
    case "$addFields" | "$set" => Some(addFields(spec))
    case "$project"            => Some(project(spec))
    case "$unset"              => Some(unset(spec))
    case "$replaceWith"        => Some(replaceWith(spec))
    case "$replaceRoot"        => Some(replaceWith(spec \ "newRoot"))
    case "$match"              =>
      val p = DynMatch.compile(spec)
      Some(m => if (p.test(DynExpr.DCtx(m._2, Map.empty))) Iterator.single(m) else Iterator.empty)
    case "$unwind"             => Some(unwind(spec))
    case "$redact"             => Some(redact(spec))
    case "$setKey"             =>
      val op = DynExpr.compile(spec)
      Some { case (_, doc) => Iterator.single((keyString(op.eval(DynExpr.DCtx(doc, Map.empty))), doc)) }
    case "$http"               => Some(http(spec))
    case "$jslt"               => Some(jslt(spec))
    case "$jq"                 => Some(jq(spec))
    case "$trace" | "$backTrace" => Some(Iterator.single(_))
    case "$group" | "$count" | "$bucket" | "$deduplicate" => None
    case _ => Some(Iterator.single(_)) // unrecognized stages pass through (Pipeline.java:265)
  }

  private def keyString(v: JsonNode): String =
    if (v.isTextual) v.textValue else if (isMissing(v)) null else canonical(v)

  /** $addFields deep-merge, reference AddFields.java:37-57 semantics:
    * dotted spec paths create/descend nested objects; an existing value is
    * replaced in place; a NON-OBJECT (incl. null) sitting on a prefix of a
    * new path is replaced by an object (TestAddFields.java:88-106); literal
    * dot-containing keys in the DOCUMENT are never split (the reference's
    * escapeDot round-trip — a tree walk gets this for free). */
  private def addFields(spec: JValue): DocFn = {
    val fields: List[(List[String], DynExpr.DOp)] = spec match {
      case JObject(fs) => fs.map { case (k, v) => (k.split('.').toList, DynExpr.compile(v)) }
      case other => throw new IllegalArgumentException(s"$$addFields: $other")
    }
    msg => {
      val (k, doc0) = msg
      val doc = copy(doc0).asInstanceOf[ObjectNode]
      val ctx = DynExpr.DCtx(doc0, Map.empty) // all expressions see the ORIGINAL doc
      fields.foreach { case (segs, op) =>
        val v = op.eval(ctx)
        setPath(doc, segs, v)
      }
      Iterator.single((k, doc))
    }
  }

  /** Set (or remove, when value is MISSING) a dotted path, replacing
    * non-object intermediates with fresh objects. */
  private def setPath(root: ObjectNode, segs: List[String], value: JsonNode): Unit = {
    var node = root
    var rest = segs
    while (rest.tail.nonEmpty) {
      val seg = rest.head
      node.get(seg) match {
        case o: ObjectNode => node = o
        case _ => // missing or non-object prefix: replace with an object
          val o = obj()
          node.set[JsonNode](seg, o)
          node = o
      }
      rest = rest.tail
    }
    if (isMissing(value)) node.remove(rest.head)
    else node.set[JsonNode](rest.head, copy(value))
  }

  private def removePath(root: JsonNode, segs: List[String]): Unit = (root, segs) match {
    case (o: ObjectNode, seg :: Nil) => o.remove(seg); ()
    case (o: ObjectNode, seg :: rest) =>
      val child = o.get(seg)
      if (child != null) removePath(child, rest)
    case (a: ArrayNode, segs2) => a.asScala.foreach(removePath(_, segs2))
    case _ => ()
  }

  private def getPath(root: JsonNode, segs: List[String]): JsonNode =
    DynExpr.resolve(root, segs)

  private def unset(spec: JValue): DocFn = {
    val paths: List[List[String]] = spec match {
      case JString(p)    => List(p.split('.').toList)
      case JArray(items) => items.map { case JString(p) => p.split('.').toList
                                        case other => throw new IllegalArgumentException(s"$$unset: $other") }
      case other => throw new IllegalArgumentException(s"$$unset: $other")
    }
    msg => {
      val (k, doc0) = msg
      val doc = copy(doc0)
      paths.foreach(removePath(doc, _))
      Iterator.single((k, doc))
    }
  }

  /** $project: inclusion mode if any value is 1/true/computed; _id included
    * by default; dotted paths; exclusion mode mirrors $unset. */
  private def project(spec: JValue): DocFn = {
    val fields = spec match {
      case JObject(fs) => fs
      case other => throw new IllegalArgumentException(s"$$project: $other")
    }
    def isExclude(v: JValue): Boolean = v == JInt(0) || v == JBool(false)
    val inclusionMode = fields.exists { case (k, v) => k != "_id" && !isExclude(v) }
    if (!inclusionMode) unset(JArray(fields.map { case (k, _) => JString(k) }))
    else {
      val idExcluded = fields.exists { case (k, v) => k == "_id" && isExclude(v) }
      val incl: List[(List[String], Option[DynExpr.DOp])] = fields.collect {
        case (k, v) if k != "_id" && !isExclude(v) =>
          val segs = k.split('.').toList
          v match {
            case JInt(_) | JBool(true) => (segs, None) // include as-is
            case expr                  => (segs, Some(DynExpr.compile(expr)))
          }
      }
      msg => {
        val (k, doc0) = msg
        val out = obj()
        if (!idExcluded) {
          val id = doc0.get("_id")
          if (id != null) out.set[JsonNode]("_id", copy(id))
        }
        val ctx = DynExpr.DCtx(doc0, Map.empty)
        incl.foreach {
          case (segs, None) =>
            val v = getPath(doc0, segs)
            if (!isMissing(v)) setPath(out, segs, v)
          case (segs, Some(op)) =>
            val v = op.eval(ctx)
            if (!isMissing(v)) setPath(out, segs, v)
        }
        Iterator.single((k, out))
      }
    }
  }

  /** $replaceWith / $replaceRoot: an OBJECT result replaces the document
    * (key follows result._id when present); any other result leaves the
    * message UNCHANGED — reference ReplaceWith.java:29-36. */
  private def replaceWith(spec: JValue): DocFn = {
    val op = DynExpr.compile(spec)
    msg => {
      val (k, doc) = msg
      op.eval(DynExpr.DCtx(doc, Map.empty)) match {
        case o: ObjectNode =>
          val id = o.get("_id")
          val k2 = if (id != null && id.isTextual) id.textValue else k
          Iterator.single((k2, o))
        case _ => Iterator.single(msg) // non-object: passthrough
      }
    }
  }

  /** $unwind: path form or {path, includeArrayIndex, preserveNullAndEmptyArrays}. */
  private def unwind(spec: JValue): DocFn = {
    val (path, indexField, preserve) = spec match {
      case JString(p) => (p, None, false)
      case o: JObject =>
        val JString(p) = (o \ "path"): @unchecked
        val idx = o \ "includeArrayIndex" match { case JString(f) => Some(f); case _ => None }
        val pres = o \ "preserveNullAndEmptyArrays" == JBool(true)
        (p, idx, pres)
      case other => throw new IllegalArgumentException(s"$$unwind: $other")
    }
    require(path.startsWith("$"), s"$$unwind path must start with $$: $path")
    val segs = path.drop(1).split('.').toList
    msg => {
      val (k, doc) = msg
      getPath(doc, segs) match {
        case a: ArrayNode if a.size > 0 =>
          a.asScala.zipWithIndex.iterator.map { case (el, i) =>
            val d = copy(doc).asInstanceOf[ObjectNode]
            setPath(d, segs, el)
            indexField.foreach(f => setPath(d, f.split('.').toList, long(i.toLong)))
            (k, d: JsonNode)
          }
        case v if isMissing(v) || v.isNull || v.isArray => // empty array lands here too
          if (preserve) {
            val d = copy(doc).asInstanceOf[ObjectNode]
            // Mongo: null stays null; empty array → field removed; missing stays missing
            if (v.isArray) removePath(d, segs)
            indexField.foreach(f => setPath(d, f.split('.').toList, NULL))
            Iterator.single((k, d))
          } else Iterator.empty
        case single => // non-array unwinds to itself (Mongo)
          indexField match {
            case Some(f) =>
              val d = copy(doc).asInstanceOf[ObjectNode]
              setPath(d, f.split('.').toList, NULL)
              Iterator.single((k, d: JsonNode))
            case None => Iterator.single((k, doc))
          }
      }
    }
  }

  /** $redact: evaluate against the root and each nested object; the result
    * must equal $$DESCEND / $$PRUNE / $$KEEP (as the conventional string
    * sentinels). DESCEND recurses into sub-objects (incl. inside arrays). */
  private def redact(spec: JValue): DocFn = {
    val op = DynExpr.compile(spec)
    def decide(o: JsonNode): String =
      op.eval(DynExpr.DCtx(o, Map.empty)) match {
        case s if s.isTextual => s.textValue
        case other => throw new IllegalArgumentException(s"$$redact must yield a sentinel, got $other")
      }
    def walk(o: ObjectNode): Option[JsonNode] = decide(o) match {
      case "KEEP"  => Some(o)
      case "PRUNE" => None
      case "DESCEND" =>
        val out = obj()
        o.fields().asScala.foreach { e =>
          e.getValue match {
            case sub: ObjectNode =>
              walk(sub).foreach(v => out.set[JsonNode](e.getKey, v))
            case a: ArrayNode =>
              val kept = arr()
              a.asScala.foreach {
                case sub: ObjectNode => walk(sub).foreach(kept.add)
                case el              => kept.add(el)
              }
              out.set[JsonNode](e.getKey, kept)
            case el => out.set[JsonNode](e.getKey, el)
          }
        }
        Some(out)
      case other => throw new IllegalArgumentException(s"$$redact sentinel: $other")
    }
    msg => {
      val (k, doc) = msg
      walk(copy(doc).asInstanceOf[ObjectNode]) match {
        case Some(d) => Iterator.single((k, d))
        case None    => Iterator.empty
      }
    }
  }

  /** `$jslt` in dynamic mode: the FULL language via the
    * [[graft.operators.JsltInterp]] tree-walk engine — computed keys,
    * object-for, user `def`s with recursion — running fused inside the same
    * mapPartitions pass as its neighbors (the reference runs the real JSLT
    * engine per message, Jslt.java:18-36). The result must be an object; a
    * string `_id` in it re-keys the message (Script.java:70-72). */
  private def jslt(spec: JValue): DocFn = {
    val src = graft.operators.ScriptStages.scriptSource(spec)
    val f = graft.operators.JsltInterp.compiled(src)
    msg => {
      val r = f(msg._2)
      if (!r.isObject) throw new IllegalArgumentException(
        s"$$jslt must produce an object, got: ${render(r)}")
      val k2 = r.path("_id") match {
        case id if id.isTextual => id.textValue
        case _                  => msg._1
      }
      Iterator.single((k2, r))
    }
  }

  /** `$jq` in dynamic mode: full stream semantics via
    * [[graft.operators.JqInterp]] — `.[]`, `,`, `as`, `reduce`, recursive
    * `def`s (the reference runs jackson-jq, Jq.java:16-33). An empty output
    * stream drops the message (jq `select`); otherwise the first output
    * must be an object and re-keys on its string `_id` like `$jslt`. */
  private def jq(spec: JValue): DocFn = {
    val src = graft.operators.ScriptStages.scriptSource(spec)
    val f = graft.operators.JqInterp.compiled(src)
    msg => f(msg._2) match {
      case Nil => Iterator.empty
      case r :: _ if r.isObject =>
        val k2 = r.path("_id") match {
          case id if id.isTextual => id.textValue
          case _                  => msg._1
        }
        Iterator.single((k2, r))
      case r :: _ => throw new IllegalArgumentException(
        s"$$jq must produce an object, got: ${render(r)}")
    }
  }

  /** `$http` with FULL reference response parsing (Http.java:340-405):
    * dynamic documents are JSON trees, so a JSON response lands in `as` as
    * its parsed value of ANY shape — singleton arrays reduce to their only
    * element, text content types land as strings, other types land no body.
    * `unwind: true` emits one message per response-array element; non-2xx
    * sets `httpError: {statusCode, body}` instead (body parsed when JSON).
    * The I/O runs inside the fused mapPartitions pass with the shared
    * per-executor client ([[graft.operators.HttpIO]]). */
  private def http(spec: JValue): DocFn = {
    import graft.operators.HttpIO
    val as = spec \ "as" match { case JString(s) => Some(s); case _ => None }
    val unwind = (spec \ "unwind") == JBool(true)
    val retries = spec \ "retries" match { case JInt(i) => i.toInt; case _ => 3 }
    val ssl = graft.operators.HttpStage.sslSpec(spec)
    val urlOp = DynExpr.compile(spec \ "url")
    val methodOp = spec \ "method" match {
      case JNothing => None
      case m        => Some(DynExpr.compile(m))
    }
    val headersOp = spec \ "headers" match {
      case JNothing => None
      case h        => Some(DynExpr.compile(h))
    }
    val bodyOp = spec \ "body" match {
      case JNothing => None
      case b        => Some(DynExpr.compile(b))
    }

    msg => {
      val (k, doc0) = msg
      val ctx = DynExpr.DCtx(doc0, Map.empty)
      def withField(field: String, v: JsonNode): JsonNode = {
        val d = copy(doc0).asInstanceOf[ObjectNode]
        d.remove("httpError"); as.foreach(d.remove)
        d.set[JsonNode](field, v)
        d
      }
      def errOut(status: Int, body: JsonNode): Iterator[Msg] = {
        val e = obj()
        e.set[JsonNode]("statusCode", long(status.toLong))
        e.set[JsonNode]("body", missingToNull(body))
        Iterator.single((k, withField("httpError", e)))
      }

      val urlV = urlOp.eval(ctx)
      val methodV = methodOp.map(_.eval(ctx)).getOrElse(text("GET"))
      if (!urlV.isTextual || !methodV.isTextual ||
          !HttpIO.methods.contains(methodV.textValue.toUpperCase))
        errOut(400, MISSING) // invalid url/method (Http.java:111-113)
      else {
        val headers: Seq[(String, String)] = headersOp.map(_.eval(ctx)) match {
          case Some(h: ObjectNode) =>
            h.fields().asScala.flatMap { e =>
              e.getValue match {
                case a: ArrayNode => a.asScala.map(v => e.getKey -> v.asText()).toSeq
                case v            => Seq(e.getKey -> (if (v.isTextual) v.textValue else render(v)))
              }
            }.toSeq
          case _ => Nil
        }
        val bodyStr = bodyOp.map(_.eval(ctx)).map {
          case v if v.isTextual => v.textValue
          case v                => render(v)
        }
        HttpIO.request(urlV.textValue, methodV.textValue.toUpperCase, headers,
          bodyStr.orNull, retries, ssl) match {
          case Right(r) if r.status < 300 =>
            val parsed: JsonNode =
              if (r.body == null || r.body.isEmpty) MISSING
              else if (HttpIO.isJson(r.contentType)) {
                val n = parse(r.body)
                if (n.isArray && n.size == 1) n.get(0) else n // singleton reduction
              } else if (HttpIO.isText(r.contentType)) text(r.body)
              else MISSING // opaque content types carry no body (Http.java:364-366)
            as match {
              case None => Iterator.single((k, doc0))
              case Some(field) =>
                if (unwind && parsed.isArray)
                  parsed.asInstanceOf[ArrayNode].asScala.iterator
                    .map(el => (k, withField(field, el)))
                else if (isMissing(parsed)) Iterator.single((k, doc0))
                else Iterator.single((k, withField(field, parsed)))
            }
          case Right(r) =>
            val body: JsonNode =
              if (r.body == null || r.body.isEmpty) NULL
              else if (HttpIO.isJson(r.contentType)) parse(r.body)
              else text(r.body)
            errOut(r.status, body)
          case Left(m) => errOut(0, text(m))
        }
      }
    }
  }

  // ---- barrier stages ---------------------------------------------------------

  private def applyBarrier(df: DataFrame, name: String, spec: JValue): DataFrame = name match {
    case "$group"       => group(df, spec)
    case "$bucket"      => group(df, graft.Stages.bucketToGroup(spec))
    case "$count"       =>
      val JString(field) = spec: @unchecked
      df.agg(count(lit(1)).as("__n")).select(
        lit(null).cast(StringType).as("key"),
        concat(lit(s"""{"$field":"""), col("__n").cast(StringType), lit("}")).as("doc"))
    case "$deduplicate" => deduplicate(df, spec)
    case other => throw new IllegalArgumentException(s"dynamic mode: unsupported stage $other")
  }

  /** $group: map-side canonical key extraction, ONE fused DynGroupAgg for
    * every accumulator (partial aggregation before the single shuffle),
    * then a per-group document assembly. Output key = canonical _id. */
  private def group(df: DataFrame, spec: JValue): DataFrame = {
    val (idSpec, accSpec) = spec match {
      case JObject(fs) =>
        val id = fs.collectFirst { case ("_id", v) => v }
          .getOrElse(throw new IllegalArgumentException("$group needs _id"))
        (id, JObject(fs.filterNot(_._1 == "_id")))
      case other => throw new IllegalArgumentException(s"$$group: $other")
    }
    val idOp = DynExpr.compile(idSpec)
    val keyed = df.as(tuple2Enc).mapPartitions { it =>
      it.map { case (_, s) =>
        val doc = parse(s)
        (canonical(idOp.eval(DynExpr.DCtx(doc, Map.empty))), s)
      }
    }(tuple2Enc).toDF("__gkey", "doc")

    val accJson = org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(accSpec))
    val aggCol: Column = ColumnBridge.column(
      graft.functions.DynGroupAgg(ColumnBridge.expression(col("doc")), accJson)
        .toAggregateExpression())
    val agged = keyed.groupBy(col("__gkey")).agg(aggCol.as("__aggs"))

    agged.select(col("__gkey"), col("__aggs")).as(tuple2Enc).mapPartitions { it =>
      it.map { case (gkey, aggs) =>
        val out = obj()
        out.set[JsonNode]("_id", parse(gkey))
        parse(aggs).asInstanceOf[ObjectNode].fields().asScala
          .foreach(e => out.set[JsonNode](e.getKey, e.getValue))
        (gkey, render(out))
      }
    }(tuple2Enc).toDF("key", "doc")
  }

  /** $deduplicate on an expression (canonical Mongo equality): first doc per
    * key wins within a partition; cross-partition winner is arbitrary, like
    * the reference's cache race (Deduplicate.java). */
  private def deduplicate(df: DataFrame, spec: JValue): DataFrame = {
    val exprSpec = spec match {
      case JObject(fs) => fs.collectFirst { case ("expression", v) => v }.getOrElse(JString("$_id"))
      case other       => other
    }
    val op = DynExpr.compile(exprSpec)
    val tuple3Enc = Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.STRING)
    df.as(tuple2Enc).mapPartitions { it =>
      it.map { case (k, s) =>
        val doc = parse(s)
        (canonical(op.eval(DynExpr.DCtx(doc, Map.empty))), k, s)
      }
    }(tuple3Enc).toDF("__dkey", "key", "doc")
      .dropDuplicates("__dkey")
      .select(col("key"), col("doc"))
  }
}
