package graft.operators

import graft.mongo.{ExprCtx, MongoExpr}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._

/** `$http` (Http.java:86-548, SURVEY.md §2.7): per-message HTTP enrichment.
  *
  * Spark-first split: `url` / `method` / `headers` / `body` are compiled to
  * Catalyst columns and evaluated inside codegen; only the I/O itself runs in
  * `mapPartitions` with one shared `java.net.http.HttpClient` per executor.
  *
  * Response parsing (Http.java:358-375): a JSON content-type body is
  * normalized — a singleton array reduces to its only element — and lands in
  * `as` as its canonical JSON string; declare `responseSchema` (a Spark DDL
  * string) to get a TYPED `as` column via `from_json`. Full shape-preserving
  * parsing with no schema lives in the DYNAMIC mode's `$http`
  * ([[graft.dynamic.DynPipeline]]), where documents are JSON trees anyway.
  *
  * Deviations (documented): retries are bounded (`retries`, default 3, 1 s
  * backoff) instead of infinite. `sslContext: {keyStore, password}` loads a
  * PKCS#12 client certificate with mtime hot reload
  * ([[HttpIO.clientFor]], Http.java:183-198/254-277).
  *
  * Error semantics match the reference: non-2xx → `httpError
  * {statusCode, body}` on the message (Http.java:131-141); invalid
  * url/method → `httpError {statusCode: 400}`; `unwind: true` + a JSON-array
  * response emits one message per element, empty array → no messages
  * (Http.java:506-545).
  */
object HttpStage {

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _          => None
  }

  /** `sslContext: {keyStore, password}` (shared with the dynamic stage). */
  private[graft] def sslSpec(spec: JValue): Option[HttpIO.SslSpec] =
    (spec \ "sslContext") match {
      case JNothing => None
      case s =>
        (str(s \ "keyStore"), str(s \ "password")) match {
          case (Some(ks), Some(pw)) => Some(HttpIO.SslSpec(ks, pw))
          case _ => throw new IllegalArgumentException(
            "$http sslContext needs string keyStore and password")
        }
    }

  def apply(df: DataFrame, spec: JValue)(implicit ctx: ExprCtx): DataFrame = {
    import MongoExpr.{compile => cexpr}
    val as = str(spec \ "as").getOrElse("result")
    val unwind = (spec \ "unwind") == JBool(true)
    val retries = (spec \ "retries") match {
      case JInt(i) => i.toInt
      case _       => 3
    }
    val ssl = HttpStage.sslSpec(spec)
    val urlCol = cexpr(spec \ "url").cast(StringType)
    val methodCol = (spec \ "method") match {
      case JNothing => lit("GET")
      case m        => cexpr(m).cast(StringType)
    }
    val headersCol = (spec \ "headers") match {
      case JNothing => lit(null).cast(StringType)
      case h        => to_json(cexpr(h))
    }
    val bodyCol = (spec \ "body") match {
      case JNothing => lit(null).cast(StringType)
      case b        => to_json(cexpr(b)) // object/array -> JSON (Http.java:468-474)
    }

    // A second $http in the same pipeline overwrites `as`/`httpError` on the
    // message (the reference replaces the fields, Http.java:131-141) — drop
    // pre-existing columns so the output schema never holds duplicates. The
    // expression columns above were compiled against the ORIGINAL df, so a
    // body/url referencing the previous stage's result still resolves.
    val base0 = df.drop(as, "httpError")
    val prepared = df
      .withColumn("__url", urlCol).withColumn("__method", methodCol)
      .withColumn("__headers", headersCol).withColumn("__body", bodyCol)
      .drop(as, "httpError")
    val inSchema = prepared.schema
    val outSchema = StructType(base0.schema.fields ++ Array(
      StructField(as, StringType, nullable = true),
      StructField("httpError", StructType(Seq(
        StructField("statusCode", IntegerType),
        StructField("body", StringType))), nullable = true)))
    val keepIdx = base0.schema.fieldNames.map(inSchema.fieldIndex).toIndexedSeq

    val out = prepared.mapPartitions { rows =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      rows.flatMap { row =>
        val base = keepIdx.map(row.get)
        def emit(result: String, err: Row): Seq[Row] =
          if (unwind && err == null && result != null && result.trim.startsWith("[")) {
            // JSON-array response -> one message per element (Http.java:523-545)
            val node = mapper.readTree(result)
            (0 until node.size()).map { i =>
              val e = node.get(i)
              val s = if (e.isTextual) e.asText() else mapper.writeValueAsString(e)
              Row.fromSeq(base :+ s :+ null)
            }
          } else Seq(Row.fromSeq(base :+ result :+ err))

        val url = row.getAs[String]("__url")
        val method = Option(row.getAs[String]("__method")).map(_.toUpperCase)
        if (url == null || method.isEmpty || !HttpIO.methods.contains(method.get))
          emit(null, Row(400, null)) // invalid url/method (Http.java:111-113)
        else {
          val resp = HttpIO.request(url, method.get,
            parseHeaders(row.getAs[String]("__headers"), mapper),
            row.getAs[String]("__body"), retries, ssl)
          resp match {
            case Right(r) if r.status < 300 =>
              emit(normalize(r, mapper), null)
            case Right(r) =>
              emit(null, Row(r.status, if (r.body == null || r.body.isEmpty) null else r.body))
            case Left(msg) => emit(null, Row(0, msg))
          }
        }
      }
    }(Encoders.row(outSchema))
    // responseSchema: land a TYPED `as` column (Spark DDL, e.g.
    // "STRUCT<resource: STRING>" or "ARRAY<STRUCT<a: BIGINT>>")
    str(spec \ "responseSchema") match {
      case Some(ddl) => out.withColumn(as, from_json(col(as), ddl, Map.empty[String, String]))
      case None      => out
    }
  }

  /** JSON body normalization (Http.java:358-375): singleton array → its only
    * element, rendered canonically; non-JSON content types pass through. */
  private def normalize(r: HttpIO.Resp,
      mapper: com.fasterxml.jackson.databind.ObjectMapper): String =
    if (r.body == null || !HttpIO.isJson(r.contentType)) r.body
    else {
      val t = r.body.trim
      if (!t.startsWith("[")) r.body
      else {
        val node = mapper.readTree(t)
        if (node.size == 1) {
          val e = node.get(0)
          if (e.isTextual) e.asText() else mapper.writeValueAsString(e)
        } else r.body
      }
    }

  /** Header spec JSON -> (name, value) pairs, multi-valued arrays expanded
    * (Http.java:200-212). */
  private def parseHeaders(headersJson: String,
      mapper: com.fasterxml.jackson.databind.ObjectMapper): Seq[(String, String)] =
    if (headersJson == null) Nil
    else {
      val node = mapper.readTree(headersJson)
      val out = Seq.newBuilder[(String, String)]
      node.fieldNames().forEachRemaining { k =>
        val v = node.get(k)
        if (v.isArray) (0 until v.size()).foreach(i => out += (k -> v.get(i).asText()))
        else out += (k -> (if (v.isTextual) v.asText() else v.toString))
      }
      out.result()
    }
}
