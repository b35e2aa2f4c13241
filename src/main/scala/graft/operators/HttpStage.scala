package graft.operators

import graft.mongo.{ExprCtx, MongoExpr}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** `$http` (Http.java:86-548, SURVEY.md §2.7): per-message HTTP enrichment.
  *
  * Spark-first split: `url` / `method` / `headers` / `body` are compiled to
  * Catalyst columns and evaluated inside codegen; only the I/O itself runs in
  * `mapPartitions` with one shared `java.net.http.HttpClient` per executor.
  *
  * Deviations (documented): the `as` field receives the raw response body as
  * a STRING column (callers parse with `from_json`; Spark is schema-first so
  * auto-parsing to a dynamic document column is not representable); retries
  * are bounded (`retries`, default 3, 1 s backoff) instead of infinite;
  * `sslContext` client certs are not supported.
  *
  * Error semantics match the reference: non-2xx → `httpError
  * {statusCode, body}` on the message (Http.java:131-141); invalid
  * url/method → `httpError {statusCode: 400}`; `unwind: true` + a JSON-array
  * response emits one message per element, empty array → no messages
  * (Http.java:506-545).
  */
object HttpStage {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _          => None
  }

  def apply(df: DataFrame, spec: JValue)(implicit ctx: ExprCtx): DataFrame = {
    import MongoExpr.{compile => cexpr}
    val as = str(spec \ "as").getOrElse("result")
    val unwind = (spec \ "unwind") == JBool(true)
    val retries = (spec \ "retries") match {
      case JInt(i) => i.toInt
      case _       => 3
    }
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
        if (url == null || method.isEmpty ||
          !Set("GET", "POST", "PUT", "DELETE", "PATCH", "HEAD").contains(method.get))
          emit(null, Row(400, null)) // invalid url/method (Http.java:111-113)
        else {
          val resp = request(url, method.get, row.getAs[String]("__headers"),
            row.getAs[String]("__body"), retries, mapper)
          resp match {
            case Right((status, body)) if status < 300 => emit(body, null)
            case Right((status, body))                 => emit(null, Row(status, body))
            case Left(msg)                             => emit(null, Row(0, msg))
          }
        }
      }
    }(Encoders.row(outSchema))
    out
  }

  private def request(url: String, method: String, headersJson: String,
      body: String, retries: Int,
      mapper: com.fasterxml.jackson.databind.ObjectMapper)
      : Either[String, (Int, String)] = {
    var attempt = 0
    var last: Either[String, (Int, String)] = Left("no attempt")
    while (attempt <= retries) {
      try {
        val b = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofSeconds(30))
        if (headersJson != null) {
          val node = mapper.readTree(headersJson)
          node.fieldNames().forEachRemaining { k =>
            val v = node.get(k)
            if (v.isArray) (0 until v.size()).foreach(i =>
              b.header(k, v.get(i).asText())) // multi-valued (Http.java:200-212)
            else b.header(k, if (v.isTextual) v.asText() else v.toString)
          }
        }
        val publisher =
          if (body == null) HttpRequest.BodyPublishers.noBody()
          else HttpRequest.BodyPublishers.ofString(body)
        if (body != null && headersJson == null)
          b.header("Content-Type", "application/json")
        val req = b.method(method, publisher).build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        return Right((resp.statusCode(), resp.body()))
      } catch {
        case e: Exception =>
          last = Left(e.toString) // getMessage can be null (e.g. ConnectException)
          attempt += 1
          if (attempt <= retries) Thread.sleep(1000L * attempt)
      }
    }
    last
  }
}
