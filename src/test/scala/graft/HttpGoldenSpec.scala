package graft

import com.fasterxml.jackson.databind.JsonNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.dynamic.{DynJson, DynPipeline}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** The reference's COMPLETE `$http` golden corpus, http1..http9
  * (/root/reference/src/test/resources/http1..9, TestHttp.java:82-141),
  * replayed through the DYNAMIC pipeline's `$http` — the mode with full
  * response parsing, so expected outputs compare as JSON trees exactly like
  * the reference's message assertions.
  *
  * Server shapes mirror the reference harness: GET resources serve JSON
  * files; POST endpoints echo the request body with the content type named
  * by the `desired-content-type` request header.
  */
class HttpGoldenSpec extends SparkSpec {
  import spark.implicits._

  private def node(s: String): JsonNode = DynJson.parse(s)

  /** (resources served under /case/..., expected response content-type echo) */
  private def withServer(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    def reply(ex: HttpExchange, status: Int, body: String, ct: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", ct)
      ex.sendResponseHeaders(status, if (b.length == 0) -1 else b.length)
      if (b.length > 0) ex.getResponseBody.write(b)
      ex.close()
    }
    val resources = Map(
      // http1/http4: one object per resource
      "/http1/resource1.json" -> """{"resource": "resource1"}""",
      "/http1/resource2.json" -> """{"resource": "resource2"}""",
      "/http4/resource1.json" -> """{"resource": "resource1"}""",
      "/http4/resource2.json" -> """{"resource": "resource2"}""",
      // http2/http3: two-element arrays
      "/http2/resource1.json" -> """[{"resource": "resource1"}, {"resource": "resource2"}]""",
      "/http2/resource2.json" -> """[{"resource": "resource3"}, {"resource": "resource4"}]""",
      "/http3/resource1.json" -> """[{"resource": "resource1"}, {"resource": "resource2"}]""",
      "/http3/resource2.json" -> """[{"resource": "resource3"}, {"resource": "resource4"}]""")
    resources.foreach { case (path, body) =>
      server.createContext(path, (ex: HttpExchange) =>
        reply(ex, 200, body, "application/json"))
    }
    // http5: 404 with no body
    server.createContext("/http5", (ex: HttpExchange) => {
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    // http6..http9: echo the body as the desired content type
    Seq("/http6", "/http7", "/http8", "/http9").foreach { p =>
      server.createContext(p, (ex: HttpExchange) => {
        val in = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val ct = Option(ex.getRequestHeaders.getFirst("desired-content-type"))
          .getOrElse("application/json")
        reply(ex, 200, in, ct)
      })
    }
    server.start()
    try f(server.getAddress.getPort) finally server.stop(0)
  }

  private def run(port: Int, inputs: Seq[String], pipeline: String): Set[JsonNode] = {
    val df = inputs.toDF("doc")
    DynPipeline.run(df, pipeline.replace("PORT", port.toString))
      .select("doc").collect().map(r => DynJson.parse(r.getString(0))).toSet
  }

  private val getInputs = Seq(
    """{"_id": "message1", "resource": "/resource1.json"}""",
    """{"_id": "message2", "resource": "/resource2.json"}""")

  private def getPipeline(dir: String, unwind: Boolean) =
    s"""[{"$$http": {
          "url": {"$$concat": ["http://127.0.0.1:PORT/$dir", "$$resource"]},
          "method": "GET", "as": "result", "unwind": $unwind, "retries": 0}}]"""

  test("http1: GET object resources, unwind -> one message each") {
    withServer { port =>
      assert(run(port, getInputs, getPipeline("http1", unwind = true)) == Set(
        node("""{"_id":"message1","resource":"/resource1.json","result":{"resource":"resource1"}}"""),
        node("""{"_id":"message2","resource":"/resource2.json","result":{"resource":"resource2"}}""")))
    }
  }

  test("http2: GET array resources, unwind -> one message per element") {
    withServer { port =>
      assert(run(port, getInputs, getPipeline("http2", unwind = true)) == Set(
        node("""{"_id":"message1","resource":"/resource1.json","result":{"resource":"resource1"}}"""),
        node("""{"_id":"message1","resource":"/resource1.json","result":{"resource":"resource2"}}"""),
        node("""{"_id":"message2","resource":"/resource2.json","result":{"resource":"resource3"}}"""),
        node("""{"_id":"message2","resource":"/resource2.json","result":{"resource":"resource4"}}""")))
    }
  }

  test("http3: GET array resources, no unwind -> result is the array") {
    withServer { port =>
      assert(run(port, getInputs, getPipeline("http3", unwind = false)) == Set(
        node("""{"_id":"message1","resource":"/resource1.json",
                "result":[{"resource":"resource1"},{"resource":"resource2"}]}"""),
        node("""{"_id":"message2","resource":"/resource2.json",
                "result":[{"resource":"resource3"},{"resource":"resource4"}]}""")))
    }
  }

  test("http4: GET object resources, no unwind -> result is the object") {
    withServer { port =>
      assert(run(port, getInputs, getPipeline("http4", unwind = false)) == Set(
        node("""{"_id":"message1","resource":"/resource1.json","result":{"resource":"resource1"}}"""),
        node("""{"_id":"message2","resource":"/resource2.json","result":{"resource":"resource2"}}""")))
    }
  }

  test("http5: 404 with empty body -> httpError {statusCode, body: null}") {
    withServer { port =>
      assert(run(port,
        Seq("""{"_id": "message1", "resource": "/not_found.json"}"""),
        getPipeline("http5", unwind = true)) == Set(
        node("""{"_id":"message1","resource":"/not_found.json",
                "httpError":{"statusCode":404,"body":null}}""")))
    }
  }

  test("http6/http7: POST text body, text response -> result is the string") {
    withServer { port =>
      // http6: content type text/plain; http7: bare "text" (prefix match)
      Seq("text/plain" -> "http6", "text" -> "http7").foreach { case (ct, dir) =>
        assert(run(port, Seq("""{"_id": "message"}"""),
          s"""[{"$$http": {"url": "http://127.0.0.1:PORT/$dir",
                "method": "POST",
                "headers": {"desired-content-type": "$ct", "content-type": "$ct"},
                "body": "test", "as": "result", "retries": 0}}]""") == Set(
          node("""{"_id":"message","result":"test"}""")), dir)
      }
    }
  }

  test("http8/http9: POST json body, json response -> result is the object") {
    withServer { port =>
      Seq("http8", "http9").foreach { dir =>
        assert(run(port, Seq("""{"_id": "message"}"""),
          s"""[{"$$http": {"url": "http://127.0.0.1:PORT/$dir",
                "method": "POST",
                "headers": {"desired-content-type": "application/json"},
                "body": {"test": "test"}, "as": "result", "retries": 0}}]""") == Set(
          node("""{"_id":"message","result":{"test":"test"}}""")), dir)
      }
    }
  }

  test("typed $http: responseSchema lands a typed struct; singleton array reduces") {
    withServer { port =>
      val df = Seq(("m1", "/resource1.json")).toDF("_id", "resource")
      val out = pipeline.run(df,
        s"""[{"$$http": {"url": {"$$concat":
              ["http://127.0.0.1:$port/http1", "$$resource"]},
              "as": "result", "retries": 0,
              "responseSchema": "STRUCT<resource: STRING>"}}]""")
      assert(out.select("result.resource").head().getString(0) == "resource1")
    }
  }
}
