package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.functions._

/** `$http` golden-style tests mirroring the reference's http1..http9 corpus
  * (GET accumulate/unwind, POST json, 404 -> httpError). */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    def reply(ex: HttpExchange, status: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(status, b.length)
      ex.getResponseBody.write(b); ex.close()
    }
    server.createContext("/ok", (ex: HttpExchange) => reply(ex, 200, """{"x":1}"""))
    server.createContext("/arr", (ex: HttpExchange) =>
      reply(ex, 200, """[{"a":1},{"a":2}]"""))
    server.createContext("/empty", (ex: HttpExchange) => reply(ex, 200, "[]"))
    server.createContext("/missing", (ex: HttpExchange) => reply(ex, 404, "nope"))
    server.createContext("/echo", (ex: HttpExchange) => {
      val in = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      reply(ex, 200, in)
    })
    server.start()
    try f(server.getAddress.getPort) finally server.stop(0)
  }

  test("$http GET puts the body in `as`; 404 -> httpError (http1/http5)") {
    withServer { port =>
      val df = Seq(("0", "ok"), ("1", "missing")).toDF("_id", "resource")
      val out = pipeline.run(df,
        s"""[{"$$http": {"url": {"$$concat":
              ["http://127.0.0.1:$port/", "$$resource"]},
              "as": "result", "retries": 0}}]""")
      val okRow = out.filter($"_id" === "0").head()
      assert(okRow.getAs[String]("result") == """{"x":1}""")
      assert(okRow.getAs[Any]("httpError") == null)
      val err = out.filter($"_id" === "1").select("httpError.statusCode",
        "httpError.body").head()
      assert(err.getInt(0) == 404 && err.getString(1) == "nope")
    }
  }

  test("two $http stages in one pipeline: second overwrites as/httpError (no dup columns)") {
    withServer { port =>
      val df = Seq(("0", "missing")).toDF("_id", "resource")
      val out = pipeline.run(df,
        s"""[{"$$http": {"url": "http://127.0.0.1:$port/missing",
              "as": "result", "retries": 0}},
             {"$$http": {"url": "http://127.0.0.1:$port/ok",
              "as": "result", "retries": 0}}]""")
      // exactly ONE result and ONE httpError column survive
      assert(out.columns.count(_ == "result") == 1)
      assert(out.columns.count(_ == "httpError") == 1)
      val row = out.head()
      assert(row.getAs[String]("result") == """{"x":1}""") // 2nd stage's body
      assert(row.getAs[Any]("httpError") == null) // 2nd stage cleared the 404
    }
  }

  test("$http unwind emits one message per array element, none for empty (http GET unwind)") {
    withServer { port =>
      val df = Seq(("0", "arr"), ("1", "empty")).toDF("_id", "resource")
      val out = pipeline.run(df,
        s"""[{"$$http": {"url": {"$$concat":
              ["http://127.0.0.1:$port/", "$$resource"]},
              "as": "result", "unwind": true, "retries": 0}}]""")
      assert(out.count() == 2) // 2 elements from /arr, 0 from /empty
      val results = out.select("result").collect().map(_.getString(0)).sorted
      assert(results.toSeq == Seq("""{"a":1}""", """{"a":2}"""))
    }
  }

  test("$http POST sends the JSON body (http POST json)") {
    withServer { port =>
      val df = Seq(("0", 7L)).toDF("_id", "v")
      val out = pipeline.run(df,
        s"""[{"$$http": {"url": "http://127.0.0.1:$port/echo",
              "method": "POST", "body": {"n": "$$v"}, "as": "result",
              "retries": 0}}]""")
      assert(out.head().getAs[String]("result") == """{"n":7}""")
    }
  }

  test("$http recovers from transient failures within bounded retries (http5Recover)") {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/flaky", (ex: HttpExchange) => {
      val n = attempts.incrementAndGet()
      val (status, body) = if (n <= 1) (503, "down") else (200, """{"up":true}""")
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    server.start()
    try {
      val df = Seq(("0", "x")).toDF("_id", "r")
      // status>=300 is an httpError (no retry, like the reference: only
      // TRANSPORT errors retry) — so first call lands 503 as httpError
      val out = pipeline.run(df,
        s"""[{"$$http": {"url": "http://127.0.0.1:${server.getAddress.getPort}/flaky",
              "as": "result", "retries": 0}}]""")
      assert(out.select("httpError.statusCode").head().getInt(0) == 503)
      // subsequent pipeline (n=3) gets the recovered body
      val out2 = pipeline.run(df,
        s"""[{"$$http": {"url": "http://127.0.0.1:${server.getAddress.getPort}/flaky",
              "as": "result", "retries": 0}}]""")
      assert(out2.select("result").head().getString(0) == """{"up":true}""")
    } finally server.stop(0)
  }

  test("$http transport failure after bounded retries -> httpError statusCode 0") {
    val df = Seq(("0", "x")).toDF("_id", "r")
    // closed port: connection refused, 1 retry then error row (vs the
    // reference's retry-forever — documented deviation)
    val out = pipeline.run(df,
      """[{"$http": {"url": "http://127.0.0.1:1/none", "as": "result",
            "retries": 1}}]""")
    val e = out.select("httpError.statusCode", "httpError.body").head()
    assert(e.getInt(0) == 0 && e.getString(1) != null)
  }

  test("$http invalid method -> httpError 400 (Http.java:111-113)") {
    withServer { port =>
      val df = Seq(("0", "BOGUS")).toDF("_id", "m")
      val out = pipeline.run(df,
        s"""[{"$$http": {"url": "http://127.0.0.1:$port/ok", "method": "$$m",
              "as": "result", "retries": 0}}]""")
      assert(out.select("httpError.statusCode").head().getInt(0) == 400)
    }
  }

  test("$http sslContext loads a PKCS#12 client cert and hot-reloads on rotation") {
    import graft.operators.HttpIO
    val dir = java.nio.file.Files.createTempDirectory("graft_ssl")
    val ks = dir.resolve("client.p12").toString
    def genKeystore(): Unit = {
      val rc = new ProcessBuilder("keytool", "-genkeypair", "-alias", "c",
        "-keyalg", "RSA", "-keysize", "2048", "-validity", "1",
        "-dname", "CN=graft-test", "-keystore", ks, "-storetype", "PKCS12",
        "-storepass", "changeit", "-keypass", "changeit")
        .redirectErrorStream(true).start().waitFor()
      assert(rc == 0, s"keytool failed: $rc")
    }
    genKeystore()
    val spec = Some(HttpIO.SslSpec(ks, "changeit"))
    val c1 = HttpIO.clientFor(spec)
    assert(c1.sslContext() != null && (c1 ne HttpIO.clientFor(None)))
    assert(HttpIO.clientFor(spec) eq c1) // cached while the file is unchanged
    // rotate the certificate: same path, newer mtime -> NEW client
    Thread.sleep(1100) // mtime granularity
    java.nio.file.Files.delete(java.nio.file.Paths.get(ks))
    genKeystore()
    val c2 = HttpIO.clientFor(spec)
    assert(c2 ne c1, "rotated keystore must rebuild the client")
    // bad spec shapes fail fast at stage build
    val e = intercept[IllegalArgumentException] {
      pipeline.run(Seq(("0", 1L)).toDF("_id", "v"),
        """[{"$http": {"url": "http://x/", "sslContext": {"keyStore": "k"}}}]""")
    }
    assert(e.getMessage.contains("password"))
  }
}
