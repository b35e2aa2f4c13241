package graft.operators

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Deterministic in-JVM echo endpoint backing the `q_http` driver oracle
  * (reference golden corpus: /root/reference/src/test/resources/http1..9;
  * this endpoint gives `$http` a DuckDB-checkable leg the static corpus
  * cannot).
  *
  * POST /calc with `{"key": K, "name": N}` returns
  * `{"key": K, "upper": upper(N), "rev": reverse(N), "len": utf8len(N)}` —
  * every response field is recomputable in ANSI SQL from the request row,
  * so the driver's DuckDB compare oracle-checks a LIVE `$http` round-trip
  * (local mode only: executor threads share the JVM with this server).
  *
  * Started lazily on first use; daemon lifetime (dies with the JVM).
  */
object EchoHttp {
  /** The JDK server's internal "HTTP-Dispatcher" and "server-timer" threads
    * inherit daemon status from the CREATING thread — created directly they
    * are non-daemon and keep the Verify/Bench JVM alive after main returns
    * (observed: jstack shows HTTP-Dispatcher blocking DestroyJavaVM). So
    * create + start inside a short-lived daemon thread and join it.
    */
  lazy val port: Int = {
    var p = 0
    val boot = new Thread(() => p = startServer(), "echo-http-boot")
    boot.setDaemon(true)
    boot.start()
    boot.join()
    require(p > 0, "EchoHttp failed to start")
    p
  }

  private def startServer(): Int = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(
      8,
      (r: Runnable) => {
        val t = new Thread(r, "echo-http")
        t.setDaemon(true)
        t
      }))
    server.createContext("/calc", (ex: HttpExchange) => {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val in = mapper.readTree(ex.getRequestBody.readAllBytes())
      val name = in.get("name").asText
      val out = mapper.createObjectNode()
      out.put("key", in.get("key").asLong)
      out.put("upper", name.toUpperCase)
      out.put("rev", new StringBuilder(name).reverse.toString)
      out.put("len", name.getBytes(StandardCharsets.UTF_8).length)
      val b = mapper.writeValueAsBytes(out)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    server.getAddress.getPort
  }
}
