package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Shared per-executor HTTP transport for the typed ([[HttpStage]]) and
  * dynamic ([[graft.dynamic.DynPipeline]]) `$http` stages: one
  * `java.net.http.HttpClient` per JVM, bounded retries on TRANSPORT errors
  * only (non-2xx statuses are `httpError` data, not retries —
  * Http.java:131-141). */
object HttpIO {

  @transient lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  /** `sslContext: {keyStore, password}` — a PKCS#12 client-certificate
    * store (Http.java:183-198). */
  final case class SslSpec(keyStore: String, password: String)

  // client per ssl spec, remembering the keystore mtime it was built from:
  // a rotated certificate file is picked up on the next request without a
  // restart (the reference's hot reload, Http.java:254-277)
  private val sslClients =
    scala.collection.concurrent.TrieMap.empty[SslSpec, (HttpClient, Long)]

  def clientFor(ssl: Option[SslSpec]): HttpClient = ssl match {
    case None => client
    case Some(s) =>
      val mtime = new java.io.File(s.keyStore).lastModified
      sslClients.get(s) match {
        case Some((c, loadedM)) if loadedM >= mtime => c
        case _ =>
          val c = newSslClient(s)
          sslClients(s) = (c, mtime)
          c
      }
  }

  private def newSslClient(s: SslSpec): HttpClient = {
    val ks = java.security.KeyStore.getInstance("pkcs12")
    val in = new java.io.FileInputStream(s.keyStore)
    try ks.load(in, s.password.toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, s.password.toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLSv1.3")
    ctx.init(kmf.getKeyManagers, null, null) // default trust managers
    HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .connectTimeout(Duration.ofSeconds(10))
      .sslContext(ctx)
      .build()
  }

  final case class Resp(status: Int, contentType: Option[String], body: String)

  val methods: Set[String] = Set("GET", "POST", "PUT", "DELETE", "PATCH", "HEAD")

  def isJson(ct: Option[String]): Boolean =
    ct.exists(t => t.startsWith("application/json") || t.endsWith("+json"))

  // "text" with no subtype counts (reference TEXT prefix match, asserted by
  // golden case http7)
  def isText(ct: Option[String]): Boolean =
    ct.exists(t => t.startsWith("text") ||
      Set("application/xml", "application/javascript").exists(t.startsWith))

  /** One request with bounded retries; headers as (name, value) pairs. */
  def request(url: String, method: String, headers: Seq[(String, String)],
      body: String, retries: Int,
      ssl: Option[SslSpec] = None): Either[String, Resp] = {
    var attempt = 0
    var last: Either[String, Resp] = Left("no attempt")
    while (attempt <= retries) {
      try {
        val b = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofSeconds(30))
        headers.foreach { case (k, v) => b.header(k, v) }
        val publisher =
          if (body == null) HttpRequest.BodyPublishers.noBody()
          else HttpRequest.BodyPublishers.ofString(body)
        if (body != null && !headers.exists(_._1.equalsIgnoreCase("content-type")))
          b.header("Content-Type", "application/json")
        val req = b.method(method, publisher).build()
        val resp = clientFor(ssl).send(req, HttpResponse.BodyHandlers.ofString())
        val ct = Option(resp.headers().firstValue("content-type").orElse(null))
        return Right(Resp(resp.statusCode(), ct, resp.body()))
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
