package graft.serving

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

/** The HTTP transport for [[Api]] — the binding the reference wires
  * in `main.go:36-63` (`http.Handle("/api/v1/collections…")` +
  * `ListenAndServe`), re-expressed over the JDK's built-in
  * `com.sun.net.httpserver` so the build stays dependency-free in a
  * zero-egress container. [[Api.handle]] already carries the whole
  * request surface (routes, bodies, status codes); this layer only
  * moves bytes:
  *
  *  - method + URI path pass through verbatim; the query string is
  *    split on `&`/`=` with URL-decoding (the GET-search params,
  *    rest.go:407-414);
  *  - every response is `Content-Type: application/json`, matching
  *    the uniform-JSON divergence documented on [[Api]];
  *  - responses gzip when the client advertises
  *    `Accept-Encoding: gzip` — the reference serves ALL api routes
  *    through a gzip middleware (rest.go:25-37, main.go:36-37), so a
  *    reference client that assumes compressed bodies works
  *    unchanged;
  *  - the listener binds loopback only: the reference binds a
  *    configurable host (settings.go), but an analytics container has
  *    no business exposing an unauthenticated surface beyond
  *    localhost — documented divergence, same spirit as the uniform
  *    JSON errors.
  *
  * `port = 0` binds an ephemeral port (tests read [[boundPort]]).
  * Requests dispatch on a small thread pool; [[Api]]'s registry lock
  * provides the same consistency the Go server's `s.mutex` does. */
final class HttpBinding(api: Api, port: Int = 8080) {

  private val server: HttpServer =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try respond(ex) finally ex.close()
  })
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
  server.start()

  /** The actual listening port (differs from the requested one only
    * when constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)

  private def parseQuery(raw: String): Map[String, String] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(
          java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8"))
        case Array(k) if k.nonEmpty =>
          Some(java.net.URLDecoder.decode(k, "UTF-8") -> "")
        case _ => None
      }
    }.toMap

  private def respond(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val resp = api.handle(
      ex.getRequestMethod,
      ex.getRequestURI.getPath,
      body,
      parseQuery(ex.getRequestURI.getRawQuery))
    val headers = ex.getResponseHeaders
    headers.set("Content-Type", "application/json")
    val accepts = Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
      .exists(_.toLowerCase.split(",").map(_.trim.takeWhile(_ != ';'))
        .contains("gzip"))
    val payload =
      if (accepts) {
        headers.set("Content-Encoding", "gzip")
        val bos = new ByteArrayOutputStream()
        val gz = new GZIPOutputStream(bos)
        gz.write(resp.body.getBytes(UTF_8)); gz.close()
        bos.toByteArray
      } else resp.body.getBytes(UTF_8)
    ex.sendResponseHeaders(resp.status, payload.length.toLong)
    val out = ex.getResponseBody
    out.write(payload)
    out.flush()
  }
}

object HttpBinding {
  /** One-call server over a data folder — the `main.go` shape:
    * registry scanned from disk, routes live at
    * `/api/v1/collections…`. */
  def serve(spark: SparkSession, rootDir: String, port: Int = 8080): HttpBinding =
    new HttpBinding(new Api(spark, rootDir), port)
}
