package graft.util

import java.io.InputStream
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Pooled per-origin HTTP sessions (SURVEY §2.8 R6 — the reference's
  * `etl/utils/http_session.py` session manager and the pool settings at
  * `etl/utils/performance.py:68-147`).
  *
  * One `java.net.http.HttpClient` per ORIGIN (`scheme://host:port`),
  * created on first use and reused for every later request to that
  * origin — the JDK client keeps HTTP/1.1 connections alive in its
  * internal pool, so sequential requests to one host ride a single TCP
  * connection instead of paying a handshake each (HttpSpec proves
  * reuse against a loopback server by observing the server-side remote
  * port). Pool depth is a JVM-wide client property
  * (`-Djdk.httpclient.connections.maxPoolSize`, analog of
  * `pool_maxsize=10` at http_session.py:26); the per-origin manager
  * here is the `session_key = scheme://netloc` map at
  * http_session.py:38-49.
  *
  * Retries mirror the mounted `urllib3.Retry` adapter
  * (http_session.py:60-67): transient transport errors and the status
  * forcelist 500/502/503/504 back off exponentially through
  * [[Retry.withRetry]] (R1 — `backoff_factor=0.3` → base 300 ms); any
  * other status (404, 403, …) returns immediately. Default headers and
  * the 30 s timeout are the session defaults at http_session.py:24-83.
  *
  * Driver-side scope (the SURVEY §2.8 disposition): this feeds
  * [[Landing.land]] — bytes land once, Spark scans files. The DATA path
  * never goes through a driver HTTP client.
  */
object Http {

  /** http_session.py:23-29 `_default_config` (backoff_factor 0.3 s). */
  final case class SessionConfig(
      connectTimeoutMillis: Long = 30000,
      requestTimeoutMillis: Long = 30000,
      maxRetries: Int = 3,
      backoffBaseMillis: Long = 300,
      jitter: Boolean = false,
      headers: Map[String, String] = DefaultHeaders)

  /** http_session.py:76-83 (Accept-Encoding pinned to identity: the JDK
    * client does not transparently decompress, and landed bytes must be
    * the payload bytes).
    */
  val DefaultHeaders: Map[String, String] = Map(
    "User-Agent" -> "graft-etl/1.0 (jdk-http-client)",
    "Accept" -> "application/json, application/geo+json, */*;q=0.9",
    "Accept-Encoding" -> "identity")

  /** http_session.py:64 `status_forcelist`. */
  val RetryStatuses: Set[Int] = Set(500, 502, 503, 504)

  final case class Response(
      status: Int, headers: Map[String, String], body: Array[Byte])

  /** Retryable-status response, thrown inside the retry loop so the
    * backoff machinery sees it as a recoverable failure.
    */
  final case class RetryableStatus(url: String, status: Int)
    extends RuntimeException(s"HTTP $status from $url (retryable)")

  /** Terminal non-2xx on a download path — deliberately NOT an
    * IOException: transport IOExceptions are recoverable (retried), a
    * definitive server answer like 404 must fail immediately.
    */
  final case class HttpStatusError(url: String, status: Int)
    extends RuntimeException(s"HTTP $status from $url")

  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[String, HttpClient]()

  private[util] def originKey(url: Option[String]): String =
    url.map { u =>
      val x = URI.create(u)
      s"${x.getScheme}://${x.getAuthority}"
    }.getOrElse("default")

  /** Get-or-create the pooled client for a URL's origin
    * (http_session.py:31-49 `get_session`). Reference-parity caveat
    * (same as `get_session(**config)`): the CONNECT-phase settings in
    * `cfg` apply only when this call creates the client — an origin
    * already pooled keeps its builder-time connect timeout (per-request
    * settings — request timeout, headers, retries — always apply).
    * Callers needing a different connect profile for one origin should
    * `closeSession` it first.
    */
  def session(
      baseUrl: Option[String] = None,
      cfg: SessionConfig = SessionConfig()): HttpClient =
    sessions.computeIfAbsent(originKey(baseUrl), _ =>
      HttpClient.newBuilder()
        .version(HttpClient.Version.HTTP_1_1)
        .connectTimeout(Duration.ofMillis(cfg.connectTimeoutMillis))
        .followRedirects(HttpClient.Redirect.NORMAL)
        .build())

  private def request(url: String, cfg: SessionConfig): HttpRequest = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(cfg.requestTimeoutMillis))
      .GET()
    cfg.headers.foreach { case (k, v) => b.header(k, v) }
    b.build()
  }

  private def retryCfg(cfg: SessionConfig): Retry.RetryConfig =
    Retry.RetryConfig(
      // urllib3 Retry(total=N) allows N retries AFTER the initial
      // attempt, so attempts = retries + 1 (maxRetries = 0 still
      // performs the one initial request)
      maxAttempts = math.max(1, cfg.maxRetries + 1),
      baseDelayMs = cfg.backoffBaseMillis,
      jitter = cfg.jitter)

  private def recoverable(e: Throwable): Boolean = e match {
    case _: RetryableStatus     => true
    case _: java.io.IOException => true // connect reset/refused/timeout
    case _                      => false
  }

  private def headerMap(r: HttpResponse[_]): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    // last value wins; header NAMES case-folded for lookup convenience
    r.headers().map().asScala.map { case (k, vs) =>
      k.toLowerCase -> vs.asScala.lastOption.getOrElse("")
    }.toMap
  }

  /** GET with pooling + retry; the whole body is materialized (catalog
    * and discovery payloads — for bulk downloads use [[fetchStream]]).
    */
  def get(url: String, cfg: SessionConfig = SessionConfig()): Response =
    Retry.withRetry(retryCfg(cfg), isRecoverable = recoverable) {
      val r = session(Some(url), cfg)
        .send(request(url, cfg), HttpResponse.BodyHandlers.ofByteArray())
      if (RetryStatuses(r.statusCode())) throw RetryableStatus(url, r.statusCode())
      Response(r.statusCode(), headerMap(r), r.body())
    }

  /** Streaming GET for [[Landing.land]]: returns (status, headers,
    * body stream) once response headers arrive; the caller streams the
    * body to disk in [[Landing.ChunkSize]] chunks. Retryable statuses
    * drain-and-retry before the stream is handed out; a non-2xx
    * non-retryable status fails (a download has no use for an error
    * body). The response's Content-Disposition rides in the header map
    * for [[Landing.contentDispositionFilename]] (F7).
    */
  def fetchStream(
      url: String,
      cfg: SessionConfig = SessionConfig()): (Int, Map[String, String], InputStream) =
    Retry.withRetry(retryCfg(cfg), isRecoverable = recoverable) {
      val r = session(Some(url), cfg)
        .send(request(url, cfg), HttpResponse.BodyHandlers.ofInputStream())
      val status = r.statusCode()
      if (RetryStatuses(status)) {
        r.body().close() // release the pooled connection before retrying
        throw RetryableStatus(url, status)
      }
      if (status < 200 || status >= 300) {
        r.body().close()
        throw HttpStatusError(url, status)
      }
      (status, headerMap(r), r.body())
    }

  /** Drop a pooled origin client (http_session.py:90-101
    * `close_session`; the JDK 17 client has no explicit close — evicted
    * clients release their pooled connections on GC / keep-alive expiry).
    */
  def closeSession(baseUrl: Option[String] = None): Unit = {
    sessions.remove(originKey(baseUrl)); ()
  }

  /** http_session.py:103-113 `close_all_sessions`. */
  def closeAllSessions(): Unit = sessions.clear()

  /** Pool introspection for specs/diagnostics. */
  private[graft] def pooledOrigins: Set[String] = {
    import scala.jdk.CollectionConverters._
    sessions.keySet().asScala.toSet
  }
}
