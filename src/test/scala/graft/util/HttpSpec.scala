package graft.util

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** R6 over a loopback server (zero egress): per-origin session
  * pooling, TCP connection reuse across sequential requests, the
  * urllib3-Retry forcelist semantics, and the landUrl integration
  * (Content-Disposition naming + TTL'd no-request cache).
  */
class HttpSpec extends AnyFunSuite {

  private def withServer(test: (HttpServer, String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(null)
    server.start()
    try test(server, s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(
      ex: HttpExchange, status: Int, body: Array[Byte],
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private val fastCfg =
    Http.SessionConfig(maxRetries = 3, backoffBaseMillis = 1)

  test("per-origin pooling: one client per scheme://authority") {
    Http.closeAllSessions()
    val a1 = Http.session(Some("http://127.0.0.1:7001/x/y"))
    val a2 = Http.session(Some("http://127.0.0.1:7001/other"))
    val b  = Http.session(Some("http://127.0.0.1:7002/x"))
    assert(a1 eq a2, "same origin must reuse ONE client")
    assert(!(a1 eq b), "different origin gets its own client")
    assert(Http.pooledOrigins ==
      Set("http://127.0.0.1:7001", "http://127.0.0.1:7002"))
    Http.closeSession(Some("http://127.0.0.1:7001/"))
    assert(Http.pooledOrigins == Set("http://127.0.0.1:7002"))
    Http.closeAllSessions()
    assert(Http.pooledOrigins.isEmpty)
  }

  test("sequential requests to one origin ride one pooled TCP connection") {
    Http.closeAllSessions()
    withServer { (server, base) =>
      val clientPorts = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      server.createContext("/data", (ex: HttpExchange) => {
        clientPorts.add(ex.getRemoteAddress.getPort)
        respond(ex, 200, "payload".getBytes)
      })
      (1 to 3).foreach { _ =>
        val r = Http.get(s"$base/data", fastCfg)
        assert(r.status == 200 && new String(r.body) == "payload")
      }
      // keep-alive reuse: all three requests arrived over the SAME
      // client socket — one handshake served the whole sequence
      assert(clientPorts.size == 1,
        s"expected one pooled connection, saw ports $clientPorts")
    }
  }

  test("status forcelist retries with backoff, then succeeds") {
    Http.closeAllSessions()
    withServer { (server, base) =>
      val hits = new AtomicInteger(0)
      server.createContext("/flaky", (ex: HttpExchange) => {
        if (hits.incrementAndGet() < 3) respond(ex, 503, Array.empty)
        else respond(ex, 200, "ok".getBytes)
      })
      val r = Http.get(s"$base/flaky", fastCfg)
      assert(r.status == 200 && new String(r.body) == "ok")
      assert(hits.get() == 3, "two 503s then the success")
    }
  }

  test("non-forcelist status returns immediately, no retry") {
    Http.closeAllSessions()
    withServer { (server, base) =>
      val hits = new AtomicInteger(0)
      server.createContext("/missing", (ex: HttpExchange) => {
        hits.incrementAndGet()
        respond(ex, 404, "gone".getBytes)
      })
      val r = Http.get(s"$base/missing", fastCfg)
      assert(r.status == 404)
      assert(hits.get() == 1, "404 is not retryable")
    }
  }

  test("exhausted retries surface the retryable status") {
    Http.closeAllSessions()
    withServer { (server, base) =>
      val hits = new AtomicInteger(0)
      server.createContext("/down", (ex: HttpExchange) => {
        hits.incrementAndGet()
        respond(ex, 503, Array.empty)
      })
      val e = intercept[Http.RetryableStatus] {
        Http.get(s"$base/down", Http.SessionConfig(maxRetries = 2, backoffBaseMillis = 1))
      }
      // urllib3 Retry(total=2) parity: the initial attempt plus two
      // retries = three requests before the status surfaces
      assert(e.status == 503 && hits.get() == 3)
    }
  }

  test("landUrl: Content-Disposition names the file; TTL cache suppresses re-request") {
    Http.closeAllSessions()
    withServer { (server, base) =>
      val hits = new AtomicInteger(0)
      server.createContext("/export", (ex: HttpExchange) => {
        hits.incrementAndGet()
        respond(ex, 200, """{"type":"FeatureCollection","features":[]}""".getBytes,
          Map("Content-Disposition" -> "attachment; filename=\"data-export.geojson\""))
      })
      val dir = Files.createTempDirectory("graft_landurl")
      val ttl = Some(3600_000L)
      val (p1, n1, c1) = Landing.landUrl(s"$base/export", dir, ttl, fastCfg)
      assert(p1.getFileName.toString == "data-export.geojson")
      assert(n1 > 0 && !c1 && hits.get() == 1)
      // the sidecar maps the URL basename onto the served name, so the
      // repeat inside the TTL makes NO request at all
      val (p2, _, c2) = Landing.landUrl(s"$base/export", dir, ttl, fastCfg)
      assert(p2 == p1 && c2 && hits.get() == 1)
      // an expired landing re-requests (stale clock injection)
      val late = () => System.currentTimeMillis() + 7200_000L
      val (_, _, c3) = Landing.landUrl(s"$base/export", dir, ttl, fastCfg, late)
      assert(!c3 && hits.get() == 2)
    }
  }

  test("fetchStream: a terminal 404 fails once, never retried as transport error") {
    Http.closeAllSessions()
    withServer { (server, base) =>
      val hits = new AtomicInteger(0)
      server.createContext("/nope", (ex: HttpExchange) => {
        hits.incrementAndGet()
        respond(ex, 404, Array.empty)
      })
      val e = intercept[Http.HttpStatusError] {
        Http.fetchStream(s"$base/nope", fastCfg)
      }
      assert(e.status == 404 && hits.get() == 1,
        "a definitive server answer must not ride the IOException retry leg")
    }
  }

  test("landUrl: a changed URL with the same basename re-lands, never serves stale") {
    Http.closeAllSessions()
    withServer { (server, base) =>
      Seq("v1" -> "payload-2025", "v2" -> "payload-2026").foreach { case (v, body) =>
        server.createContext(s"/$v/data.bin", (ex: HttpExchange) =>
          respond(ex, 200, body.getBytes))
      }
      val dir = Files.createTempDirectory("graft_landurl_ver")
      // no TTL: a landed file is otherwise fresh FOREVER — only the
      // URL-keyed sidecar makes the version bump re-land
      val (p1, _, c1) = Landing.landUrl(s"$base/v1/data.bin", dir, None, fastCfg)
      assert(!c1 && new String(Files.readAllBytes(p1)) == "payload-2025")
      val (p2, _, c2) = Landing.landUrl(s"$base/v2/data.bin", dir, None, fastCfg)
      assert(!c2 && new String(Files.readAllBytes(p2)) == "payload-2026",
        "the v2 URL must not serve the v1 bytes cached under the same basename")
      // and the new URL is now the cached one
      val (_, _, c3) = Landing.landUrl(s"$base/v2/data.bin", dir, None, fastCfg)
      assert(c3)
    }
  }

  test("landUrl rejects a path-traversal Content-Disposition name") {
    Http.closeAllSessions()
    withServer { (server, base) =>
      server.createContext("/evil", (ex: HttpExchange) => {
        respond(ex, 200, "x".getBytes,
          Map("Content-Disposition" -> "attachment; filename=\"../../escape.txt\""))
      })
      val dir = Files.createTempDirectory("graft_landurl_evil")
      val (p, _, _) = Landing.landUrl(s"$base/evil", dir, None, fastCfg)
      // the hostile name is discarded; the URL basename wins
      assert(p.getParent == dir && p.getFileName.toString == "evil")
    }
  }
}
