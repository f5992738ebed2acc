package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** R5 response-cache semantics (performance.py:149-272 +
  * intelligent_cache.py:358-378): TTL expiry, LRU capacity eviction,
  * stats, adaptive TTL, canonical request keys. A fake clock drives
  * every time-dependent assertion deterministically.
  */
class ResponseCacheSpec extends AnyFunSuite {

  private final class FakeClock(var now: Long = 0L) {
    def apply(): Long = now
    def advanceSec(s: Long): Unit = now += s * 1000L
  }

  test("serves within TTL, expires after it") {
    val clk = new FakeClock
    val c = new ResponseCache[String](maxSize = 10, defaultTtlSeconds = 60, clock = clk.apply _)
    c.put("k", "v")
    clk.advanceSec(59)
    assert(c.get("k").contains("v"))
    clk.advanceSec(2) // 61s past the put
    assert(c.get("k").isEmpty)
    val s = c.stats
    assert(s.hits == 1 && s.misses == 1 && s.expirations == 1 && s.size == 0)
  }

  test("per-entry TTL overrides the default") {
    val clk = new FakeClock
    val c = new ResponseCache[Int](maxSize = 10, defaultTtlSeconds = 60, clock = clk.apply _)
    c.put("long", 1, ttlSeconds = Some(600))
    clk.advanceSec(120)
    assert(c.get("long").contains(1)) // default would have expired
  }

  test("LRU eviction at capacity keeps recently used entries") {
    val clk = new FakeClock
    val c = new ResponseCache[Int](maxSize = 3, defaultTtlSeconds = 3600, clock = clk.apply _)
    c.put("a", 1); c.put("b", 2); c.put("c", 3)
    assert(c.get("a").contains(1)) // touch a → b is now LRU
    c.put("d", 4)                  // over capacity → evict b
    assert(c.get("b").isEmpty)
    assert(c.get("a").contains(1) && c.get("c").contains(3) && c.get("d").contains(4))
    assert(c.stats.evictions == 1 && c.size == 3)
  }

  test("getOrElseUpdate computes once per TTL window") {
    val clk = new FakeClock
    val c = new ResponseCache[String](maxSize = 10, defaultTtlSeconds = 60, clock = clk.apply _)
    var computes = 0
    def fetch(): String = { computes += 1; "payload" }
    assert(c.getOrElseUpdate("url")(fetch()) == "payload")
    assert(c.getOrElseUpdate("url")(fetch()) == "payload")
    assert(computes == 1)
    clk.advanceSec(61)
    assert(c.getOrElseUpdate("url")(fetch()) == "payload")
    assert(computes == 2) // expired → recomputed
  }

  test("adaptive TTL: hot keys cache 2x, cold keys 0.5x (intelligent_cache.py:366-378)") {
    val clk = new FakeClock
    val c = new ResponseCache[Int](
      maxSize = 10, defaultTtlSeconds = 100, adaptiveTtl = true, clock = clk.apply _)

    // hot: 5 accesses over 4s → 1.25/s > 0.1 → ttl 200s
    (1 to 5).foreach { _ => c.get("hot"); clk.advanceSec(1) }
    c.put("hot", 1)
    clk.advanceSec(150) // past default 100, inside doubled 200
    assert(c.get("hot").contains(1))

    // cold: 2 accesses 500s apart → 0.004/s < 0.01 → ttl 50s
    c.get("cold"); clk.advanceSec(500); c.get("cold")
    c.put("cold", 2)
    clk.advanceSec(75) // past halved 50, inside default 100
    assert(c.get("cold").isEmpty)
  }

  test("requestKey is insensitive to param/header order, sensitive to values") {
    val a = ResponseCache.requestKey("http://x/q", Map("p1" -> "1", "p2" -> "2"), Map("h" -> "v"))
    val b = ResponseCache.requestKey("http://x/q", Map("p2" -> "2", "p1" -> "1"), Map("h" -> "v"))
    val c = ResponseCache.requestKey("http://x/q", Map("p1" -> "1", "p2" -> "DIFF"), Map("h" -> "v"))
    assert(a == b)
    assert(a != c)
    assert(a.matches("[0-9a-f]{32}")) // md5 hex
  }

  test("requestKey is injection-proof: delimiter chars in values cannot collide") {
    // with bare '&'/'=' joins these two requests canonicalize
    // identically and would serve each other's responses
    val k1 = ResponseCache.requestKey("http://x/q", Map("a" -> "1&b=2"))
    val k2 = ResponseCache.requestKey("http://x/q", Map("a" -> "1", "b" -> "2"))
    assert(k1 != k2)
    // same for header/param boundary and url/param boundary
    val k3 = ResponseCache.requestKey("http://x/q", Map.empty, Map("a" -> "1"))
    val k4 = ResponseCache.requestKey("http://x/q", Map("a" -> "1"))
    assert(k3 != k4)
    val k5 = ResponseCache.requestKey("http://x/q&a=1")
    assert(k5 != k4)
  }

  test("concurrent misses for one key coalesce into a single compute") {
    val c = new ResponseCache[Int](maxSize = 8, defaultTtlSeconds = 3600)
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier  = new java.util.concurrent.CyclicBarrier(8)
    val results  = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        barrier.await() // all 8 race the same missing key
        results.add(c.getOrElseUpdate("hot") {
          Thread.sleep(50) // slow fetch: the stampede window
          computes.incrementAndGet()
        })
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(computes.get() == 1,
      s"stampede: ${computes.get()} computes for one key")
    assert(results.size == 8 && results.stream().allMatch(_ == 1))
  }

  test("property: random op sequences keep size<=maxSize and hits+misses==gets") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val opGen: Gen[(Int, Int, Long)] = for {
      kind <- Gen.chooseNum(0, 2) // 0=get 1=put 2=advance clock
      key  <- Gen.chooseNum(0, 19)
      dt   <- Gen.chooseNum(0L, 40L)
    } yield (kind, key, dt)
    val prop = Prop.forAll(Gen.listOf(opGen)) { ops =>
      val clk = new FakeClock
      val c = new ResponseCache[Int](maxSize = 5, defaultTtlSeconds = 30, clock = clk.apply _)
      var gets = 0L
      ops.foreach {
        case (0, k, _)  => c.get(s"k$k"); gets += 1
        case (1, k, _)  => c.put(s"k$k", k)
        case (_, _, dt) => clk.advanceSec(dt)
      }
      val s = c.stats
      c.size <= 5 && s.hits + s.misses == gets && s.size == c.size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"property failed: $res")
  }

  test("concurrent getOrElseUpdate never corrupts state or exceeds capacity") {
    val c = new ResponseCache[Int](maxSize = 8, defaultTtlSeconds = 3600)
    val threads = (1 to 8).map { t =>
      new Thread(() => (0 until 500).foreach { i =>
        c.getOrElseUpdate(s"k${(i + t) % 16}")(i)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(c.size <= 8)
    val s = c.stats
    assert(s.hits + s.misses == 8L * 500)
  }

  test("land with maxAge re-streams a stale file, keeps a fresh one") {
    val clk  = new FakeClock(1000000L)
    val dir  = java.nio.file.Files.createTempDirectory("graft_ttl")
    val dest = dir.resolve("data.bin")
    var opens = 0
    def in() = { opens += 1; new java.io.ByteArrayInputStream(Array.fill(100)(1.toByte)) }

    val (_, _, c1) = Landing.land(in _, dest, maxAgeMillis = Some(60000L), clock = clk.apply _)
    assert(!c1 && opens == 1)
    java.nio.file.Files.setLastModifiedTime(
      dest, java.nio.file.attribute.FileTime.fromMillis(clk()))

    clk.advanceSec(30) // within TTL → cached
    val (_, _, c2) = Landing.land(in _, dest, maxAgeMillis = Some(60000L), clock = clk.apply _)
    assert(c2 && opens == 1)

    clk.advanceSec(60) // 90s old > 60s TTL → re-streamed
    val (_, _, c3) = Landing.land(in _, dest, maxAgeMillis = Some(60000L), clock = clk.apply _)
    assert(!c3 && opens == 2)

    // and the no-TTL caller still lands once forever
    val (_, _, c4) = Landing.land(in _, dest)
    assert(c4 && opens == 2)
  }
}
