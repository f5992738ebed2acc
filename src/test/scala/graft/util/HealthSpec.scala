package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** A5 — threshold bands, roll-up semantics and failure isolation of
  * the health monitor (reference: etl/monitoring.py:250-438,
  * config/config.yaml:87-91).
  */
class HealthSpec extends AnyFunSuite {

  private val now   = 1755200000000L // 2026, inside the sane window
  private val clock = () => now

  private def mem(pct: Double): () => (Double, Long, Long) =
    () => (pct, (100 - pct).toLong * 1000000, 100000000L)
  private def disk(freePct: Double): () => (Double, Long, Long) =
    () => (freePct, freePct.toLong * 1000000, 100000000L)

  test("memory bands: 75/90 (config.yaml:90)") {
    assert(Health.memoryCheck(mem(50), clock).status == "healthy")
    assert(Health.memoryCheck(mem(75.0), clock).status == "healthy") // > not >=
    assert(Health.memoryCheck(mem(80), clock).status == "warning")
    assert(Health.memoryCheck(mem(95), clock).status == "unhealthy")
    assert(Health.memoryCheck(mem(95), clock).message.startsWith("High memory usage"))
  }

  test("disk bands on FREE percent: 15/5 (monitoring.py:414-418)") {
    assert(Health.diskCheck(disk(50), clock).status == "healthy")
    assert(Health.diskCheck(disk(10), clock).status == "warning")
    assert(Health.diskCheck(disk(3), clock).status == "unhealthy")
    assert(Health.diskCheck(disk(15.0), clock).status == "healthy") // < not <=
  }

  test("system_time sanity window 2020-2030 (monitoring.py:354-371)") {
    assert(Health.systemTimeCheck(clock).status == "healthy")
    val y2015 = () => 1420070400000L
    assert(Health.systemTimeCheck(y2015).status == "unhealthy")
    val y2035 = () => 2051222400000L
    assert(Health.systemTimeCheck(y2035).status == "unhealthy")
  }

  test("unknown check name and throwing checks report unhealthy, never crash") {
    val m = new Health.Monitor(clock)
    assert(m.runCheck("nope").status == "unhealthy")
    assert(m.runCheck("nope").message.contains("Unknown health check"))
    m.registerCheck("boom")(throw new RuntimeException("kaput"))
    val c = m.runCheck("boom")
    assert(c.status == "unhealthy" && c.message.contains("kaput"))
  }

  test("overall roll-up: any unhealthy wins, else any warning (monitoring.py:325-341)") {
    val m = new Health.Monitor(clock)
    m.registerCheck("a")(Health.HealthCheck("a", "healthy", "", now))
    m.registerCheck("b")(Health.HealthCheck("b", "warning", "meh", now))
    val st1 = m.status()
    assert(st1.status == "warning" && st1.healthy == 1 && st1.warning == 1)
    m.registerCheck("c")(Health.HealthCheck("c", "unhealthy", "bad", now))
    val st2 = m.status()
    assert(st2.status == "unhealthy" && st2.unhealthy == 1)
  }

  test("an unrecognized status string fails closed (counts as unhealthy)") {
    val m = new Health.Monitor(clock)
    m.registerCheck("odd")(Health.HealthCheck("odd", "degraded", "custom", now))
    val st = m.status()
    assert(st.status == "unhealthy" && st.unhealthy == 1,
      "a custom status the roll-up doesn't know must not read as green")
  }

  test("default monitor runs the reference trio green on this box") {
    val st = Health.defaultMonitor().status()
    assert(st.checks.keySet == Set("system_time", "memory_usage", "disk_space"))
    assert(st.status != "unhealthy", s"box reports: ${st.checks}")
    assert(st.checks.values.forall(_.durationMs >= 0.0))
  }

  test("disk reading of a not-yet-created path walks to the existing ancestor") {
    val ghost = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-no-such-dir", "deeper")
    val (pct, free, total) = Health.diskReading(ghost)
    assert(total > 0 && free >= 0 && pct >= 0.0 && pct <= 100.0)
  }

  test("injected readings flow into details") {
    val c = Health.diskCheck(disk(42), clock)
    assert(c.details("free_percent") == "42.0")
    assert(c.timestampMs == now)
  }
}
