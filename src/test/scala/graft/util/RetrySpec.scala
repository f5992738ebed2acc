package graft.util

import org.scalatest.funsuite.AnyFunSuite

import Retry._

class RetrySpec extends AnyFunSuite {

  test("backoff formula: base*factor^(n-1), capped, jitter in [0.5,1.0]") {
    val cfg = RetryConfig(baseDelayMs = 1000, backoffFactor = 2.0, maxDelayMs = 3000, jitter = false)
    assert(delayMs(cfg, 1) == 1000)
    assert(delayMs(cfg, 2) == 2000)
    assert(delayMs(cfg, 3) == 3000) // capped (4000 → 3000)
    val rng = new scala.util.Random(7)
    val withJitter = RetryConfig(baseDelayMs = 1000, jitter = true)
    for (_ <- 1 to 50) {
      val d = delayMs(withJitter, 1, rng)
      assert(d >= 500 && d <= 1000)
    }
  }

  test("withRetry retries recoverable failures then succeeds") {
    var calls = 0
    val out = withRetry(RetryConfig(maxAttempts = 3), sleep = _ => ()) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(out == "ok" && calls == 3)
  }

  test("withRetry rethrows after exhausting attempts / on unrecoverable") {
    var calls = 0
    intercept[RuntimeException] {
      withRetry(RetryConfig(maxAttempts = 2), sleep = _ => ()) {
        calls += 1; throw new RuntimeException("always")
      }
    }
    assert(calls == 2)
    calls = 0
    intercept[IllegalArgumentException] {
      withRetry(RetryConfig(maxAttempts = 5),
        isRecoverable = !_.isInstanceOf[IllegalArgumentException],
        sleep = _ => ()) {
        calls += 1; throw new IllegalArgumentException("fatal")
      }
    }
    assert(calls == 1) // no retry on unrecoverable
  }

  test("degradation ladder: reference thresholds, escalation, reset, floor") {
    val ladder = new DegradationLadder()
    // level 0 = base config
    assert(ladder.config == DegradedConfig(5, 30, 100))
    // recovery.py:597-601 thresholds step down 3/60 → 1/120 → 1/300
    assert(ladder.degrade() && ladder.config == DegradedConfig(3, 60, 50))
    assert(ladder.degrade() && ladder.config == DegradedConfig(1, 120, 25))
    assert(ladder.degrade() && ladder.config == DegradedConfig(1, 300, 10))
    assert(!ladder.degrade()) // floor: caller falls through to SKIP
    ladder.reset()
    assert(ladder.currentLevel == 0)

    // run(): fails twice, succeeds at level 2, resets after success
    var calls = 0
    val (out, lvl) = ladder.run() { cfg =>
      calls += 1
      if (cfg.concurrentDownloads > 1) throw new RuntimeException("too parallel")
      cfg.timeoutSeconds
    }
    assert(calls == 3 && lvl == 2 && out == 120)
    assert(ladder.currentLevel == 0)

    // deterministic failure exhausts the ladder and rethrows
    val dead = new DegradationLadder()
    intercept[RuntimeException](dead.run() { _ => throw new RuntimeException("always") })
    assert(dead.currentLevel == 3)
  }

  test("circuit breaker opens after threshold, half-opens after timeout, closes on success") {
    var now = 0L
    val cb = new CircuitBreaker(failureThreshold = 2, recoveryTimeoutMs = 100, clock = () => now)
    def boom(): Unit = intercept[RuntimeException](cb.call(throw new RuntimeException("x")))
    boom(); assert(cb.state == cb.Closed)
    boom(); assert(cb.state == cb.Open)
    intercept[IllegalStateException](cb.call("nope")) // fails fast while open
    now = 150
    assert(cb.state == cb.HalfOpen)
    assert(cb.call("probe") == "probe") // successful probe closes
    assert(cb.state == cb.Closed)
    // failed probe reopens immediately
    boom(); boom()
    now = 300
    assert(cb.state == cb.HalfOpen)
    boom()
    assert(cb.state == cb.Open)
  }
}
