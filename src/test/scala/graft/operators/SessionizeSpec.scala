package graft.operators

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // (user, event, tµs): two sessions for user 1 split by a > 30-min gap,
  // one single-event session for user 2
  private val MIN_US = 60L * 1000000L
  private def events = Seq(
    (1L, 1L, 0L),
    (1L, 2L, 10L * MIN_US),           // same session (10 min gap)
    (1L, 3L, 41L * MIN_US),           // 31 min gap -> new session
    (2L, 4L, 5L * MIN_US)
  ).toDF("user_id", "event_id", "tus")

  test("sessionStats splits on gap > gapUs and emits duration_us") {
    val got = Sessionize.sessionStats(events, keys = Seq("user_id"),
        tsCol = "tus", tiebreak = "event_id", gapUs = 30L * MIN_US)
      .orderBy("user_id", "session_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 2L, 0L, 10L * MIN_US, 10L * MIN_US),
      (1L, 2L, 1L, 41L * MIN_US, 41L * MIN_US, 0L),
      (2L, 1L, 1L, 5L * MIN_US, 5L * MIN_US, 0L)))
  }

  test("output schema names the unit: duration_us, no *_ns columns") {
    val cols = Sessionize.sessionStats(events, keys = Seq("user_id"),
      tsCol = "tus", tiebreak = "event_id", gapUs = 30L * MIN_US).columns.toSeq
    assert(cols == Seq("user_id", "session_id", "n_events",
      "session_start", "session_end", "duration_us"))
    assert(!cols.exists(_.endsWith("_ns")),
      "µs-fed sessionization must not advertise nanosecond columns")
  }

  test("a gap exactly equal to gapUs does NOT split the session") {
    val boundary = Seq((1L, 1L, 0L), (1L, 2L, 30L * MIN_US))
      .toDF("user_id", "event_id", "tus")
    val n = Sessionize.sessionStats(boundary, keys = Seq("user_id"),
      tsCol = "tus", tiebreak = "event_id", gapUs = 30L * MIN_US).count()
    assert(n == 1L, "gap == gapUs is within-session (strict > splits)")
  }
}
