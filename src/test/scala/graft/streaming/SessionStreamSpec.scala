package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sessionize

class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  test("advance: gap splits, accumulation, and open-session carry") {
    val gap = 100L
    // fresh start
    val (c0, o0) = SessionStream.advance(None, 7L, Seq(10L, 50L, 120L), gap)
    assert(c0.isEmpty)
    assert(o0.contains(SessionStream.OpenSession(7L, 3L, 10L, 120L)))
    // gap exceeded → close previous, open new
    val (c1, o1) = SessionStream.advance(o0, 7L, Seq(300L, 320L), gap)
    assert(c1 == Seq(SessionStream.OpenSession(7L, 3L, 10L, 120L)))
    assert(o1.contains(SessionStream.OpenSession(7L, 2L, 300L, 320L)))
    // unsorted input is sorted before folding
    val (c2, o2) = SessionStream.advance(None, 7L, Seq(500L, 20L, 10L), gap)
    assert(c2 == Seq(SessionStream.OpenSession(7L, 2L, 10L, 20L)))
    assert(o2.contains(SessionStream.OpenSession(7L, 1L, 500L, 500L)))
    // no events → state unchanged
    assert(SessionStream.advance(o2, 7L, Nil, gap) == (Nil, o2))
  }

  test("streamed closed sessions equal the batch sessionization (q49 logic)") {
    val ev = graft.util.EventTime.tsNanos(spark.read.parquet(s"${sf()}/events.parquet"))
      .select($"user_id", $"event_id", $"ts")
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_stream").toString
    def withTime(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    withTime(ev).write.parquet(s"$dir/b0.parquet")
    val schema = spark.read.parquet(s"$dir/b0.parquet").schema

    val q = SessionStream.closedSessions(
        spark.readStream.schema(schema).parquet(s"$dir/*.parquet"))
      .writeStream.format("memory").queryName("sess_t")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // heartbeat a day later for a fresh user: pushes the watermark past
      // every real session's end+gap, timing out all open sessions
      val maxTs = ev.agg(max("ts")).head().getLong(0)
      withTime(Seq((999999L, 999999L, maxTs + 86400L * 1000000000L))
        .toDF("user_id", "event_id", "ts"))
        .write.mode("append").parquet(s"$dir/b1.parquet")
      q.processAllAvailable()

      val streamed = spark.table("sess_t")
        .filter($"user_id" =!= 999999L) // the heartbeat's own session stays open
        .select($"user_id", $"n_events", $"session_start", $"session_end")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = Sessionize.sessionStats(
          ev.select($"user_id", $"event_id", expr("ts div 1000").as("tus")),
          keys = Seq("user_id"), tsCol = "tus", tiebreak = "event_id",
          gapUs = 1800000000L)
        .select($"user_id", $"n_events", $"session_start", $"session_end")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        s"stream/batch disagree: only-stream=${(streamed -- batch).take(3)} " +
          s"only-batch=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("drainClosedSessions drains every session and matches batch (q64 path)") {
    val ev = graft.util.EventTime.tsNanos(spark.read.parquet(s"${sf()}/events.parquet"))
      .select($"user_id", $"event_id", $"ts")
    val drained = SessionStream.drainClosedSessions(
        ev.select($"user_id", $"event_id",
          timestamp_micros(expr("ts div 1000")).as("event_time")))
      .select($"user_id", $"n_events", $"session_start", $"session_end")
      .as[(Long, Long, Long, Long)].collect()
    val batch = Sessionize.sessionStats(
        ev.select($"user_id", $"event_id", expr("ts div 1000").as("tus")),
        keys = Seq("user_id"), tsCol = "tus", tiebreak = "event_id",
        gapUs = 1800000000L)
      .select($"user_id", $"n_events", $"session_start", $"session_end")
      .as[(Long, Long, Long, Long)].collect()
    assert(drained.length == batch.length) // no session emitted twice
    assert(drained.toSet == batch.toSet)
    // the sentinel heartbeat and its open session must not leak out
    assert(!drained.exists(_._1 == -1L))
    // scratch state is gone: the memory-sink view was dropped
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_stream_drain_")))
  }
}
