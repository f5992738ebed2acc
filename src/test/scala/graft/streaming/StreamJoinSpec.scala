package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream interval join (q105): the watermarked self-join of
  * the events file stream must reproduce the plain batch interval
  * join — pairs, bounds and all.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val HourUs = 3600L * 1000000L

  private def pipeline(ss: org.apache.spark.sql.DataFrame) = {
    val p = ss.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"),
        $"event_time".as("p_time"))
      .withWatermark("p_time", "1 hour")
    val c = ss.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id".as("c_user"),
        $"event_time".as("c_time"))
      .withWatermark("c_time", "1 hour")
    p.join(c, $"p_user" === $"c_user" &&
      $"c_time" >= $"p_time" - expr("INTERVAL 1 HOUR") &&
      $"c_time" <= $"p_time")
  }

  test("streamed interval join equals the batch join; bounds are inclusive") {
    // one user; purchase at t=2h. Clicks at exactly t=1h (on the lower
    // bound → in), t=2h (equal time → in), t=1h-1µs (just out),
    // t=2h+1µs (after → out); plus another user's click inside the
    // window (key mismatch → out). Epochs start a day up (q71 lesson).
    val base = 86400L * 1000000L
    val t0   = base + 2 * HourUs
    val rows = Seq(
      (1L, 10L, "purchase", t0),
      (2L, 10L, "click", t0 - HourUs),          // on the 1h bound → in
      (3L, 10L, "click", t0),                   // same instant → in
      (4L, 10L, "click", t0 - HourUs - 1L),     // 1µs too early → out
      (5L, 10L, "click", t0 + 1L),              // 1µs after → out
      (6L, 11L, "click", t0 - 1L)               // other user → out
    )
    val staged = rows.toDF("event_id", "user_id", "event_type", "tus")
      .select($"event_id", $"user_id", $"event_type",
        timestamp_micros($"tus").as("event_time"))
    val streamed = FileStreamDrain.drain(staged, pipeline)
      .select($"p_id", $"c_id").as[(Long, Long)].collect().toSet
    assert(streamed == Set((1L, 2L), (1L, 3L)))
    val batch = pipeline(staged)
      .select($"p_id", $"c_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("fixture parity: stream == batch over sf0.001 events") {
    val ev = graft.util.EventTime.tsNanos(
        spark.read.parquet(s"${sf()}/events.parquet"))
      .select($"event_id", $"user_id", $"event_type",
        timestamp_micros(expr("ts div 1000")).as("event_time"))
    val streamed = FileStreamDrain.drain(ev, pipeline)
      .select($"p_id", $"c_id").as[(Long, Long)].collect().toSet
    val batch = pipeline(ev)
      .select($"p_id", $"c_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch)
  }
}
