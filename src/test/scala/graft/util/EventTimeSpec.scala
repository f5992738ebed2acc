package graft.util

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The fixture-type compatibility contract: events.ts has shipped as
  * ns-long, TIMESTAMP and TIMESTAMP_NTZ across fixture generations, and
  * a regeneration must never again take out the event-time queries
  * (round 10: five queries + four suites red on one parquet type
  * change). Each helper is pinned against all three representations of
  * the SAME instant.
  */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  // 2021-03-04T05:06:07.123456Z — exact at µs precision in every type
  private val us = 1614834367123456L
  private val ns = us * 1000L

  private def longDf = Seq((1L, ns)).toDF("event_id", "ts")
  private def tsDf =
    Seq((1L, us)).toDF("event_id", "us")
      .select($"event_id", timestamp_micros($"us").as("ts"))
  private def ntzDf = tsDf.select($"event_id", $"ts".cast(TimestampNTZType).as("ts"))

  test("tsNanos normalizes all three representations to the same ns long") {
    for (df <- Seq(longDf, tsDf, ntzDf)) {
      val out = EventTime.tsNanos(df)
      assert(out.schema("ts").dataType == LongType)
      // column set and order untouched — downstream selects stay valid
      assert(out.columns.toSeq == df.columns.toSeq)
      val got = out.select($"ts").as[Long].head()
      // timestamp µs precision: the ns value round-trips exactly because
      // the fixture instant is µs-aligned
      assert(got == ns, s"ts mismatch for ${df.schema("ts").dataType}")
    }
  }

  test("tsNanos is idempotent and leaves other columns alone") {
    val once  = EventTime.tsNanos(ntzDf)
    val twice = EventTime.tsNanos(once)
    assert(twice.select($"event_id", $"ts").as[(Long, Long)].head() == ((1L, ns)))
  }

  test("eventTime yields the same TIMESTAMP instant from every representation") {
    val expected = tsDf.select(unix_micros($"ts")).as[Long].head()
    for (df <- Seq(longDf, tsDf, ntzDf)) {
      val c   = EventTime.eventTime(df)
      val got = df.select(unix_micros(c.cast(TimestampType))).as[Long].head()
      assert(got == expected, s"event_time mismatch for ${df.schema("ts").dataType}")
    }
  }

  test("tsLiteral round-trips through tsNanos in every fixture type") {
    for (dt <- Seq[DataType](LongType, TimestampType, TimestampNTZType)) {
      val df  = Seq(1L).toDF("event_id")
        .select($"event_id", EventTime.tsLiteral(ns, dt).as("ts"))
      assert(df.schema("ts").dataType == dt)
      val got = EventTime.tsNanos(df).select($"ts").as[Long].head()
      assert(got == ns, s"literal round-trip mismatch for $dt")
    }
  }

  test("NTZ canonicalization refuses a non-UTC session instead of shifting") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      intercept[IllegalArgumentException](EventTime.tsNanos(ntzDf))
      intercept[IllegalArgumentException](EventTime.eventTime(ntzDf))
      // non-NTZ representations carry their own zone — still fine
      assert(EventTime.tsNanos(longDf).select($"ts").as[Long].head() == ns)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("unsupported ts types fail loudly, not silently") {
    val bad = Seq((1L, "oops")).toDF("event_id", "ts")
    intercept[IllegalArgumentException](EventTime.tsNanos(bad))
    intercept[IllegalArgumentException](EventTime.eventTime(bad))
    intercept[IllegalArgumentException](EventTime.tsLiteral(ns, StringType))
  }
}
