package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming monitor (SURVEY §7 stretch: A2/A8) — the
  * reference's in-memory metric time-series + alert rules
  * (etl/monitoring.py:124-247, etl/utils/performance_monitor.py:47-99)
  * re-expressed as a streaming job over an events stream.
  *
  * Streaming surface: file-source readStream (schema mandatory) →
  * event-time watermark → sliding-window aggregates → threshold alert
  * filter; plus a mapGroupsWithState per-user session accumulator for
  * custom state. The same transforms run in batch (they're used that way
  * in tests — batch/stream parity is the point of the unified API).
  */
object MonitorStream {

  /** events as landed, with an `event_time` TIMESTAMP derived from
    * whatever type the fixture shipped `ts` as (ns-long, TIMESTAMP or
    * TIMESTAMP_NTZ — [[graft.util.EventTime.eventTime]] dispatches on
    * the schema, so the raw read-stream works unmodified). Long nanos
    * are truncated with integer `div` — a `/ 1000` double round-trip
    * wobbles ~1.7e18 values by hundreds of ns, breaking exact-µs oracle
    * comparison (q72).
    */
  def eventsWithTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", graft.util.EventTime.eventTime(events))

  /** Sliding-window per-type metric summaries (A2's window summaries:
    * count / sum / min / max / avg).
    */
  def windowedStats(
      events: DataFrame,
      windowLen: String = "1 hour",
      slide: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    eventsWithTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen, slide), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("total"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        avg(col("value")).as("avg_v"))

  /** A8 alert rule: windows whose aggregate crosses a threshold. */
  def thresholdAlerts(stats: DataFrame, metric: String, threshold: Double): DataFrame =
    stats.filter(col(metric) > threshold)
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col(metric).as("observed"))
      .withColumn("threshold", lit(threshold))

  /** Gap-based session windows per user (session_window): a session
    * closes after `gap` of inactivity — the event-time analog of the
    * reference's per-run activity grouping. Works identically in batch.
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    eventsWithTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n"), col("total"))

  /** Alert delivery via foreachBatch: each micro-batch of closed alert
    * windows appends to a managed table (the pattern for pushing to any
    * batch-writable sink — JDBC, parquet, notification fan-out).
    */
  def startAlertTableSink(
      spark: SparkSession,
      eventsDir: String,
      targetTable: String,
      alertMetric: String = "n",
      threshold: Double = 0.0): org.apache.spark.sql.streaming.StreamingQuery = {
    val Array(db, tbl) =
      if (targetTable.contains(".")) targetTable.split("\\.", 2)
      else Array("default", targetTable)
    graft.pipeline.Cleanup.ensureWritable(spark, db, tbl) // orphan-location guard
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val alerts = thresholdAlerts(windowedStats(stream), alertMetric, threshold)
    alerts.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").saveAsTable(targetTable)
      }
      .start()
  }

  // ---- stateful per-user sessions (mapGroupsWithState) ----

  final case class UserEvent(user_id: Long, event_id: Long, value: Double)
  final case class UserSession(user_id: Long, n_events: Long, total_value: Double, last_event: Long)

  def sessionUpdate(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[UserSession]): UserSession = {
    val prev = state.getOption.getOrElse(UserSession(userId, 0L, 0.0, -1L))
    val next = events.foldLeft(prev) { (acc, e) =>
      UserSession(userId, acc.n_events + 1, acc.total_value + e.value,
        math.max(acc.last_event, e.event_id))
    }
    state.update(next)
    next
  }

  /** Running per-user session state over a stream of events. */
  def userSessions(events: Dataset[UserEvent]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserSession, UserSession](GroupStateTimeout.NoTimeout())(sessionUpdate)
  }

  /** Wire the whole monitor as a streaming query over a parquet dir,
    * memory-sinked (for local drive/tests): returns the query name to
    * select from.
    */
  def startMemoryMonitor(
      spark: SparkSession,
      eventsDir: String,
      queryName: String = "monitor",
      alertMetric: String = "n",
      threshold: Double = 50.0): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val alerts = thresholdAlerts(windowedStats(stream), alertMetric, threshold)
    alerts.writeStream
      .outputMode(OutputMode.Append) // watermark closes windows
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
