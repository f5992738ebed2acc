package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based streaming sessionization with custom state —
  * `flatMapGroupsWithState` + event-time timeout, the full-control
  * variant of `session_window` (which [[MonitorStream.sessionStats]]
  * uses): sessions EMIT as they close, either because a later event
  * proved the gap elapsed, or because the watermark passed the gap with
  * no new events (timeout — a session_window aggregate can express
  * neither custom per-session payloads nor early side outputs).
  *
  * Batch parity: [[graft.operators.Sessionize]] computes the same
  * gap-split sessions over a static frame (q49); the spec asserts both
  * agree on the closed set.
  *
  * Scale shape: state is ONE open session per user (a few longs), not
  * buffered events — a billion-user stream holds a billion tiny state
  * rows partitioned by the shuffle, and the timeout sweep is Spark's,
  * not a driver loop.
  */
object SessionStream {

  /** Typed-boundary row: only the two fields the kernel reads. The
    * event id never enters the stateful operator — dropping it cuts a
    * third out of every deserialized row, the key-extraction pass, and
    * the shuffle payload (the typed path pays per FIELD: AppendColumns
    * deserializes each row once to extract the key and the flatMap
    * deserializes it again). The watermark column itself must survive
    * into the operator's input — Spark's unsupported-operation checker
    * requires a watermark-tagged attribute for EventTimeTimeout — so
    * event_time stays a Timestamp here.
    */
  final case class SessionEvent(user_id: Long, event_time: Timestamp)

  final case class OpenSession(
      user_id: Long, n_events: Long, start_us: Long, end_us: Long)

  final case class ClosedSession(
      user_id: Long, n_events: Long, session_start: Long, session_end: Long,
      duration_us: Long)

  /** Pure transition: fold sorted event times into (closed…, open). */
  def advance(
      open: Option[OpenSession],
      userId: Long,
      timesUs: Seq[Long],
      gapUs: Long): (Seq[OpenSession], Option[OpenSession]) = {
    var closed = Vector.empty[OpenSession]
    var cur    = open
    timesUs.sorted.foreach { t =>
      cur match {
        case Some(s) if t - s.end_us <= gapUs =>
          cur = Some(s.copy(n_events = s.n_events + 1, end_us = math.max(s.end_us, t)))
        case Some(s) =>
          closed :+= s
          cur = Some(OpenSession(userId, 1L, t, t))
        case None =>
          cur = Some(OpenSession(userId, 1L, t, t))
      }
    }
    (closed, cur)
  }

  private def toClosed(s: OpenSession): ClosedSession =
    ClosedSession(s.user_id, s.n_events, s.start_us, s.end_us, s.end_us - s.start_us)

  def sessionFlatMap(gapUs: Long)(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      // watermark passed end+gap with no events: the open session is final
      val out = state.getOption.map(toClosed).iterator
      state.remove()
      out
    } else {
      // full-microsecond precision: getTime is ms, getNanos the fraction
      val times = events.map(e =>
        e.event_time.getTime / 1000L * 1000000L + e.event_time.getNanos / 1000L).toSeq
      val (closed, open) = advance(state.getOption, userId, times, gapUs)
      open match {
        case Some(s) =>
          state.update(s)
          // close once the watermark proves the gap elapsed; Spark
          // rejects timeouts <= current watermark, so a session already
          // past its gap times out on the next trigger instead
          state.setTimeoutTimestamp(math.max(
            s.end_us / 1000L + gapUs / 1000L + 1L,
            state.getCurrentWatermarkMs() + 1L))
        case None => state.remove()
      }
      closed.iterator.map(toClosed)
    }
  }

  /** events(user_id, event_time) stream → closed sessions (extra
    * input columns are projected away before the stateful operator).
    * `watermarkDelay` bounds late data; a session closes `gapUs` µs
    * after its last event (by proof or by timeout).
    */
  def closedSessions(
      events: DataFrame,
      gapUs: Long = 1800000000L, // 30 min
      watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", watermarkDelay)
      .select(col("user_id"), col("event_time"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(sessionFlatMap(gapUs))
  }

  /** Run [[closedSessions]] over a STATIC events frame and drain every
    * session out of the stream — the batch-parity harness as a library
    * operator, so the driver gate can hold the streaming path to the
    * same DuckDB oracle as the batch sessionization (q49 vs q64).
    *
    * Mechanics: stage the frame as parquet, stream it through the real
    * `flatMapGroupsWithState` pipeline into a memory sink (batch 1:
    * every session closed by a later event of the same user emits),
    * then append one far-future heartbeat for a sentinel user and run a
    * second cycle — the watermark jumps past every real session's
    * end+gap, so every still-open session times out and emits. Only the
    * sentinel's own session stays open; it is filtered out. The result
    * is `localCheckpoint`ed so the memory-sink view and scratch files
    * can be dropped before returning.
    *
    * `events` needs (user_id, event_time: timestamp); timestamps are
    * µs-precision (the stream state folds µs longs).
    */
  def drainClosedSessions(
      events: DataFrame,
      gapUs: Long = 1800000000L): DataFrame = {
    val staged = events.select(col("user_id"), col("event_time"))
    FileStreamDrain.drain(
        staged,
        closedSessions(_, gapUs).toDF(),
        secondBatch = FileStreamDrain.watermarkCloser(unix_micros(col("event_time"))) {
          (ss, maxUs) =>
            ss.range(1)
              .select(lit(-1L).as("user_id"),
                timestamp_micros(lit(maxUs + gapUs + 86400000000L)).as("event_time"))
        })
      .filter(col("user_id") =!= -1L)
  }
}
