package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch form of the canonical
  * user-activity / training-data segmentation operator (the streaming
  * analog is `session_window` in Structured Streaming; this is the
  * backfill path over stored events).
  *
  * Scale design: ONE shuffle on the (high-cardinality) key set; the two
  * windows and the final aggregation all reuse that partitioning, so no
  * further exchanges. Timestamps stay integer MICROseconds end-to-end
  * (the precision every fixture generation can represent) — exact
  * arithmetic, DuckDB-oracle checkable bit-for-bit.
  */
object Sessionize {

  /** Assign a per-key session index: a new session starts when the gap
    * to the previous event exceeds `gapUs`. `tiebreak` makes the
    * within-key ordering total (equal timestamps are real in event data).
    *
    * @param tsCol integer epoch-MICROsecond column; `gapUs` is compared
    *              against differences of it, so both must share the unit
    */
  def withSessionIds(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: String,
      gapUs: Long): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(tsCol), col(tiebreak))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull || col(tsCol) - prev > gapUs, 1L).otherwise(0L)
    events
      .withColumn("_new_session", isNew)
      .withColumn("session_id",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** Per-session stats: event count, start, end, duration (all µs
    * integers, matching the input unit). One aggregation on
    * (keys :+ session_id) — same partitioning as the window pass.
    */
  def sessionStats(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: String,
      gapUs: Long): DataFrame =
    withSessionIds(events, keys, tsCol, tiebreak, gapUs)
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .withColumn("duration_us", col("session_end") - col("session_start"))
}
