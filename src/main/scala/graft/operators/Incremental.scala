package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view algebra:
  * keep a per-key (count, sum) aggregate table current under a stream
  * of inserts AND retractions without ever rescanning the base data.
  * Sum and count are abelian-group aggregates (they have inverses), so
  * a CDC delta folds in as `state ⊕ agg(delta)` where retractions
  * carry sign −1 — the same partial-merge algebra Spark's own
  * map-side combine uses, lifted to pipeline granularity. Completes
  * the CDC family: q70 diffs snapshots, q82 applies row changes, q86
  * maintains the derived aggregate.
  *
  * Scale shape: the delta (today's increment) aggregates down to one
  * row per touched key BEFORE meeting the state table; the merge is a
  * full-outer equi-join on the group key — broadcast-able when the
  * delta touches few keys, and never proportional to the base data.
  * The 100 TB property is exactly that: maintenance cost tracks the
  * DELTA, not the corpus.
  */
object Incremental {

  /** Merge a CDC delta into a (count, sum) aggregate state table.
    *
    * `state` must carry `keyCols :+ nCol :+ sumCol`; `delta` carries
    * raw rows with `keyCols`, `valueCol`, and a ±1 `signCol`
    * (+1 insert, −1 retraction of a previously counted row). Keys
    * whose count reaches zero leave the state table (their sums are
    * zero by construction when retractions mirror prior inserts).
    * Retracting rows that were never inserted is the caller's bug; the
    * algebra still yields the signed totals.
    */
  def maintainSumCount(
      state: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      signCol: String,
      nCol: String = "n",
      sumCol: String = "sum_c"): DataFrame = {
    require(keyCols.nonEmpty, "at least one group key required")
    val d = delta.groupBy(keyCols.map(col): _*)
      .agg(sum(col(signCol)).as("_dn"),
        sum(col(signCol) * col(valueCol)).as("_ds"))
    state.join(d, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col(nCol), lit(0L)) + coalesce(col("_dn"), lit(0L))).as(nCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("_ds"), lit(0L))).as(sumCol)): _*)
      .filter(col(nCol) > 0)
  }
}
