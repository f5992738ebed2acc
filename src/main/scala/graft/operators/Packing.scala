package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: lay documents end-to-end in a
  * deterministic order and cut the token stream every `budget` tokens
  * (the concatenate-then-cut model — documents may straddle a cut, so
  * each doc reports the chunk range it lands in).
  *
  * The core is a GLOBAL exclusive prefix sum, which Spark's window
  * functions only express as `Window.orderBy(...)` with no partition
  * key — a plan that drags every row through ONE task. This
  * implementation is the standard two-level scan instead:
  *
  *   1. bucket rows by `orderCol div blockSize` (a deterministic
  *      integer projection — no sampled range partitioner, so
  *      re-evaluation of the plan can never reassign rows);
  *   2. per-bucket totals (map-side-combining groupBy, tiny output:
  *      1/blockSize of the rows);
  *   3. exclusive prefix over the bucket totals — the only
  *      unpartitioned window, now over nRows/blockSize rows
  *      (blockSize=4096 turns a 10^10-row scan into a 2.4M-row one;
  *      at even larger scale, apply the same reduction again);
  *   4. join offsets back (AQE broadcasts the bucket table when it is
  *      small) + an intra-bucket window partitioned by bucket — fully
  *      parallel.
  */
object Packing {

  /** `start_offset` = global exclusive prefix sum of `weightCol` in
    * `orderCol` order. `orderCol` must be an integral key, unique per
    * row (ties within an `orderCol` value would make the prefix
    * ambiguous); weights must be non-negative.
    */
  def withStartOffset(
      df: DataFrame,
      orderCol: String,
      weightCol: String,
      blockSize: Long = 4096L): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val b = df.withColumn("_bkt", expr(s"$orderCol div $blockSize"))
    val bucketOffsets = b.groupBy("_bkt")
      .agg(sum(col(weightCol)).as("_bt"))
      .withColumn("_boff",
        coalesce(sum(col("_bt")).over(
          Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_bkt", "_boff")
    val intra = Window.partitionBy("_bkt").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    b.join(bucketOffsets, "_bkt")
      .withColumn("start_offset",
        col("_boff") + coalesce(sum(col(weightCol)).over(intra), lit(0L)))
      .drop("_bkt", "_boff")
  }

  /** Pack a corpus into fixed-`budget` token chunks: each row gains
    * `start_offset` (its first token's position in the concatenated
    * stream), `chunk_first` and `chunk_last` (the chunk ids its tokens
    * span). Zero-weight rows occupy no tokens and report their
    * boundary chunk twice (`greatest(w, 1)` keeps the arithmetic total
    * without letting an empty doc step backwards across a cut).
    */
  def concatPack(
      df: DataFrame,
      orderCol: String,
      weightCol: String,
      budget: Long,
      blockSize: Long = 4096L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    withStartOffset(df, orderCol, weightCol, blockSize)
      .withColumn("chunk_first", expr(s"start_offset div $budget"))
      .withColumn("chunk_last",
        expr(s"(start_offset + greatest($weightCol, 1L) - 1L) div $budget"))
  }
}
