package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum sharding — order a corpus by a difficulty/quality score
  * and cut it into `nShards` contiguous, near-equal shards (easy→hard
  * training order, quality-tiered mixing, eval stratification).
  *
  * The shard of a row is a function of its GLOBAL rank under
  * (score, id) — a total order — but the rank is computed with the
  * q66 two-level prefix sum, not a global window: rows bucket by
  * (score, id div blockSize), bucket COUNTS prefix-sum through the one
  * tiny unpartitioned window (1/blockSize of the corpus, the same
  * allowlisted shape as [[Packing.withStartOffset]]), and the
  * intra-bucket rank window is partitioned by bucket. The corpus-size
  * scalar joins back as the sanctioned one-row broadcast (q42 shape).
  *
  * Shard id uses the NTILE identity `⌊(rn−1)·k/N⌋ + 1` (first
  * `N mod k` shards one row larger) in exact integer arithmetic, so an
  * external SQL oracle running the textbook ROW_NUMBER formulation
  * reproduces every assignment bit-for-bit.
  */
object Curriculum {

  /** Adds `rn` (1-based global rank under (scoreCol, idCol)) and
    * `shard` (1-based NTILE-equivalent shard id). `scoreCol` must be
    * integral; `idCol` must be a unique integral id (the tie-break).
    */
  def shardByScore(
      df: DataFrame,
      scoreCol: String,
      idCol: String,
      nShards: Int,
      blockSize: Long = 4096L): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val b = df.withColumn("_sb", expr(s"$idCol div $blockSize"))
    // bucket totals: one row per (score, sub-bucket); the ONLY
    // unpartitioned window runs over these totals
    val offsets = b.groupBy(col(scoreCol), col("_sb"))
      .agg(count(lit(1)).as("_bn"))
      .withColumn("_boff",
        coalesce(sum(col("_bn")).over(
          Window.orderBy(col(scoreCol), col("_sb"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(scoreCol), col("_sb"), col("_boff"))
    val intra = Window.partitionBy(col(scoreCol), col("_sb")).orderBy(col(idCol))
    val n = df.agg(count(lit(1)).as("_n"))
    b.join(offsets, Seq(scoreCol, "_sb"))
      .withColumn("rn", col("_boff") + row_number().over(intra))
      .crossJoin(broadcast(n)) // one-row corpus size (q42 shape)
      .withColumn("shard", expr(s"(rn - 1) * $nShards div _n + 1"))
      .drop("_sb", "_boff", "_n")
  }

  /** Token-budget corpus selection: keep the best-first prefix of the
    * corpus whose cumulative `weightCol` (token count) stays within
    * `budget` — the "select the highest-quality N-token subset"
    * step of a data-constrained pretraining run (quality-ranked
    * selection, fixed compute budget).
    *
    * Rows are globally ordered by (scoreCol, idCol) ASCENDING — pass a
    * negated score for best-first — and each row's INCLUSIVE cumulative
    * weight under that order is computed with the q66/q83 two-level
    * prefix sum: per-(score, sub-bucket) weight totals prefix-sum
    * through the one tiny unpartitioned window (1/blockSize of the
    * corpus — the allowlisted shape), while the intra-bucket running
    * sum is partitioned by bucket. No global sort, no corpus-wide
    * single-task window; a row is `selected` iff its cumulative weight
    * ≤ budget, so the cut is exactly the SQL
    * `SUM(w) OVER (ORDER BY score, id) <= budget` in integer
    * arithmetic.
    *
    * Adds `cum_weight` and `selected` (0/1). `scoreCol` and
    * `weightCol` must be integral; `idCol` a unique integral
    * tie-break.
    */
  def selectByBudget(
      df: DataFrame,
      scoreCol: String,
      idCol: String,
      weightCol: String,
      budget: Long,
      blockSize: Long = 4096L): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val b = df.withColumn("_sb", expr(s"$idCol div $blockSize"))
    // per-(score, sub-bucket) WEIGHT totals; the only unpartitioned
    // window prefix-sums these O(corpus/blockSize) rows
    val offsets = b.groupBy(col(scoreCol), col("_sb"))
      .agg(sum(col(weightCol)).as("_bw"))
      .withColumn("_boff",
        coalesce(sum(col("_bw")).over(
          Window.orderBy(col(scoreCol), col("_sb"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(scoreCol), col("_sb"), col("_boff"))
    val intra = Window.partitionBy(col(scoreCol), col("_sb"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(offsets, Seq(scoreCol, "_sb"))
      .withColumn("cum_weight", col("_boff") + sum(col(weightCol)).over(intra))
      .withColumn("selected", (col("cum_weight") <= budget).cast("long"))
      .drop("_sb", "_boff")
  }
}
