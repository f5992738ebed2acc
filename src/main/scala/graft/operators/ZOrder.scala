package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.ZValueExpr

/** Z-order (Morton-curve) layout — multi-dimensional data skipping:
  * sort the table by the interleaved z-value of two filter columns so
  * parquet row-group min/max stats stay tight in BOTH dimensions, and a
  * box predicate on either/both columns decodes only the row groups
  * whose stats overlap it. The single-column alternative (`sortBy(a)`)
  * skips on `a` but leaves `b`'s per-row-group ranges full-width; the
  * z-curve splits the skipping power across dimensions.
  *
  * Layout is SEMANTICS-FREE: queries over the z-ordered copy return
  * exactly what they return over any layout (the q75 bucketing
  * contract) — the z-value is never a result column. What the layout
  * buys is measured, not assumed: ZOrderSpec decodes the same box
  * filter against a z-ordered and an id-sorted copy and asserts the
  * z-ordered scan outputs a fraction of the rows.
  *
  * At 100 TB: `repartitionByRange` on the z-value range-partitions the
  * ingest (one shuffle, AQE-sized), each task writes locally-sorted
  * files, and every later box query prunes at three levels — files (via
  * range partitioning), row groups (parquet stats), and pages.
  */
object ZOrder {

  /** The clustering key: z-interleave of two bigint columns.
    * See [[graft.plans.ZValueExpr]] for the wrap-don't-fail contract.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = ZValueExpr(a, b, bits)

  /** Write `df` z-ordered on (`colA`, `colB`) as parquet under `path`.
    * `rowGroupBytes` sizes parquet row groups — smaller groups = finer
    * skipping granularity at more footer overhead (production default
    * 128 MB; specs use small groups to get many groups from small
    * fixtures).
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      bits: Int,
      rowGroupBytes: Long = 128L * 1024 * 1024): Unit =
    df.withColumn("_z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write
      .option("parquet.block.size", rowGroupBytes)
      .mode("overwrite")
      .parquet(path)

  /** Idempotent z-ordered copy of `df` keyed by `srcTag` (the
    * [[Bucketing.ensureBucketed]] contract applied to a path layout):
    * same tag + layout → reuse the files; anything else rewrites.
    * Returns the path to read.
    */
  def ensureZOrdered(
      df: DataFrame,
      colA: String,
      colB: String,
      bits: Int,
      srcTag: String,
      rowGroupBytes: Long = 128L * 1024 * 1024): String = {
    val key = s"$srcTag|z=$colA,$colB|b=$bits|g=$rowGroupBytes|${df.schema.catalogString}"
    val digest = MessageDigest.getInstance("MD5")
      .digest(key.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
    val path = s"${sys.props("java.io.tmpdir")}/graft_zorder_$digest"
    val marker = new java.io.File(s"$path/_SUCCESS")
    if (!marker.isFile)
      writeZOrdered(df, path, colA, colB, bits, rowGroupBytes)
    path
  }

  /** Rows DECODED by the scan feeding `df` (sum of the leaf scans'
    * numOutputRows after executing the plan) — the observable
    * row-group-skipping measure ZOrderSpec asserts on. Caller must run
    * with AQE disabled so the leaves are reachable on the executed plan.
    */
  def scanRowsDecoded(df: DataFrame): Long = {
    val plan = df.queryExecution.executedPlan
    plan.execute().count() // execute THIS plan so its metrics populate
    plan.collectLeaves().flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
  }
}
