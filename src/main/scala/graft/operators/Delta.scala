package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Snapshot-to-snapshot corpus diff — the incremental-ingest primitive
  * (daily crawl vs yesterday's corpus: what landed, what vanished, what
  * was edited).
  *
  * Scale shape: each side reduces to `(id, 32-byte canonical-form
  * fingerprint)` before the full-outer join, so the shuffle carries
  * fingerprints, never documents — diffing two 100 TB snapshots moves
  * ~2×(n·40 B). Comparison is by [[TextFunctions.fingerprint]]
  * (lower-cased, whitespace-collapsed md5), i.e. the same identity
  * exact-dedup uses: a formatting-only edit is `unchanged`.
  */
object Delta {

  /** One row per id present in either snapshot, with status
    * `added` / `removed` / `changed` / `unchanged`.
    *
    * Ids need not be unique within a snapshot: each side is reduced to
    * ONE fingerprint per id (the lexicographic min) before the join, so
    * duplicate ids can neither fan out the full-outer join nor emit
    * contradictory status rows. The groupBy adds no extra exchange —
    * the full-outer join repartitions on the id anyway, and the partial
    * aggregate shrinks what that shuffle carries.
    */
  def snapshotDiff(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      idCol: String = "doc_id",
      contentCol: String = "text"): DataFrame = {
    val o = oldDocs.select(col(idCol).as(idCol),
      TextFunctions.fingerprint(col(contentCol)).as("_fp_old"))
      .groupBy(idCol).agg(min("_fp_old").as("_fp_old"))
    val n = newDocs.select(col(idCol).as(idCol),
      TextFunctions.fingerprint(col(contentCol)).as("_fp_new"))
      .groupBy(idCol).agg(min("_fp_new").as("_fp_new"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("_fp_old").isNull, "added")
          .when(col("_fp_new").isNull, "removed")
          .when(col("_fp_old") === col("_fp_new"), "unchanged")
          .otherwise("changed"))
      .select(col(idCol), col("status"))
  }
}
