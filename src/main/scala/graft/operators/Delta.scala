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

  /** Apply a CDC change set to a base snapshot — the MERGE/upsert
    * counterpart of [[snapshotDiff]] (diff produces the change set,
    * applyChanges replays it): a change row either upserts its id
    * (replacing the base row, or inserting if absent) or, when
    * `deleteCol` is true, deletes it. `changes` must carry the base
    * schema plus the boolean `deleteCol`.
    *
    * Duplicate change ids are compacted deterministically before the
    * merge — delete wins, then the lexicographically greatest payload
    * (a total order, so the result is partition-independent; the
    * well-formed CDC input has one row per id and is unaffected).
    *
    * Scale shape: the change set is compacted with one groupBy on the
    * id, then the base is pruned with a left-anti equi-join on the same
    * key (the two exchanges share the partitioning; a broadcast anti
    * join applies when the change set is small) and survivors union
    * with the upserts — the base table is never shuffled twice and no
    * row carries more than its own payload. With the base bucketed on
    * the id (q75's layout) the base-side exchange disappears entirely.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      idCol: String = "doc_id",
      deleteCol: String = "is_delete"): DataFrame = {
    val dataCols = base.columns.filter(_ != idCol).toSeq
    require(changes.columns.toSet == (dataCols.toSet + idCol + deleteCol),
      s"changes must have base schema + $deleteCol")
    val compact = changes
      .groupBy(col(idCol))
      .agg(max(struct((deleteCol +: dataCols).map(col): _*)).as("_c"))
    val survivors = base.join(compact.select(col(idCol)), Seq(idCol), "left_anti")
    // upserts: non-delete compacted changes, re-flattened to base schema
    compact
      .filter(!col(s"_c.$deleteCol"))
      .select(col(idCol) +: dataCols.map(c => col(s"_c.$c").as(c)): _*)
      .unionByName(survivors.select(col(idCol) +: dataCols.map(col): _*))
  }
}
