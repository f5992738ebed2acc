package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal — the CCNet-style "drop duplicated
  * lines across the corpus" pass that strips shared headers, footers,
  * navigation and legal text before training. This corpus has no
  * newlines, so the unit of deduplication is the disjoint fixed-width
  * token chunk ([[Chunking.slidingWindows]] with stride = window): a
  * chunk is KEPT iff it is the canonical (first) occurrence of its
  * fingerprint corpus-wide, canonical = lowest (doc_id, chunk_id).
  *
  * Scale shape: the only shuffle moves (fp, doc_id, chunk_id) triples —
  * 32-byte fingerprints, never chunk text (the md5 is computed in the
  * scan stage and the text column dropped before the exchange). The
  * canonical pick is a groupBy-min + fingerprint equi-join (the
  * [[Dedup.exactDedup]] idiom), not a corpus-wide window; the per-doc
  * rollup shuffles pre-combined (doc_id, counts) partials.
  */
object Boilerplate {

  /** (doc_id, chunk_id, fp) for every disjoint `window`-token chunk. */
  def chunkFingerprints(docs: DataFrame, window: Int): DataFrame =
    Chunking.slidingWindows(docs, window, window)
      .select(col("doc_id"), col("chunk_id"), md5(col("chunk_text")).as("fp"))

  /** Per-document boilerplate stats: total chunks, chunks kept (their
    * fingerprint's canonical occurrence), chunks dropped as duplicates
    * of an earlier document's chunk. Documents with no tokens produce
    * no row (they have no chunks).
    */
  def dedupStats(docs: DataFrame, window: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    // STAGED: `ch` is consumed twice (canonical-pick aggregate + the
    // fingerprint join), and without materialization each consumer
    // re-runs the whole chunking + md5 kernel over the corpus text —
    // the plan showed two full parquet scans of the text column. One
    // materialization of 48-byte (fp, doc_id, chunk_id) triples buys
    // the text pass exactly once at any scale.
    val ch = graft.util.Checkpoints.stage(
      chunkFingerprints(docs, window),
      checkpointDir.orElse(
        graft.util.Checkpoints.configured(docs.sparkSession)))
    val canon = ch.groupBy("fp")
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("keep"))
    ch.join(canon, Seq("fp"))
      .withColumn("kept",
        col("doc_id") === col("keep.doc_id") && col("chunk_id") === col("keep.chunk_id"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"))
  }
}
