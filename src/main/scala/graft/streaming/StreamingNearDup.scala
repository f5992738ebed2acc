package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Streaming near-dup INGESTION — the continuous form of
  * [[graft.operators.Dedup.incrementalNearDupPairs]]: a live document
  * stream (a crawl feed) deduped against the persisted MinHash band
  * index of the standing corpus, inside a real Structured Streaming
  * query.
  *
  * Scale shape (unbounded ingest):
  *  - the minhash signature is a pure Catalyst expression
  *    ([[graft.plans.MinHashSigExpr]]) — map-only on the stream, legal
  *    in any output mode;
  *  - candidate generation is a STREAM-STATIC inner join (stateless by
  *    construction: Spark plans the static side as a fresh batch scan
  *    per micro-batch) against the bk-bucketed index, so only the
  *    micro-batch's band rows move;
  *  - the only STATE is the (new_doc, dup_of) pair dedup —
  *    `dropDuplicatesWithinWatermark`, bounded to the watermark horizon
  *    (a pair's band collisions all arrive with the pair's document, so
  *    a horizon covering one document's dwell time suffices);
  *  - signature verification is a second stateless stream-static join
  *    against the doc_id-bucketed sig table.
  *
  * Batch/stream parity: on a static frame the same call degrades to
  * plain distinct (Spark rejects the watermark variant outside
  * streaming), and the emitted (new_doc, dup_of, n_match) set equals
  * the batch operator's — q108 holds the drained stream to the SAME
  * DuckDB oracle as batch q106.
  */
object StreamingNearDup {

  def nearDupsAgainstIndex(
      docs: DataFrame,
      bandsTable: String,
      sigsTable: String,
      eventTimeCol: String = "event_time",
      horizon: String = "10 hours",
      shingleN: Int = 3,
      bands: Int = 16,
      rows: Int = 4,
      minEstJaccardPct: Int = 50,
      maxBucketSize: Int = 100,
      seed: Long = 7L): DataFrame = {
    val spark  = docs.sparkSession
    val sigLen = bands * rows
    val sigs = docs
      .filter(TextFunctions.hasShingles(col("text"), shingleN))
      .withColumn("_tk", TextFunctions.loweredTokens(col("text")))
      .select(col(eventTimeCol), col("doc_id").as("new_doc"),
        graft.plans.MinHashSigExpr(
          TextFunctions.shinglesFromTokens(col("_tk"), shingleN),
          seed, sigLen).as("sig_a"))
    val banded = sigs.select(col(eventTimeCol), col("new_doc"), col("sig_a"),
      explode(Dedup.bandKeyArray(col("sig_a"), bands, rows)).as("bk"))
    val candidates = banded
      .join(Dedup.cappedBandIndex(spark, bandsTable, maxBucketSize), "bk")
      .select(col(eventTimeCol), col("new_doc"),
        col("doc_id").as("dup_of"), col("sig_a"))
    val distinctPairs =
      if (docs.isStreaming)
        candidates.withWatermark(eventTimeCol, horizon)
          .dropDuplicatesWithinWatermark("new_doc", "dup_of")
      else candidates.dropDuplicates("new_doc", "dup_of")
    distinctPairs
      .join(Dedup.liveIndexTable(spark, sigsTable, bandsTable)
        .select(col("doc_id").as("dup_of"), col("sig").as("sig_b")), "dup_of")
      .withColumn("n_match",
        size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _), x => x)).cast("long"))
      .filter(lit(100L) * col("n_match") >= lit(minEstJaccardPct.toLong * sigLen))
      .select(col("new_doc"), col("dup_of"), col("n_match"))
  }

  /** Run the real streaming ingestion dedup over a STATIC frame via
    * [[FileStreamDrain]] — the driver-gate hook (q108). No heartbeat
    * batch: `dropDuplicatesWithinWatermark` emits first-seen rows
    * immediately (the watermark only bounds state), so the drain's two
    * staged batches flush completely on their own.
    */
  def drainNearDups(
      docs: DataFrame,
      bandsTable: String,
      sigsTable: String,
      eventTimeCol: String = "event_time",
      horizon: String = "10 hours"): DataFrame =
    FileStreamDrain.drain(docs,
      nearDupsAgainstIndex(_, bandsTable, sigsTable, eventTimeCol, horizon))
}
