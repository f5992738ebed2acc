package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-document keyword extraction by tf·idf rank — the document
  * summarization / topic-tagging primitive of a text pipeline.
  *
  * The idf is EXACT INTEGER arithmetic: `idf_micro = (10^6 · N) div df`
  * (≥ 10^6; rarer ⇒ larger), `score = tf · idf_micro` — no logarithm,
  * so the ranking is bit-reproducible by an external SQL oracle (the
  * same exactness contract as [[Sampling]]/[[Mixing]]). Rank ties break
  * on token text ascending — a total order.
  *
  * Scale shape: one groupBy reduces token occurrences to (doc, token)
  * tf pairs; document frequency is a second groupBy of THAT (token
  * keys only); N is a one-row aggregate broadcast back (the q42
  * scalar-subquery shape, sanctioned in CartAuditSpec); the tf⋈df join
  * shuffles on the token key with AQE handling stopword skew; the
  * final top-k is a window PARTITIONED BY doc_id (never global).
  */
object Keywords {

  /** Top-`k` keywords per document: (doc_id, rnk, tok, tf_t, df_t,
    * score). Empty documents produce no rows.
    *
    * EAGER-MATERIALIZATION contract: building this operator runs the
    * tokenize+tf aggregation NOW ([[graft.util.Checkpoints.stage]] is
    * eager by design — both downstream legs must read the staged table,
    * not re-derive it), and the staged blocks live until the session's
    * checkpoint cleanup. A long-lived driver constructing many of
    * these should use [[tfidfTopKOwned]] and release each handle after
    * consuming the result — that returns executor block storage to its
    * baseline instead of accumulating one staged tf table per call.
    * The trade is deliberate: one corpus pass instead of one per leg.
    */
  def tfidfTopK(docs: DataFrame, k: Int): DataFrame =
    tfidfTopKOwned(docs, k)._1

  /** [[tfidfTopK]] with a CALLER-OWNED lifetime for the staged tf
    * table: consume the result frame, then `release()` the handle —
    * the staged blocks are freed and the result frame becomes
    * unusable (its inputs are gone). The repeated-call lifecycle for
    * a long-lived serving driver.
    */
  def tfidfTopKOwned(
      docs: DataFrame, k: Int): (DataFrame, graft.util.Checkpoints.Staged) = {
    val toks = docs
      .select(col("doc_id"), explode(TextFunctions.loweredTokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    // staged: the join probe and the document-frequency counts both
    // read tf — one tokenize+aggregate pass instead of one per leg
    // (the q89/q83 multi-scan lesson)
    val staged = graft.util.Checkpoints.stageOwned(
      toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf_t")))
    val tf  = staged.df
    val dfT = tf.groupBy("tok").agg(count(lit(1)).as("df_t"))
    val n   = docs.agg(count(lit(1)).as("n_docs"))
    val w   = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    val out = tf.join(dfT, Seq("tok"))
      .crossJoin(broadcast(n)) // one-row corpus size (q42 shape)
      .withColumn("score", col("tf_t") * expr("(1000000 * n_docs) div df_t"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("tok"), col("tf_t"), col("df_t"), col("score"))
    (out, staged)
  }
}
