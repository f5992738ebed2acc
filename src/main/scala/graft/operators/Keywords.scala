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
    * checkpoint cleanup (localCheckpoint blocks are session-scoped; a
    * long-lived driver constructing many of these should reuse the
    * returned frame rather than re-calling per query). The trade is
    * deliberate: one corpus pass instead of one per leg.
    */
  def tfidfTopK(docs: DataFrame, k: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(TextFunctions.loweredTokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    // staged: the join probe and the document-frequency counts both
    // read tf — one tokenize+aggregate pass instead of one per leg
    // (the q89/q83 multi-scan lesson)
    val tf  = graft.util.Checkpoints.stage(
      toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf_t")))
    val dfT = tf.groupBy("tok").agg(count(lit(1)).as("df_t"))
    val n   = docs.agg(count(lit(1)).as("n_docs"))
    val w   = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    tf.join(dfT, Seq("tok"))
      .crossJoin(broadcast(n)) // one-row corpus size (q42 shape)
      .withColumn("score", col("tf_t") * expr("(1000000 * n_docs) div df_t"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("tok"), col("tf_t"), col("df_t"), col("score"))
  }
}
