package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-relative vocabulary signals: the quality filters that need a
  * global pass over the corpus before they can score a document
  * (complementing `TextFunctions.qualityScore`, which is per-row).
  *
  * Scale shape: the vocabulary is a groupBy + deterministic top-K
  * (TakeOrdered — partial per partition, K rows to the driver), then a
  * BROADCAST membership probe; scoring is one map-side pass over token
  * occurrences with a map-side-combining groupBy on doc_id. No join
  * ever shuffles the corpus on a token key.
  */
object Vocabulary {

  /** Top-`k` tokens by occurrence count, ties broken by token text —
    * a total order, so the vocabulary is deterministic cross-engine.
    */
  def topTokens(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(explode(TextFunctions.loweredTokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok"))
      .limit(k)

  /** Per-document out-of-vocabulary rate against the corpus' own top-`k`
    * vocabulary: `oov_pct = ⌊100·n_oov/n_tok⌋` over token OCCURRENCES
    * (a high rate flags gibberish, boilerplate codes, or wrong-language
    * text relative to the corpus norm). Documents with no tokens are
    * excluded — they have no rate.
    */
  def oovRate(docs: DataFrame, vocabSize: Int): DataFrame = {
    val vocab = topTokens(docs, vocabSize).select(col("tok"), lit(1L).as("_in"))
    docs
      .select(col("doc_id"), explode(TextFunctions.loweredTokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_pct",
        floor(lit(100.0) * col("n_oov") / col("n_tok")).cast("long"))
  }
}
