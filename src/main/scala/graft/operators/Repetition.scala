package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Repetition signals — the Gopher/C4-style quality filters that catch
  * degenerate machine-generated text (boilerplate loops, keyword spam,
  * template dumps) which length/punctuation heuristics miss. The
  * standard formulation scores each document by how concentrated and
  * how duplicated its word n-grams are; pipelines drop documents above
  * a threshold before training.
  *
  * The reference has no corpus-scale text scoring (its validation is
  * per-feature-record, e.g. etl/utils/shapefile_validation.py); this is
  * part of the LLM-data-pipeline surface this engine adds beyond the
  * reference, next to [[TextFunctions.qualityScore]] and the dedup
  * family.
  *
  * Scale design (100 TB): one spread exchange distributes the n-gram
  * build (see [[Dedup.spread]]), then a single hash aggregation per
  * (doc_id, gram) with map-side combine, then a per-doc rollup — the
  * shuffles carry (doc_id, gram, count) triples, never text. All
  * outputs are exact integer percents, so the DuckDB oracle (q62)
  * matches bit-for-bit.
  */
object Repetition {

  /** Per-document n-gram repetition signals. Output columns:
    *  - `n_grams`       total n-gram occurrences (positions, NOT distinct)
    *  - `top_gram_pct`  share of the single most frequent n-gram,
    *                    `100·max(count) div total` — high = one phrase
    *                    dominates (keyword spam)
    *  - `dup_gram_pct`  share of occurrences that are repeats of an
    *                    earlier gram, `100·(total−distinct) div total` —
    *                    high = looping/templated text
    *
    * Documents with fewer than `n` tokens produce no row (no n-grams —
    * same convention as [[TextFunctions.ngramsFromTokens]]).
    */
  def signals(docs: DataFrame, n: Int = 2): DataFrame = {
    val grams = Dedup
      .spread(docs.filter(TextFunctions.hasShingles(col("text"), n)), "doc_id")
      .withColumn("_tk", TextFunctions.loweredTokens(col("text")))
      // outer + post-filter: same inferred-filter guard as the dedup
      // operators (KernelPlanShapeSpec) — NOT deduplicated, the raw
      // position sequence is the repetition signal
      .select(col("doc_id"),
        explode_outer(TextFunctions.ngramsFromTokens(col("_tk"), n)).as("gram"))
      .filter(col("gram").isNotNull)
    grams
      .groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("total"), max(col("c")).as("top"),
        count(lit(1)).as("n_distinct"))
      .select(col("doc_id"), col("total").as("n_grams"),
        expr("(100 * top) div total").as("top_gram_pct"),
        expr("(100 * (total - n_distinct)) div total").as("dup_gram_pct"))
  }
}
