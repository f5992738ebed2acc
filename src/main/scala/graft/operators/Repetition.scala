package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale design (100 TB): every signal here is a PER-DOCUMENT fact
  * over tokens that already sit in the document's own row, so both
  * entry points are map-only — one native kernel pass per row
  * ([[graft.plans.NgramStatsExpr]] / [[graft.plans
  * .RepetitionStatsExpr]]), no explode, no shuffle; a pre-dedup drop
  * filter consumes the flags row-locally. All outputs are exact
  * integer percents/permilles, so the DuckDB oracles (q62/q102) match
  * bit-for-bit.
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
    *
    * Map-only: every statistic is a per-document fact over tokens that
    * already sit in the document's own row, so the counts come from
    * ONE native pass ([[graft.plans.NgramStatsExpr]]) — no explode, no
    * shuffle. The original explode → groupBy(doc, gram) formulation
    * (kept as [[signalsComposed]] for the differential spec) shuffled
    * every gram of the corpus only to regroup row-local data, and was
    * the top scaler in the sf1.0 report (8.7×) for it.
    */
  def signals(docs: DataFrame, n: Int = 2): DataFrame =
    docs
      .withColumn("_s", graft.plans.NgramStatsExpr(col("text"), n))
      .select(col("doc_id"),
        col("_s.n_grams").as("n_grams"),
        col("_s.top_gram").as("_top"),
        col("_s.d_grams").as("_d"))
      // the kernel's own count is the "has n-grams" filter: it is
      // provably equivalent to a hasShingles pre-filter (both count
      // post-trim tokens) but reuses the already-computed n_grams
      // instead of tokenizing the text a second time
      .filter(col("n_grams") >= 1)
      .select(col("doc_id"), col("n_grams"),
        expr("(100 * _top) div n_grams").as("top_gram_pct"),
        expr("(100 * (n_grams - _d)) div n_grams").as("dup_gram_pct"))

  /** The original explode → groupBy(doc, gram) formulation of
    * [[signals]] — kept as the differential oracle for
    * [[graft.plans.NgramStatsExpr]] (the spec asserts kernel ≡
    * composed), NOT a production path: it shuffles (doc, gram, count)
    * triples for per-row facts.
    */
  private[graft] def signalsComposed(docs: DataFrame, n: Int = 2): DataFrame = {
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

  /** Max run length in a pre-SORTED string array — equals the max
    * element multiplicity. Single linear `aggregate` fold carrying
    * (prev, run, best); empty arrays yield 0.
    */
  private def maxRunSorted(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))

  /** Per-document repetition PROFILE — the full Gopher rule set (dup
    * 2-gram AND 3-gram fractions, top-word concentration, lexical
    * diversity) in ONE map-only pass, plus the drop flag. Complements
    * [[signals]]: that one measures a single n and finds the per-doc
    * top GRAM via a (doc, gram) shuffle with map-side combine; this one
    * computes every count in ONE native pass per row ([[graft.plans
    * .RepetitionStatsExpr]], the q54/q89 fusion move — measured 4×
    * over the staged higher-order-function form kept as
    * [[profileComposed]]) — the corpus never explodes and NOTHING
    * shuffles, which is the shape a 100 TB pre-dedup drop filter wants
    * (the filter consumes the flag row-locally; no agg needed).
    *
    * All signals are exact integer permilles, bit-reproducible in SQL:
    *  - `distinct_permille`  1000·|distinct words| div |words|
    *  - `top_word_permille`  1000·max unigram count div |words|
    *  - `dup2_permille` / `dup3_permille`
    *                         1000·(occurrences − distinct) div occurrences
    *  - `repetitive`         1 when dup2 ≥ `dup2MaxPermille` or top-word
    *                         ≥ `topWordMaxPermille`
    * Degenerate docs (< n words) report 0 for the affected signals and
    * DO emit a row (unlike [[signals]] — a drop filter must see every
    * document).
    */
  def profile(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      dup2MaxPermille: Long = 60L,
      topWordMaxPermille: Long = 120L): DataFrame =
    permilles(
      docs
        .withColumn("_r", graft.plans.RepetitionStatsExpr(col(textCol)))
        .select(
          col(idCol),
          col("_r.n_words").as("n_words"),
          col("_r.d1").as("_d1"),
          col("_r.maxw").as("_maxw"),
          col("_r.n2").as("_n2"),
          col("_r.d2").as("_d2"),
          col("_r.n3").as("_n3"),
          col("_r.d3").as("_d3")),
      idCol, dup2MaxPermille, topWordMaxPermille)

  /** The original `functions._` formulation of [[profile]] — staged
    * token/n-gram attributes, array_distincts over gram strings, the
    * sorted max-run fold. Kept as the differential oracle for
    * [[graft.plans.RepetitionStatsExpr]] (the spec asserts kernel ≡
    * composed on fixture and edge corpora, the [[graft.plans
    * .WinnowFpExpr]] pattern), NOT a production path: five interpreted
    * higher-order-function walks per row cost 4× the fused kernel.
    */
  private[graft] def profileComposed(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      dup2MaxPermille: Long = 60L,
      topWordMaxPermille: Long = 120L): DataFrame = {
    val toks = TextFunctions.loweredTokens(col(textCol))
    permilles(
      docs
        .withColumn("_w", when(length(trim(col(textCol))) === 0,
          array().cast("array<string>")).otherwise(toks))
        .withColumn("_g2", TextFunctions.ngramsFromTokens(col("_w"), 2))
        .withColumn("_g3", TextFunctions.ngramsFromTokens(col("_w"), 3))
        .select(
          col(idCol),
          size(col("_w")).cast("long").as("n_words"),
          size(array_distinct(col("_w"))).cast("long").as("_d1"),
          maxRunSorted(array_sort(col("_w"))).as("_maxw"),
          size(col("_g2")).cast("long").as("_n2"),
          size(array_distinct(col("_g2"))).cast("long").as("_d2"),
          size(col("_g3")).cast("long").as("_n3"),
          size(array_distinct(col("_g3"))).cast("long").as("_d3")),
      idCol, dup2MaxPermille, topWordMaxPermille)
  }

  /** Shared permille/flag projection over the staged count columns
    * (idCol, n_words, _d1, _maxw, _n2, _d2, _n3, _d3) — exact integer
    * `div`, zero-guarded for degenerate docs.
    */
  private def permilles(
      counts: DataFrame,
      idCol: String,
      dup2MaxPermille: Long,
      topWordMaxPermille: Long): DataFrame =
    counts
      .select(
        col(idCol), col("n_words"),
        when(col("n_words") <= 0, lit(0L))
          .otherwise(expr("1000 * _d1 div n_words")).as("distinct_permille"),
        when(col("n_words") <= 0, lit(0L))
          .otherwise(expr("1000 * _maxw div n_words")).as("top_word_permille"),
        when(col("_n2") <= 0, lit(0L))
          .otherwise(expr("1000 * (_n2 - _d2) div _n2")).as("dup2_permille"),
        when(col("_n3") <= 0, lit(0L))
          .otherwise(expr("1000 * (_n3 - _d3) div _n3")).as("dup3_permille"))
      .withColumn("repetitive",
        (col("dup2_permille") >= dup2MaxPermille ||
          col("top_word_permille") >= topWordMaxPermille).cast("long"))
}
