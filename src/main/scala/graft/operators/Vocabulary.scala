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

  /** The counting kernel of one BPE merge iteration (Sennrich, Haddow
    * & Birch 2016): adjacent character-pair frequencies over the
    * corpus, with the next merge at the head of the list
    * (count desc, pair asc — a total order).
    *
    * Computed from the VOCABULARY, not the corpus: the corpus first
    * collapses to O(|vocab|) (word, frequency) rows — one shuffle on
    * the word — and the per-word character scan then runs over UNIQUE
    * words, each pair weighted by the word's corpus frequency. That
    * factoring is what makes distributed BPE feasible: a 100 TB corpus
    * with a 10 M-word vocabulary does 10 M short character scans, not
    * 10 T. (The `transform(sequence(...))` pair generator is
    * interpreted HOF, but it runs on vocabulary rows — off the
    * per-occurrence hot path the q89 fusion lesson is about.)
    */
  def bpePairCounts(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(explode(TextFunctions.loweredTokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("wf"))
      // length-1 words carry no pair; the guard also keeps
      // sequence(1, 0) from going DESCENDING (the q54 pitfall)
      .filter(length(col("tok")) >= 2)
      .select(col("wf"), explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum("wf").as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)

  /** Per-document unigram surprisal — the language-model-free
    * perplexity proxy: how "surprising" a document's tokens are under
    * the corpus' own unigram distribution. Rare-token-heavy documents
    * (jargon, gibberish, other-language) score high; stopword soup
    * scores low.
    *
    * Surprisal is measured in WHOLE BITS so the score is exact integer
    * arithmetic end to end: token surprisal
    * `s(w) = ⌊log₂ total⌋ − ⌊log₂ cnt(w)⌋` (the bit-length gap between
    * the corpus size and the token's occurrence count — a floor of the
    * real −log₂ p(w) within ±1 bit), and the document score is the
    * tf-weighted integer mean `(Σ tf·s) div (Σ tf)`.
    *
    * `⌊log₂ n⌋` via double log2 is exact here in BOTH engines: a
    * non-power-of-two integer n ≤ 2^40 keeps log₂ n at least
    * |log₂(2^k±1) − k| ≈ 2^−k/ln 2 ≥ 2^−40.5 away from the nearest
    * floor boundary (and exact powers of two hit it exactly), which
    * is ~10^3 × a 1-ulp libm error at this magnitude — no rounding
    * can cross the floor. Counts beyond 2^40 (a quadrillion-token
    * corpus) would need the bit-length form instead.
    *
    * Scale shape: token occurrences reduce to (doc, token) tf pairs
    * (map-side combine); corpus counts are a second groupBy of THAT
    * keyed by token; the one-row total broadcasts back (q42 shape);
    * the tf⋈cnt join shuffles on the token key; the final rollup
    * shuffles pre-combined per-doc partials. The corpus text itself
    * never shuffles.
    */
  def surprisalScore(docs: DataFrame): DataFrame = {
    // staged for the same reason as [[bigramSurprisalScore]]: the join
    // probe, the corpus counts and the total all read tf — one
    // tokenize+aggregate pass instead of one per leg
    val tf = graft.util.Checkpoints.stage(docs
      .select(col("doc_id"), explode(TextFunctions.loweredTokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf_t")))
    val cnt = tf.groupBy("tok").agg(sum("tf_t").as("cnt"))
    val tot = cnt.agg(sum("cnt").as("total"))
    tf.join(cnt, Seq("tok"))
      .crossJoin(broadcast(tot)) // one-row corpus total (q42 shape)
      .withColumn("sbits",
        (floor(log2(col("total").cast("double"))) -
          floor(log2(col("cnt").cast("double")))).cast("long"))
      .groupBy("doc_id")
      .agg(sum("tf_t").as("n_tok"),
        expr("sum(tf_t * sbits) div sum(tf_t)").as("avg_surprisal_bits"))
  }

  /** Per-document BIGRAM (conditional) surprisal — the order-sensitive
    * refinement of [[surprisalScore]]: how surprising each token is
    * GIVEN its predecessor, under the corpus' own bigram counts. A
    * document of common words in an uncommon order (shuffled text,
    * keyword stuffing, template glitches) scores high here while
    * unigram surprisal stays low — the fluency axis a bag-of-words
    * score cannot see.
    *
    * Same whole-bit exactness contract as [[surprisalScore]]:
    * `s(w|p) = ⌊log₂ cnt(p·)⌋ − ⌊log₂ cnt(p,w)⌋` (context count over
    * bigram count — a floor of −log₂ p(w|p) within ±1 bit), document
    * score `(Σ tf·s) div (Σ tf)` over bigram positions. The context
    * count is derived FROM the bigram table (occurrences of p in
    * non-final position), so the conditional distribution sums to one
    * by construction. Documents with fewer than two tokens have no
    * bigrams and emit no row.
    *
    * Scale shape: the corpus reduces to (doc, prev, cur, tf) rows
    * INSIDE the scan stage — [[graft.plans.BigramTfExpr]] counts each
    * document's distinct adjacent pairs in one fused native pass, so
    * the explode emits per-doc tf rows directly and no doc-keyed
    * aggregation exchange ever exists in the plan (the composed
    * `transform(sequence(...))` + explode + groupBy form this fused is
    * pinned equal to in VocabularySpec). Corpus bigram counts and
    * context counts are groupBys of THAT (token-key shuffles of count
    * rows, the q80 shape); the text itself never shuffles.
    */
  /** Per-document distinct bigram term frequencies
    * `(doc_id, prev, cur, tf_t)` via the fused
    * [[graft.plans.BigramTfExpr]] kernel. The token array is staged
    * once per row (the q54 lesson) and handed to ONE codegen call; the
    * explode that follows emits a row per distinct per-doc pair with
    * its count already attached.
    */
  def bigramTf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    docs
      .select(col("doc_id"), TextFunctions.loweredTokens(col("text")).as("_tk"))
      .filter(size(col("_tk")) >= 2)
      .select(col("doc_id"),
        explode(column(graft.plans.BigramTfExpr(expression(col("_tk"))))).as("_b"))
      .select(col("doc_id"), col("_b.prev").as("prev"),
        col("_b.cur").as("cur"), col("_b.tf").as("tf_t"))
  }

  def bigramSurprisalScore(docs: DataFrame): DataFrame = {
    // stage the per-doc tf table ONCE: the probe leg, the bigram counts
    // and the context counts all derive from it, and without the
    // checkpoint each leg re-runs the corpus scan + fused kernel (the
    // committed PLANS.md dump showed three parquet scans; the q83/
    // collocations lesson). tf is count rows — corpus-order bytes, one
    // kernel pass instead of three.
    val tf = graft.util.Checkpoints.stage(bigramTf(docs))
    val cbg  = tf.groupBy("prev", "cur").agg(sum("tf_t").as("cnt_bg"))
    val cctx = cbg.groupBy("prev").agg(sum("cnt_bg").as("cnt_ctx"))
    tf.join(cbg, Seq("prev", "cur")).join(cctx, Seq("prev"))
      .withColumn("sbits",
        (floor(log2(col("cnt_ctx").cast("double"))) -
          floor(log2(col("cnt_bg").cast("double")))).cast("long"))
      .groupBy("doc_id")
      .agg(sum("tf_t").as("n_bigrams"),
        expr("sum(tf_t * sbits) div sum(tf_t)").as("avg_bigram_bits"))
  }

  /** Top-`k` collocations — adjacent word pairs that co-occur far more
    * often than their parts' frequencies predict — ranked by pointwise
    * mutual information in WHOLE BITS (Church & Hanks 1990), the
    * classic phrase-mining signal ("new york", "machine learning") a
    * tokenizer or query-expansion table is seeded from.
    *
    * Exactness contract: every term is a `⌊log₂ count⌋` on a RAW count
    * (never a product, which could overflow the 2^40 exactness bound
    * [[surprisalScore]] documents), so
    * `pmi_bits = ⌊log₂ N⌋ + ⌊log₂ c_ab⌋ − ⌊log₂ c_a⌋ − ⌊log₂ c_b⌋`
    * is exact integer arithmetic in both engines and sits within ±2
    * bits of true `log₂ (N·c_ab)/(c_a·c_b)`. Counts are all derived
    * from the one bigram table: `c_a` = occurrences of `a` as left
    * token, `c_b` = occurrences of `b` as right token, `N` = total
    * bigram positions — each marginal sums to `N` by construction.
    *
    * Scale shape: the corpus collapses to (prev, cur, cnt) count rows
    * via the fused [[bigramTf]] kernel (text never shuffles); the
    * `minCount` support filter prunes the pair table BEFORE the two
    * marginal joins (token-keyed shuffles of count rows — the q80
    * shape); the one-row total broadcasts (q42 shape); the ranked
    * head is a TakeOrdered, k rows to the driver.
    */
  def collocations(docs: DataFrame, minCount: Long, k: Int): DataFrame =
    // materialize the pair-count table ONCE: marginals, total and the
    // ranked head all derive from it, and without the checkpoint each
    // leg re-runs the corpus scan + bigram kernel (the q83 lesson —
    // three scans showed up in the committed PLANS.md dump). The pair
    // table is token²-bounded count rows, orders of magnitude smaller
    // than the corpus it summarizes; set spark.graft.checkpointDir to
    // keep it on reliable cluster storage. A repeated-mining deployment
    // should instead write [[bigramPairCounts]] at ingest and call
    // [[collocationsFromPairs]] per query (the q75/q84 pay-once shape).
    collocationsFromPairs(
      graft.util.Checkpoints.stage(bigramPairCounts(docs)), minCount, k)

  /** The (prev, cur, cnt_bg) bigram pair-count table [[collocations]]
    * mines from — factored out so ingest can materialize it once (a
    * bucketed table keyed on `prev` keeps the left-marginal aggregation
    * shuffle-free) and repeated mining runs read it instead of
    * re-scanning the corpus.
    */
  def bigramPairCounts(docs: DataFrame): DataFrame =
    bigramTf(docs).groupBy("prev", "cur").agg(sum("tf_t").as("cnt_bg"))

  /** [[collocations]] over an already-materialized pair-count table
    * (from [[bigramPairCounts]]): marginals + PMI + ranked head only —
    * no corpus scan, no checkpoint.
    */
  def collocationsFromPairs(cbg: DataFrame, minCount: Long, k: Int): DataFrame = {
    val cl = cbg.groupBy("prev").agg(sum("cnt_bg").as("cnt_l"))
    val cr = cbg.groupBy("cur").agg(sum("cnt_bg").as("cnt_r"))
    val tot = cbg.agg(sum("cnt_bg").as("total"))
    cbg.filter(col("cnt_bg") >= minCount)
      .join(cl, Seq("prev")).join(cr, Seq("cur"))
      .crossJoin(broadcast(tot)) // one-row corpus total (q42 shape)
      .withColumn("pmi_bits",
        (floor(log2(col("total").cast("double"))) +
          floor(log2(col("cnt_bg").cast("double"))) -
          floor(log2(col("cnt_l").cast("double"))) -
          floor(log2(col("cnt_r").cast("double")))).cast("long"))
      .select(col("prev"), col("cur"), col("cnt_bg"), col("pmi_bits"))
      // (prev, cur) is unique after the groupBy, so the tie-break is a
      // total order and the head deterministic cross-engine
      .orderBy(col("pmi_bits").desc, col("cnt_bg").desc, col("prev"), col("cur"))
      .limit(k)
  }

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
