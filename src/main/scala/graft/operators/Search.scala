package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Lexical (inverted-index) search — the serving-path complement of the
  * ANN family: build a term→document index once at ingest, answer
  * conjunctive keyword queries from the index without touching document
  * text.
  *
  * The index is a (tok, doc_id) PAIR TABLE, not per-token posting
  * arrays: a 100 TB corpus puts billions of documents behind a stopword,
  * and a collect_list row of that size is an executor OOM by
  * construction — the pair-table form keeps every row O(1), buckets by
  * `tok` ([[Bucketing]]) for shuffle-free term lookup, and lets the
  * term filter push down to the scan. (The array form is the textbook
  * single-node layout; this is its distributed normalization.)
  *
  * AND queries use the count-intersection identity: a document matches
  * k terms iff it carries k distinct index rows among them — one
  * scan-pushed `tok IN (...)` filter, one groupBy on the candidate
  * doc_ids (only documents containing at least one query term ever
  * enter the shuffle).
  */
object Search {

  /** Persisted serving-path table names (bucketed by `tok`). */
  val IndexTable  = "graft_search_index"
  val PosTable    = "graft_search_pos"
  val TfTable     = "graft_search_tf"
  val ScoredTable = "graft_search_scored"

  /** Persist all three index tables bucketed by `tok` — the serving
    * path the header scaladoc describes: tokenize the corpus ONCE at
    * ingest, answer every query from the persisted index without
    * touching document text. Bucketing by `tok` buys two observable
    * plan guarantees (SearchIndexPlanSpec pins both): a term lookup
    * (`tok IN (...)`) prunes to the matching buckets at the SCAN
    * (SelectedBucketsCount < total — on a 100 TB index only the query
    * terms' buckets are ever read), and per-token rollups (document
    * frequencies) consume the bucket partitioning with NO exchange.
    * Idempotent per the [[Bucketing.ensureBucketed]] source-tag
    * contract: reruns over the same landed corpus skip the rewrite.
    */
  def ensureIndexes(docs: DataFrame, srcTag: String, buckets: Int = 8): Unit = {
    Bucketing.ensureBucketed(buildIndex(docs), IndexTable, buckets,
      bucketCols = Seq("tok"), srcTag = srcTag)
    Bucketing.ensureBucketed(buildPositionalIndex(docs), PosTable, buckets,
      bucketCols = Seq("tok"), srcTag = srcTag)
    Bucketing.ensureBucketed(buildTfIndex(docs), TfTable, buckets,
      bucketCols = Seq("tok"), srcTag = srcTag)
    Bucketing.ensureBucketed(buildScoredIndex(docs), ScoredTable, buckets,
      bucketCols = Seq("tok"), srcTag = srcTag)
  }

  /** The inverted index: one row per (distinct token, document). */
  def buildIndex(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol),
        explode(array_distinct(TextFunctions.loweredTokens(col("text")))).as("tok"))
      .filter(length(col("tok")) > 0)

  /** Per-token document frequency from the index (vocabulary stats /
    * stopword discovery / the df input a ranking layer needs). */
  def documentFrequencies(index: DataFrame): DataFrame =
    index.groupBy("tok").agg(count(lit(1)).as("df"))

  /** Documents containing EVERY query term (conjunctive lexical
    * retrieval). Terms are deduplicated — a repeated term must not
    * raise the match bar. */
  def andQuery(index: DataFrame, terms: Seq[String], idCol: String = "doc_id"): DataFrame = {
    val distinctTerms = terms.map(_.toLowerCase).distinct
    require(distinctTerms.nonEmpty, "at least one term required")
    index
      .filter(col("tok").isin(distinctTerms: _*))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_nt"))
      .filter(col("_nt") === distinctTerms.length)
      .select(col(idCol))
  }

  /** Boolean retrieval in its general m-of-n form: documents matching
    * at least `minMatch` of the query terms (AND is n-of-n, OR is
    * 1-of-n, "min should match" everything between — the recall/
    * precision dial). Same count-intersection shape as [[andQuery]]
    * with the bar lowered to `minMatch`. */
  def minShouldMatch(
      index: DataFrame,
      terms: Seq[String],
      minMatch: Int,
      idCol: String = "doc_id"): DataFrame = {
    val distinctTerms = terms.map(_.toLowerCase).distinct
    require(distinctTerms.nonEmpty, "at least one term required")
    require(minMatch >= 1 && minMatch <= distinctTerms.length,
      s"minMatch must be in [1, ${distinctTerms.length}], got $minMatch")
    index
      .filter(col("tok").isin(distinctTerms: _*))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatch)
  }

  /** The positional index: one row per token OCCURRENCE with its
    * 0-based position — what phrase and proximity queries consume.
    * Same O(1)-row normalization argument as [[buildIndex]]. */
  def buildPositionalIndex(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol),
        posexplode(TextFunctions.loweredTokens(col("text"))).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)

  /** Documents containing the exact consecutive `phrase` (adjacency
    * join over the positional index). Matching is one equi-join per
    * adjacent word pair on (doc, shifted position) — the classic
    * positional-intersection plan: the term filters push to the scan,
    * each join key is (id, pos+i), and only occurrences of the
    * phrase's own words ever shuffle. Returns distinct ids (a doc may
    * contain the phrase twice).
    */
  def phraseQuery(
      positional: DataFrame,
      phrase: Seq[String],
      idCol: String = "doc_id"): DataFrame = {
    val words = phrase.map(_.toLowerCase)
    require(words.nonEmpty, "phrase must have at least one word")
    val first = positional.filter(col("tok") === words.head)
      .select(col(idCol), col("pos").as("_p0"))
    words.zipWithIndex.tail
      .foldLeft(first) { case (acc, (w, i)) =>
        val next = positional.filter(col("tok") === w)
          .select(col(idCol), (col("pos") - i).as("_p0"))
        acc.join(next, Seq(idCol, "_p0"))
      }
      .select(col(idCol)).distinct()
  }

  /** Documents where `termA` and `termB` occur within `maxDist` token
    * positions of each other, either order (proximity / NEAR
    * retrieval — the relevance signal between AND's looseness and a
    * phrase's rigidity). One hash equi-join of the two terms'
    * occurrence lists on the doc id with the distance refinement as a
    * join residual; only the two terms' occurrences shuffle.
    */
  def proximityQuery(
      positional: DataFrame,
      termA: String,
      termB: String,
      maxDist: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(maxDist >= 1, s"maxDist must be positive, got $maxDist")
    val a = positional.filter(col("tok") === termA.toLowerCase)
      .select(col(idCol), col("pos").as("_pa"))
    val b = positional.filter(col("tok") === termB.toLowerCase)
      .select(col(idCol).as("_idb"), col("pos").as("_pb"))
    a.join(b, col(idCol) === col("_idb") &&
        abs(col("_pa") - col("_pb")) <= maxDist)
      .select(col(idCol)).distinct()
  }

  /** The weighted index: one row per (token, document) with the term
    * frequency — what a ranking layer consumes. */
  def buildTfIndex(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), explode(TextFunctions.loweredTokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf_t"))

  /** Fold a document delta (whole-document inserts and deletions) into
    * a tf index WITHOUT rebuilding it — the q86 materialized-view
    * algebra ([[Incremental.maintainSumCount]]) applied to the inverted
    * index: term frequencies are abelian sums, so a deleted document's
    * occurrences retract with sign −1 and an inserted document's fold
    * in with +1; keys whose count reaches zero leave the index.
    * Delta-fold ≡ rebuild-from-scratch (SearchSpec pins the equality;
    * q95's oracle IS the rebuild).
    *
    * Scale shape inherits from maintainSumCount: the delta tokenizes
    * and aggregates down to one row per touched (id, tok) BEFORE
    * meeting the index — maintenance cost tracks the changed documents,
    * never the corpus.
    *
    * `docsDelta` carries `idCol`, `text`, and a ±1 `signCol` (+1 insert
    * a new document, −1 retract a previously indexed one, whose text
    * must equal what was indexed — the maintainSumCount contract).
    */
  def maintainTfIndex(
      tfIndex: DataFrame,
      docsDelta: DataFrame,
      idCol: String = "doc_id",
      signCol: String = "sign"): DataFrame = {
    val occ = docsDelta
      .select(col(idCol), col(signCol),
        explode(TextFunctions.loweredTokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("_one", lit(1L))
    // reuse the (count, sum) algebra with a unit value: the count IS
    // the term frequency; the synthetic sum mirrors it and is dropped.
    Incremental.maintainSumCount(
        tfIndex.withColumn("_mirror", col("tf_t")),
        occ, keyCols = Seq(idCol, "tok"), valueCol = "_one",
        signCol = signCol, nCol = "tf_t", sumCol = "_mirror")
      .drop("_mirror")
  }

  /** Disjunctive RANKED retrieval: top-`k` documents by the
    * exact-integer tf·idf score `Σ_terms tf · ((10^6·N) div df)` — the
    * [[Keywords]] idf contract applied to search, so the ranking is
    * bit-reproducible by a SQL oracle (no BM25-style fractions). Ties
    * break on the id ascending — a total order.
    *
    * Scale shape: the term filter cuts the tf index to the query
    * terms' rows BEFORE anything else (scan-pushed IN); document
    * frequencies reduce to one row per query term and BROADCAST into
    * the scoring join along with the one-row corpus size (q42 shape);
    * the per-doc rollup shuffles only docs containing ≥1 term, and the
    * final top-k is a TakeOrdered, never a global sort.
    */
  def rankedQuery(
      tfIndex: DataFrame,
      nDocs: DataFrame,
      terms: Seq[String],
      k: Int,
      idCol: String = "doc_id"): DataFrame = {
    val distinctTerms = terms.map(_.toLowerCase).distinct
    require(distinctTerms.nonEmpty, "at least one term required")
    require(k >= 1, s"k must be positive, got $k")
    val hits = tfIndex.filter(col("tok").isin(distinctTerms: _*))
    val dfT  = hits.groupBy("tok").agg(count(lit(1)).as("df_t"))
    hits
      .join(broadcast(dfT), Seq("tok"))
      .crossJoin(broadcast(nDocs)) // one-row corpus size (q42 shape)
      .withColumn("_s", col("tf_t") * expr("(1000000 * n_docs) div df_t"))
      .groupBy(col(idCol))
      .agg(sum("_s").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** The SCORED posting table: the tf index with the document length
    * denormalized into every posting row — Lucene's norms idea in
    * columnar form. BM25's length normalization needs `dl` at scoring
    * time; carrying it in the posting means the query path touches
    * ONLY the query terms' posting rows — no join against a
    * corpus-wide doc-length side table (which would shuffle on doc_id
    * and read a table as wide as the corpus to serve a 3-term query).
    * The ingest-time join building it is the pay-once cost the
    * [[ensureIndexes]] contract already covers.
    */
  def buildScoredIndex(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val occ = docs
      .select(col(idCol), explode(TextFunctions.loweredTokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = occ.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf_t"))
    val dl = occ.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    tf.join(dl, Seq(idCol))
  }

  /** Corpus statistics BM25 needs, as ONE broadcastable row:
    * `n_docs` and the fixed-point average document length
    * `avgdl_x = (1000·Σdl) div n_docs` (milli-tokens — integer, so the
    * oracle reproduces it bit-for-bit). Derived from the corpus the
    * same way q91 derives `n_docs`; in a production ingest these are
    * written once as table metadata alongside the index.
    */
  def corpusStats(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol),
        size(filter(TextFunctions.loweredTokens(col("text")),
          t => length(t) > 0)).as("_dl"))
      .agg(count(lit(1)).as("n_docs"),
        expr("greatest((1000 * sum(_dl)) div count(1), 1)").as("avgdl_x"))

  /** BM25-ranked disjunctive retrieval over the scored posting table —
    * tf SATURATION and document-LENGTH normalization, the two effects
    * plain tf·idf ([[rankedQuery]]) lacks, in exact BIGINT arithmetic
    * so a SQL oracle reproduces the full ranking (Robertson & Walker's
    * k1=1.2, b=0.75 realized as the rationals 6/5 and 3/4):
    *
    * classic term score  idf · tf(k1+1) / (tf + k1(1 − b + b·dl/avgdl))
    * cleared of fractions (×20·avgdl, then avgdl → A/1000 and ×1000):
    *
    *   sat  = (10⁶ · 44·tf·A) div (20·tf·A + 6·A + 18000·dl)
    *   idf₂ = ⌊log₂ max((2N − 2df + 1) div (2df + 1), 1)⌋
    *   score = Σ_terms idf₂ · sat
    *
    * idf₂ is the whole-bit form of BM25's ln((N−df+½)/(df+½)) — the
    * ±½ pair becomes the exact odd-integer ratio (2N−2df+1)/(2df+1),
    * its integer quotient's ⌊log₂⌋ is exact for counts ≪ 2⁴⁰ (the
    * q80/q89 contract), and the max(·,1) floors a stopword's idf at 0
    * rather than letting it go negative.
    *
    * Scale shape: every factor inside `sat` is a PER-DOCUMENT quantity
    * (tf, dl, the corpus-average A), so the arithmetic fits BIGINT at
    * any corpus size — N enters only through idf₂'s logarithm. The
    * plan is [[rankedQuery]]'s: scan-pushed `tok IN (...)` over the
    * bucketed postings, per-term df reduced and broadcast, one-row
    * stats broadcast (q42 shape), per-doc rollup shuffles only docs
    * containing ≥1 query term, TakeOrdered top-k.
    */
  def bm25Query(
      scored: DataFrame,
      stats: DataFrame,
      terms: Seq[String],
      k: Int,
      idCol: String = "doc_id"): DataFrame = {
    val distinctTerms = terms.map(_.toLowerCase).distinct
    require(distinctTerms.nonEmpty, "at least one term required")
    require(k >= 1, s"k must be positive, got $k")
    val hits = scored.filter(col("tok").isin(distinctTerms: _*))
    val dfT  = hits.groupBy("tok").agg(count(lit(1)).as("df_t"))
    hits
      .join(broadcast(dfT), Seq("tok"))
      .crossJoin(broadcast(stats)) // one-row corpus stats (q42 shape)
      .withColumn("_idf2",
        floor(log2(greatest(
          expr("(2 * n_docs - 2 * df_t + 1) div (2 * df_t + 1)"),
          lit(1L)))).cast("long"))
      .withColumn("_sat",
        expr("(1000000 * 44 * tf_t * avgdl_x) div " +
             "(20 * tf_t * avgdl_x + 6 * avgdl_x + 18000 * dl)"))
      .withColumn("_s", col("_idf2") * col("_sat"))
      .groupBy(col(idCol))
      .agg(sum("_s").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
