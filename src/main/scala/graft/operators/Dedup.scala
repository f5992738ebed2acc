package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextFunctions}
import graft.util.Checkpoints

/** Document deduplication operators for the LLM-data-pipeline surface.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-shuffle on a 32-byte key (md5 of the
  *    canonical form) — never on the full text;
  *  - near-dup goes through an *inverted index* (explode token/shingle →
  *    equi-join on the token) or MinHash-LSH banding, never a cross join;
  *  - candidate pruning uses integer arithmetic only (size filters) so
  *    WholeStageCodegen keeps the verify step tight.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Hash-distribute on `key` across the session's default parallelism
    * with an EXPLICIT partition count, so an expensive per-row kernel
    * above it runs on every core. The count matters twice: a bare
    * `repartition(col)` is an AQE coalescing target
    * (REPARTITION_BY_COL), and on a small shuffle AQE folds it back to
    * ONE partition — re-serializing the kernel it was meant to spread
    * (measured at sf0.1: 2.8 s kernel on the scan partition vs 0.42 s
    * distributed); and the local test files are single-row-group
    * parquet, so without the exchange the scan stage itself cannot
    * parallelize. At cluster scale the exchange moves exactly the bytes
    * the kernel reads and buys even balance across skewed files.
    */
  private[operators] def spread(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  /** One row per distinct canonical text: the surviving doc_id (min) and
    * the duplicate-cluster size. The groupBy key is `fingerprint` (md5),
    * so the shuffle moves 32-byte keys, not documents.
    */
  def exactDedupSummary(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** The deduplicated corpus: keeps the lowest doc_id per fingerprint.
    * Implemented as min-id + self-semi-join rather than a full-row
    * window sort: the shuffle payload stays (fp, doc_id) pairs.
    */
  def exactDedup(docs: DataFrame): DataFrame = {
    val keep = exactDedupSummary(docs).select(col("keep_id").as("doc_id"))
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Exact word-set Jaccard near-duplicate pairs via inverted index.
    *
    * thresholdPct is an integer percent; the test
    * `100·|A∩B| ≥ t·(|A|+|B|−|A∩B|)` is pure integer arithmetic (oracle
    * bit-exact). Candidate generation joins docs sharing ≥1 word —
    * at scale, stopword-like ultra-frequent tokens would fan out, so
    * callers should pre-filter by document-frequency (see maxDf).
    *
    * Join strategy follows the two contracts:
    *  - maxDf=None is the VERIFIER: quadratic by design, so the caller
    *    must bound `docs` to a subset — which makes the exploded word
    *    list broadcastable by construction. Broadcasting it avoids
    *    shuffling on the word key at all (a shared vocabulary makes
    *    every word a skew key: one shuffle partition would absorb a
    *    whole df² block), and the probe side is repartitioned on doc_id
    *    so each word's quadratic block fans out across every core —
    *    NOT left on the scan's partitioning, where a single small
    *    parquet file would serialize the entire join (measured 10× at
    *    sf0.1: 10 s single-partition → 1.0 s).
    *  - maxDf=Some is the SCALE path: df-pruning bounds any key's
    *    fanout at maxDf² and leaves many distinct rare keys, so the
    *    plain shuffle equi-join partitions evenly and nothing needs to
    *    be broadcast-sized.
    *
    * vs [[jaccardNearDupPairsPrefix]]: this count-aggregation form wins
    * when the qualifying-pair DENSITY is high — verify work is
    * Θ(candidate pairs) either way, and here it is a map-side-combining
    * hash agg over narrow (doc_a, doc_b) rows in one codegen stage, no
    * arrays shipped. Measured on the synthetic corpus (31-word
    * vocabulary, 23% of ALL pairs qualify at t=80, sf0.1): 4.9 s here
    * vs 12.5 s prefix-filtered, even though prefix filtering shrinks
    * the candidate join 8×. On a Zipfian real-web corpus the density
    * inverts (≪1% of pairs qualify, huge vocabulary) and the prefix
    * variant is the one that survives scale.
    */
  def jaccardNearDupPairs(
      docs: DataFrame,
      thresholdPct: Int,
      maxDf: Option[Long] = None,
      checkpointDir: Option[String] = None): DataFrame = {
    // VERIFIER path only (maxDf=None — bounded input by contract): the
    // exploded (doc_id, word) stream feeds 3-4 plan subtrees (per-doc
    // sizes, both candidate-join sides), and without materialization
    // each re-tokenized the docs from the parquet text (4 scans in the
    // committed q21 before-plan); the bounded input makes the staged
    // stream bounded too. The maxDf SCALE path is deliberately NOT
    // staged: there the stream is corpus-sized, and materializing it
    // costs more than the whitespace re-tokenization it would save —
    // the same economics that keep buildJaccardPrefixIndex's two
    // token passes unstaged.
    val rawWords = docs.select(col("doc_id"),
      explode(TextFunctions.wordSet(col("text"))).as("word"))
    val words =
      if (maxDf.nonEmpty) rawWords
      else Checkpoints.stage(rawWords,
        checkpointDir.orElse(Checkpoints.configured(docs.sparkSession)))
    val filtered = maxDf match {
      case Some(m) =>
        val df = words.groupBy("word").agg(count(lit(1)).as("df"))
          .filter(col("df") <= m).select("word")
        words.join(broadcast(df), Seq("word"))
      case None => words
    }
    val sizes = words.groupBy("doc_id").agg(count(lit(1)).as("nw"))
    val a = (if (maxDf.isEmpty) spread(filtered, "doc_id") else filtered).as("a")
    val b = (if (maxDf.isEmpty) broadcast(filtered) else filtered).as("b")
    val inter = a
      .join(b, col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("nw", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("nw", "n_b"), "doc_b")
      .filter(lit(100L) * col("n_common") >=
        lit(thresholdPct.toLong) * (col("n_a") + col("n_b") - col("n_common")))
      .select("doc_a", "doc_b", "n_common", "n_a", "n_b")
  }

  /** Exact Jaccard pairs via AllPairs-style PREFIX FILTERING (Bayardo,
    * Ma & Srikant, "Scaling Up All Pairs Similarity Search", WWW'07;
    * Chaudhuri et al.'s SSJoin primitive). Same output contract as
    * [[jaccardNearDupPairs]] — identical rows, exact integer arithmetic
    * — but a candidate-then-verify shape built for sparse-overlap
    * corpora.
    *
    * Candidate generation: sort each doc's tokens by global document
    * frequency (rarest first, word as tie-break — a total order
    * consistent across docs) and index only the first `n − cmin + 1`,
    * where `cmin = ⌈t·n/100⌉` is the smallest intersection any
    * qualifying partner can have (from `c ≥ t·(n_a+n_b)/(100+t)` and
    * `n_b ≥ c`). LOSSLESS: a qualifying pair shares ≥ max(cminA, cminB)
    * tokens, so its globally-rarest common token sits inside BOTH
    * prefixes — the equi-join on prefix tokens cannot miss a true pair
    * (DedupSpec proves set equality against a brute-force cross join).
    * Prefix tokens are by construction the COLD join keys, so no key
    * absorbs a df² block; a size-compatibility conjunct
    * (`100·min(n_a,n_b) ≥ t·max`) prunes further at the join.
    * Survivors are verified exactly: `array_intersect` over the two
    * word arrays (distinct elements by construction).
    *
    * When to use which — measured at sf0.1, 2000 docs, t=80, the
    * ADVERSARIAL corpus for pruning (31-word vocabulary, 23% of all
    * pairs qualify): candidate join 35.8M → 4.5M rows (8×) under
    * prefix filtering, yet end-to-end 12.5 s vs 4.9 s for the
    * count-agg form, because at that density verification dominates
    * and shipping word arrays loses to counting narrow rows. Sparse
    * Zipfian corpora invert that: candidates dominate, and this is
    * the variant that survives 100× scale.
    */
  def jaccardNearDupPairsPrefix(docs: DataFrame, thresholdPct: Int): DataFrame =
    jaccardPairsFromPrefixIndex(buildJaccardPrefixIndex(docs), thresholdPct)

  /** The per-doc index [[jaccardNearDupPairsPrefix]] consumes: one row
    * per doc with its token array in global rarity order (df asc, word
    * asc) and size. Split out because the pair join reads the index
    * FOUR times (both join sides + both verification lookups): at 100 TB
    * the fused form would re-tokenize the corpus four times, so build
    * the index once, persist or write it, and call
    * [[jaccardPairsFromPrefixIndex]] — the same build/probe split as
    * the IVF family (`Similarity.buildIvfIndex`/`ivfProbe`).
    */
  def buildJaccardPrefixIndex(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(TextFunctions.wordSet(col("text"))).as("word"))
    val dfreq = words.groupBy("word").agg(count(lit(1)).as("df"))
    words
      .join(dfreq, "word")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("word")))).as("tw"))
      .select(col("doc_id"), size(col("tw")).cast("long").as("nw"),
        transform(col("tw"), x => x.getField("word")).as("ws"))
  }

  /** Prefix-filtered exact Jaccard pairs over a prebuilt
    * [[buildJaccardPrefixIndex]] frame (persist it first at scale).
    *
    * NO forced broadcast anywhere: the index and the doc→word-array
    * table are both O(corpus), so a mandatory `broadcast()` hint would
    * OOM exactly at the scale this variant exists for. The candidate
    * self-join is a plain shuffle equi-join on the prefix token — cold
    * keys by construction (rarest-first prefixes), so it partitions
    * evenly — and the two verification lookups are plain equi-joins on
    * doc_id. At test scale AQE promotes all three to broadcast joins on
    * its own; at 100 TB they stay shuffles, which is the only shape
    * that survives.
    */
  def jaccardPairsFromPrefixIndex(byDoc: DataFrame, thresholdPct: Int): DataFrame = {
    val t = thresholdPct.toLong
    val pref = byDoc
      .withColumn("cmin", ((lit(t) * col("nw") + 99L) / 100L).cast("long"))
      .select(col("doc_id"), col("nw"),
        explode(slice(col("ws"), lit(1),
          (col("nw") - col("cmin") + 1L).cast("int"))).as("word"))
    val a = pref.as("a")
    val b = pref.as("b")
    val cand = a
      .join(b, col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id") &&
        lit(100L) * least(col("a.nw"), col("b.nw")) >=
          lit(t) * greatest(col("a.nw"), col("b.nw")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = byDoc.select(col("doc_id"), col("ws"), col("nw"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("ws").as("wa"), col("nw").as("n_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("ws").as("wb"), col("nw").as("n_b")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("wa"), col("wb"))).cast("long"))
      // 100c ≥ t(a+b−c) ⟺ (100+t)c ≥ t(a+b): the single-c form matters
      // because predicate pushdown SUBSTITUTES n_common's defining
      // expression into the filter — one reference means the
      // array_intersect evaluates once per candidate, not twice
      .filter(lit(100L + t) * col("n_common") >= lit(t) * (col("n_a") + col("n_b")))
      .select("doc_a", "doc_b", "n_common", "n_a", "n_b")
  }

  /** MinHash signatures, one row per doc: `numHashes` independent
    * min-hashes over word `n`-gram shingles.
    *
    * Shape matters for performance: explode shingles ONCE, then 64
    * partial-aggregating `min(xxhash64(seed_i, shingle))` columns.
    * (A per-row `transform(sequence(0,63), i -> array_min(...))` Column
    * re-evaluates the shingle-array construction per hash function —
    * measured 25× slower at sf0.01.) The groupBy gets map-side combine,
    * so the shuffle carries one 8·numHashes-byte row per doc.
    */
  def minhashSignatures(docs: DataFrame, shingleN: Int, numHashes: Int): DataFrame = {
    val sh = docs
      .withColumn("_tk", TextFunctions.loweredTokens(col("text")))
      .select(col("doc_id"),
        explode_outer(TextFunctions.shinglesFromTokens(col("_tk"), shingleN)).as("shingle"))
      .filter(col("shingle").isNotNull) // see contaminationReport: outer + post-filter keeps the inferred size()>0 predicate from sinking below the staging projects
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  private def bandedSignatures(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

  /** LSH banding: candidate pairs whose signatures collide in ≥1 band.
    * bands·rows must equal the signature length. Scale path: the only
    * shuffles are (band, bandHash) groupings — O(docs·bands) rows of a
    * few bytes, then exact verification on the candidate set only.
    * Identical subtrees on both self-join sides → Spark ReusedExchange
    * computes the signature aggregation once.
    */
  def minhashCandidatePairs(
      docs: DataFrame,
      shingleN: Int = 3,
      bands: Int = 16,
      rows: Int = 4): DataFrame =
    candidatesFromSigs(minhashSignatures(docs, shingleN, bands * rows), bands, rows)

  private def candidatesFromSigs(sigs: DataFrame, bands: Int, rows: Int): DataFrame = {
    val banded = bandedSignatures(sigs, bands, rows)
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r,
        col("l.band") === col("r.band") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash near-dup pairs: LSH candidates + estimated Jaccard from
    * signature agreement (fraction of matching minhashes).
    *
    * Payload diet (100 TB): the signature table feeds THREE plan
    * subtrees — the band explode plus the two per-pair verify lookups —
    * so it is staged ONCE ([[graft.util.Checkpoints.stage]]; pass
    * `checkpointDir` or set `spark.graft.checkpointDir` for reliable
    * storage at scale) and the banding exchange + candidate self-join
    * carry only thin (doc_id, band, band_hash) rows. The 8·sigLen-byte
    * signatures never ride the O(docs·bands) shuffle or the quadratic
    * candidate join; they are equi-joined back only for pairs that
    * survive banding, the bucket cap and pair-dedup — the same
    * build-once/probe contract as [[buildJaccardPrefixIndex]].
    */
  def minhashNearDupPairs(
      docs: DataFrame,
      shingleN: Int = 3,
      bands: Int = 16,
      rows: Int = 4,
      minEstJaccardPct: Int = 50,
      maxBucketSize: Int = 100,
      checkpointDir: Option[String] = None): DataFrame = {
    val sigLen = bands * rows
    val sigs = Checkpoints.stage(
      minhashSignatures(docs, shingleN, sigLen),
      checkpointDir.orElse(Checkpoints.configured(docs.sparkSession)))
    val banded0 = sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    // Skew guard: a band bucket with B members yields B²/2 candidates but
    // carries almost no signal (it's the LSH analog of a stopword). Cap
    // bucket size — same-key window, so the count rides the join shuffle.
    val wBucket = Window.partitionBy("band", "band_hash")
    val banded = banded0
      .withColumn("_bn", count(lit(1)).over(wBucket))
      .filter(col("_bn") <= maxBucketSize)
      .drop("_bn")
    val l = banded.as("l")
    val r = banded.as("r")
    val pairs = l.join(r,
        col("l.band") === col("r.band") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("n_match",
        size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _), x => x)).cast("long"))
      .filter(lit(100L) * col("n_match") >= lit(minEstJaccardPct.toLong * sigLen))
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        lit(sigLen).cast("long").as("sig_len"))
  }

  // -------------------------------------------------------------------------
  // Portable (oracle-checkable) variants: hashes derived from md5 via
  // PortableHash instead of xxhash64, so an external DuckDB oracle
  // reproduces signatures, buckets and pair sets bit-for-bit. Plan shape
  // is identical to the xxhash64 paths (explode-once + K partial aggs,
  // banding with ReusedExchange, bucket-size skew cap).
  // -------------------------------------------------------------------------

  /** MinHash signatures via the fused native kernel
    * ([[graft.plans.MinHashSigExpr]]): one md5 per shingle and all K
    * running minima inside the projection — no explode, no partial-agg
    * shuffle, the signature is born finished in the scan stage.
    * Spec-asserted equal to [[minhashSignaturesPortableComposed]].
    */
  def minhashSignaturesPortable(
      docs: DataFrame,
      shingleN: Int,
      numHashes: Int,
      seed: Long = 7L): DataFrame =
    // spread BEFORE the kernel: the fused signature expression is the
    // expensive stage (one md5 + K running minima per shingle), and it
    // must not run on the scan's (possibly single) input partition.
    // Tokens are STAGED so the shingle lambda slices an attribute
    // instead of re-splitting the document per position (see
    // TextFunctions.ngramsFromTokens).
    spread(docs.filter(TextFunctions.hasShingles(col("text"), shingleN)), "doc_id")
      .withColumn("_tk", TextFunctions.loweredTokens(col("text")))
      .select(col("doc_id"),
        graft.plans.MinHashSigExpr(
          TextFunctions.shinglesFromTokens(col("_tk"), shingleN), seed, numHashes).as("sig"))

  /** Composed reference form (explode-once + K partial-min aggregates —
    * one md5 per shingle, two integer ops per family member inside the
    * partial aggregation): kept as the equality baseline for the fused
    * kernel and as the shape the DuckDB oracle mirrors directly.
    */
  def minhashSignaturesPortableComposed(
      docs: DataFrame,
      shingleN: Int,
      numHashes: Int,
      seed: Long = 7L): DataFrame = {
    val ab = PortableHash.affineConstants(seed, numHashes)
    val sh = docs
      .withColumn("_tk", TextFunctions.loweredTokens(col("text")))
      .select(col("doc_id"),
        explode_outer(TextFunctions.shinglesFromTokens(col("_tk"), shingleN)).as("shingle"))
      .filter(col("shingle").isNotNull) // outer + post-filter: see contaminationReport
      .select(col("doc_id"), PortableHash.md5Hex32(col("shingle")).as("h"))
    val aggs = (0 until numHashes).map(i =>
      min(PortableHash.affine(col("h"), ab(i))).as(s"m$i"))
    sh.groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Oracle-checkable MinHash-LSH near-dup pairs. The band join key is
    * the band's signature slice rendered as a string (equality on the
    * tuple — same semantics as hashing the band, but engine-neutral).
    *
    * Same payload-diet shape as [[minhashNearDupPairs]]: signatures are
    * staged once and only (doc_id, band, band_key) rides the banding
    * shuffle and candidate join; signatures rejoin per surviving pair.
    * Staging also means the minhash kernel runs exactly once — the
    * three consumers read materialized rows, so no inferred filter or
    * alias substitution can ever re-run it on the scan partition.
    */
  def minhashNearDupPairsPortable(
      docs: DataFrame,
      shingleN: Int = 3,
      bands: Int = 16,
      rows: Int = 4,
      minEstJaccardPct: Int = 50,
      maxBucketSize: Int = 100,
      seed: Long = 7L,
      checkpointDir: Option[String] = None): DataFrame = {
    val sigs = Checkpoints.stage(
      minhashSignaturesPortable(docs, shingleN, bands * rows, seed),
      checkpointDir.orElse(Checkpoints.configured(docs.sparkSession)))
    minhashNearDupPairsFromSigs(sigs, bands, rows, minEstJaccardPct,
      maxBucketSize, checkpointDir)
  }

  /** The banding + verify half of [[minhashNearDupPairsPortable]], for
    * callers that already hold MATERIALIZED `(doc_id, sig)` signatures
    * (a staged frame or a persisted sig table) — e.g. a corpus-prep
    * pipeline that computed the signatures in the same single text
    * pass as its other per-doc signals. `sigs` is consumed three times
    * (banding + the two per-pair verify joins), so it must be cheap to
    * re-scan; pass a staged frame, never a raw text pipeline.
    *
    * The banded (doc_id, band, band_key) set is itself staged before
    * the self-join: both join sides and the bucket-cap count read ONE
    * materialization instead of re-running the explode + cap window
    * per side (the pre-staging plan duplicated the whole banding
    * pipeline under each side of the join).
    */
  def minhashNearDupPairsFromSigs(
      sigs: DataFrame,
      bands: Int = 16,
      rows: Int = 4,
      minEstJaccardPct: Int = 50,
      maxBucketSize: Int = 100,
      checkpointDir: Option[String] = None): DataFrame = {
    val sigLen = bands * rows
    val banded0 = sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        array_join(
          transform(slice(col("sig"), b * rows + 1, lit(rows)), _.cast("string")),
          ","))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
    val wBucket = Window.partitionBy("band", "band_key")
    val banded = Checkpoints.stage(
      banded0
        .withColumn("_bn", count(lit(1)).over(wBucket))
        .filter(col("_bn") <= maxBucketSize)
        .drop("_bn"),
      checkpointDir.orElse(Checkpoints.configured(sigs.sparkSession)))
    val l = banded.as("l")
    val r = banded.as("r")
    val pairs = l.join(r,
        col("l.band") === col("r.band") &&
          col("l.band_key") === col("r.band_key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("n_match",
        size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _), x => x)).cast("long"))
      .filter(lit(100L) * col("n_match") >= lit(minEstJaccardPct.toLong * sigLen))
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        lit(sigLen.toLong).as("sig_len"))
  }

  /** The banding projection shared by the one-shot and incremental
    * MinHash paths: one row per (doc, band) with the band rendered as a
    * single join key `bk` = "band:min1,min2,…" — engine-neutral string
    * equality on the signature slice, and ONE key column so the
    * persisted index can be bucketed (and the join planned) on it.
    */
  private[graft] def bandKeyArray(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat_ws(":", b.cast("string"),
        array_join(
          transform(slice(sig, b * rows + lit(1), lit(rows)),
            _.cast("string")), ",")))

  private def bandKeys(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs.select(col("doc_id"),
      explode(bandKeyArray(col("sig"), bands, rows)).as("bk"))

  // the tombstone table of ONE band-index GENERATION: `<prefix>_dels`
  // for gen 0, `<prefix>_dels_g<nano>` for a promoted generation — the
  // name derives from the bands table's own generation suffix, so a
  // reader's (bands, sigs, dels) triple resolves ATOMICALLY from the
  // one currentIndexTables call: a compaction promote can never pair
  // old band rows with a post-purge tombstone view (served-deleted
  // docs) or delete tombstone files out from under a planned scan.
  // Appended by [[deleteFromMinhashBandIndex]]; a compaction's new
  // generation starts with NO dels table (the purge is the rewrite),
  // and the superseded generation's dels table retires age-gated with
  // its pair.
  private[graft] def delsTableFor(bandsTable: String): String = {
    val prefix = prefixOf(bandsTable)
    prefix + "_dels" + bandsTable.stripPrefix(s"${prefix}_bands")
  }

  // the standing deletes a reader of `curBands` must apply: the
  // generation's own dels table, plus the base `<prefix>_dels` table
  // when it holds UN-consumed rows. The base table appears in two
  // roles: (a) gen 0's own dels after a compaction promoted past it —
  // its rows were CONSUMED by that rewrite and the table is only
  // retained (age-gated) for scans still reading gen 0, marked
  // `graft.consumed` at promote time so new readers skip it (unioning
  // it would wrongly suppress ids re-folded after the purge); (b) a
  // layout last written by the pre-generation-scoped binary — no
  // marker, rows are live deletes (the old binary deleted files on
  // consumption), union them.
  private[graft] def standingDels(
      spark: SparkSession, curBands: String): Option[DataFrame] = {
    val genDels  = delsTableFor(curBands)
    val baseDels = prefixOf(curBands) + "_dels"
    def unconsumed(t: String): Boolean =
      !spark.sql(s"SHOW TBLPROPERTIES $t").collect()
        .exists(r => r.getString(0) == "graft.consumed")
    val sources = (Seq(genDels).filter(spark.catalog.tableExists) ++
      (if (baseDels != genDels && spark.catalog.tableExists(baseDels) &&
           unconsumed(baseDels)) Seq(baseDels) else Seq.empty))
    if (sources.isEmpty) None
    else Some(sources.map(spark.table).reduce(_ union _))
  }

  /** The lineage prefix of any band/sig index table name — base
    * (`<prefix>_bands`) or generation (`<prefix>_bands_g<nano>`).
    */
  private[graft] def prefixOf(table: String): String =
    table.replaceAll("_(bands|sigs)(_g\\d+)?$", "")

  /** Resolve a lineage's CURRENT physical tables — the generation
    * manifest of the table-backed index family (the band-index analog
    * of [[Similarity.activeCellsDir]]). Generation 0 is the unsuffixed
    * pair [[ensureMinhashBandIndex]] writes; each
    * [[compactMinhashBandIndex]] promotes a fresh `_g<nano>` pair and
    * the PROMOTE EVENT is the catalog creation of the new bands table
    * (the last of the pair to land, with its ledger props attached in
    * the same CTAS) — one atomic catalog op, so there is no window
    * where the lineage is headless, and the superseded generation
    * stays readable for scans already in flight (retired one
    * compaction later). Callers may hold any generation's names across
    * maintenance; every read path re-resolves through this.
    */
  def currentIndexTables(
      spark: SparkSession, tablePrefix: String): (String, String) = {
    val cat  = spark.sessionState.catalog
    val base = s"${tablePrefix}_bands"
    val sfxs = generationSuffixes(spark, tablePrefix)
    sfxs
      .find(sfx => cat.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(
          s"${tablePrefix}_sigs$sfx", Some("default"))))
      .map(sfx => (s"$base$sfx", s"${tablePrefix}_sigs$sfx"))
      .getOrElse((base, s"${tablePrefix}_sigs"))
  }

  // every standing generation suffix of a lineage, newest first ("" =
  // the unsuffixed gen-0 pair, always last). Ordering is NUMERIC on
  // the stamp, never lexical: suffixes are written by different
  // processes (the whole point of the writer lease) whose stamps can
  // differ in digit width — string order would resolve reads to a
  // SUPERSEDED generation after a cross-process promote, and folds
  // appended there would be lost when the pair retires.
  private def generationSuffixes(
      spark: SparkSession, tablePrefix: String): Seq[String] =
    familySuffixes(spark, tablePrefix, "bands")

  // the numeric stamp of a generation suffix: 0 for gen-0 (""),
  // -1 (oldest) for unparseable foreign garbage — retirement must
  // still be able to drop it, resolution must never prefer it
  private def genSuffixNum(sfx: String): Long =
    if (sfx.isEmpty) 0L
    else {
      val d = sfx.stripPrefix("_g")
      if (d.nonEmpty && d.length <= 19 && d.forall(_.isDigit))
        try d.toLong catch { case _: NumberFormatException => -1L }
      else -1L
    }

  // the same enumeration for one family — resolution only trusts bands
  // (the promote's single catalog event), but retirement must also see
  // ORPHAN sigs generations (a crash between the sigs CTAS and the
  // bands CTAS leaves a sigs table with no bands twin, invisible to the
  // bands-only listing and otherwise leaked forever)
  private def familySuffixes(
      spark: SparkSession, tablePrefix: String,
      family: String): Seq[String] = {
    val base = s"${tablePrefix}_$family"
    val gens = spark.sessionState.catalog
      .listTables("default", s"$base*")
      .map(_.table)
      .collect {
        case n if n == base => ""
        case n if n.startsWith(s"${base}_g") &&
            n.stripPrefix(s"${base}_g").forall(_.isDigit) =>
          n.stripPrefix(base)
      }
    gens.filter(_.nonEmpty).sortBy(s => -genSuffixNum(s)) ++
      gens.filter(_.isEmpty)
  }

  // drop every generation pair of a lineage EXCEPT `keep` — the
  // retirement half of the promote contract. Age-gated when
  // `ageGateHours` > 0: a superseded pair (or an orphan left by a
  // crashed cross-process CTAS) is only dropped once its catalog
  // createTime is older than the gate, so a scan still reading it —
  // or a LIVE rewrite mid-promote in another process (lockFor is
  // JVM-local) — keeps its tables; the IVF side's generation GC makes
  // the same promise via file mtimes. A rebuild passes 0: explicit
  // full reset, nothing to preserve.
  private def dropGenerationsExcept(
      spark: SparkSession, tablePrefix: String, keep: Set[String],
      ageGateHours: Long = 0L): Unit = {
    val cat    = spark.sessionState.catalog
    val cutoff = System.currentTimeMillis() - ageGateHours * 3600 * 1000L
    def oldEnough(table: String): Boolean =
      ageGateHours <= 0L || {
        try cat.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(
              table, Some("default"))).createTime <= cutoff
        catch { case _: org.apache.spark.sql.AnalysisException => true }
      }
    val sfxs = (familySuffixes(spark, tablePrefix, "bands") ++
      familySuffixes(spark, tablePrefix, "sigs") ++
      familySuffixes(spark, tablePrefix, "dels")).distinct
    // COUNT bound on top of the age gate (the IVF side's recoverCells
    // contract): a hot compaction loop must not accumulate generation
    // pairs without limit for gcStaleHours. Among retirable suffixes
    // (newest first — familySuffixes order), the newest
    // `spark.graft.index.maxStaleGenerations` stay age-gated; the
    // excess drops REGARDLESS of age. keep-set members (the active
    // pair and its immediate predecessor, or a live rewrite's newer
    // suffix) are never counted. Readers accept the same contract
    // shift as the path-backed family: an in-flight scan survives
    // min(gcStaleHours, K subsequent promotes).
    val keepStale =
      if (ageGateHours <= 0L) 0
      else Similarity.confInt(
        spark, "spark.graft.index.maxStaleGenerations", 4)
    // explicit newest-first order, NUMERIC on the stamp ("" = gen 0 =
    // stamp 0, oldest; see [[genSuffixNum]] for why string order is
    // wrong) — the concatenated family listing is not globally ordered
    // when orphan sigs/dels suffixes exist
    val retirable =
      sfxs.filterNot(keep).sortBy(s => -genSuffixNum(s))
    // the keep set's non-active members (the just-superseded pair a
    // promote always protects) consume superseded-budget slots, so the
    // invariant is global: ≤ keepStale superseded generations standing
    // after any maintenance op, i.e. ≤ keepStale+1 in total
    val keepSlots = math.max(0, keepStale - math.max(0, keep.size - 1))
    val forced: Set[String] =
      if (keepStale <= 0 && ageGateHours > 0L) Set.empty
      else retirable.drop(keepSlots).toSet
    retirable.foreach { sfx =>
      Seq(s"${tablePrefix}_bands$sfx", s"${tablePrefix}_sigs$sfx",
          s"${tablePrefix}_dels$sfx")
        .foreach { t =>
          if (cat.tableExists(org.apache.spark.sql.catalyst
              .TableIdentifier(t, Some("default"))) &&
              (forced.contains(sfx) || oldEnough(t)))
            spark.sql(s"DROP TABLE IF EXISTS $t")
        }
    }
  }

  /** The bucket count a lineage was actually built with, read from the
    * catalog's bucket spec — the source of truth every append is
    * validated against, so maintenance rewrites derive from it instead
    * of trusting a default that may not match the build.
    */
  private[graft] def bucketCountOf(
      spark: SparkSession, table: String): Option[Int] = {
    val Array(db, tbl) =
      if (table.contains(".")) table.split("\\.", 2)
      else Array("default", table)
    try {
      if (!spark.catalog.tableExists(s"$db.$tbl")) None
      else spark.sessionState.catalog
        .getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tbl, Some(db)))
        .bucketSpec.map(_.numBuckets)
    } catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /** The LIVE view of a persisted index table (`_bands` or `_sigs`):
    * physical rows minus the lineage's standing tombstones. The
    * tombstone set is bounded between compactions, so the anti-join
    * build side is an explicit BROADCAST — the bucketed scan keeps its
    * layout (broadcast joins preserve child partitioning; the bucket-
    * consuming window above this still plans zero exchanges).
    */
  private[graft] def liveIndexTable(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      bandsTable: String): DataFrame = {
    // re-resolve the lineage's CURRENT generation: the caller may hold
    // names from before a compaction promote, and the superseded pair
    // is retained (then retired) rather than rewritten in place
    val prefix = prefixOf(bandsTable)
    val (curBands, curSigs) = currentIndexTables(spark, prefix)
    val resolved =
      if (prefixOf(table) != prefix) table
      else if (table.startsWith(s"${prefix}_sigs")) curSigs
      else curBands
    val t = spark.table(resolved)
    standingDels(spark, curBands) match {
      case Some(dels) =>
        t.join(broadcast(dels.select("doc_id").distinct()),
          Seq("doc_id"), "left_anti")
      case None => t
    }
  }

  /** The skew-capped LIVE view of a persisted band index (tombstoned
    * docs excluded; over-cap buckets — boilerplate piles — dropped
    * whole; the count window consumes the table's `bk` bucketing, no
    * exchange). Shared by the batch and streaming ingestion paths.
    */
  private[graft] def cappedBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      bandsTable: String,
      maxBucketSize: Int): DataFrame =
    liveIndexTable(spark, bandsTable, bandsTable)
      .withColumn("_bn", count(lit(1)).over(Window.partitionBy("bk")))
      .filter(col("_bn") <= maxBucketSize)
      .drop("_bn")

  /** Persisted MinHash band index — the layout behind
    * [[incrementalNearDupPairs]]: the STANDING corpus is shingled,
    * minhashed and banded ONCE, landing as two bucketed tables
    * (`<prefix>_bands` (doc_id, bk) bucketed on `bk`; `<prefix>_sigs`
    * (doc_id, sig) bucketed on `doc_id`) via the
    * [[Bucketing.ensureBucketed]] idempotence contract — pay at ingest,
    * reuse every batch. Returns (bandsTable, sigsTable).
    */
  def ensureMinhashBandIndex(
      docs: DataFrame,
      tablePrefix: String,
      srcTag: String,
      shingleN: Int = 3,
      bands: Int = 16,
      rows: Int = 4,
      buckets: Int = 8,
      seed: Long = 7L): (String, String) = {
    val bandsTable = s"${tablePrefix}_bands"
    val sigsTable  = s"${tablePrefix}_sigs"
    // validity is checked against the lineage's CURRENT generation
    // (compaction copies the graft.src key forward, so a compacted
    // lineage still reads as current and repeated ensure calls stay
    // zero-cost); a rebuild retires EVERY generation and starts gen 0
    val (curBands, curSigs) =
      currentIndexTables(docs.sparkSession, tablePrefix)
    // fold the DATA FINGERPRINT into the validity key (the
    // Similarity.inputFingerprint contract): a corpus regenerated at
    // the same path with the same schema — the wiped-and-rebuilt /tmp
    // fixture case — must invalidate the persisted index instead of
    // silently deduping new text against old band/sig tables
    val fpTag = s"$srcTag|fp=${Similarity.inputFingerprint(docs)}"
    // probe validity with the UNSTAGED plan first (schema + catalog
    // props only): a repeated ensure call must cost ZERO corpus work.
    // The eager signature staging used to run unconditionally, which
    // re-spread and re-minhashed the whole corpus on every call — one
    // full corpus re-hash per query invocation at scale (found as the
    // batch-independent ~1-row-per-corpus-doc shuffle constant in the
    // p01/p02 ShuffleProbe runs). Staging (localCheckpoint/checkpoint)
    // preserves the plan's schema, so the staged frames below produce
    // the same layout keys the probe checked.
    val rawSigs = minhashSignaturesPortable(docs, shingleN, bands * rows, seed)
    val current =
      Bucketing.isCurrent(bandKeys(rawSigs, bands, rows), curBands,
        buckets, Seq("bk"), fpTag) &&
      Bucketing.isCurrent(rawSigs, curSigs, buckets, Seq("doc_id"), fpTag)
    if (!current) {
      // the rebuild is a WRITE: it retires every generation and
      // restarts the lineage at gen 0, so it takes the cross-process
      // writer lease like every other maintenance entry point — but the
      // lease's re-entrancy is per-JVM (held-map depth), NOT per-thread,
      // so the lease alone would admit two sibling THREADS that both
      // probed a stale index (the second just increments the depth)
      // straight into racing DROP TABLE / dropGenerationsExcept /
      // ensureBucketed. Serialize JVM-locally on the lineage lock FIRST
      // — the precondition every other band-index entry point
      // (fold/delete/compact) already honors — and re-probe validity
      // under it, so the loser of the thread race reuses the winner's
      // rebuild instead of redoing (and clobbering) it.
      foldLocks.computeIfAbsent(tablePrefix, _ => new Object).synchronized {
        val (cb, cs) = currentIndexTables(docs.sparkSession, tablePrefix)
        val nowCurrent =
          Bucketing.isCurrent(bandKeys(rawSigs, bands, rows), cb,
            buckets, Seq("bk"), fpTag) &&
          Bucketing.isCurrent(rawSigs, cs, buckets, Seq("doc_id"), fpTag)
        if (nowCurrent) (cb, cs)
        else WriterLease.withLease(docs.sparkSession,
            WriterLease.lockPathFor(docs.sparkSession, "default",
              tablePrefix)) {
          // a rebuild starts a NEW lineage: stale tombstones from the
          // old one must not suppress freshly indexed docs — drop the
          // catalog entry AND any orphaned warehouse dir a previous
          // JVM left
          docs.sparkSession.sql(
            s"DROP TABLE IF EXISTS ${delsTableFor(bandsTable)}")
          graft.pipeline.Cleanup.ensureWritable(
            docs.sparkSession, "default", delsTableFor(bandsTable))
          // every generation of the stale lineage goes — gen 0 restarts it
          dropGenerationsExcept(docs.sparkSession, tablePrefix, Set.empty)
          // staged so the expensive minhash kernel runs ONCE for both writes
          val sigs = Checkpoints.stage(rawSigs,
            Checkpoints.configured(docs.sparkSession))
          Bucketing.ensureBucketed(bandKeys(sigs, bands, rows),
            bandsTable, buckets, Seq("bk"), fpTag)
          Bucketing.ensureBucketed(sigs, sigsTable, buckets, Seq("doc_id"), fpTag)
          (bandsTable, sigsTable)
        }
      }
    } else (curBands, curSigs)
  }

  // fold ledgers already validated THIS application (appId|table|tag):
  // a repeated fold call in an ingestion loop must cost zero catalog
  // roundtrips (the Bucketing.validated pattern)
  private val foldMemo =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val foldLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // test seam (ConcurrentMaintenanceSpec): invoked by
  // compactMinhashBandIndex between its dels snapshot and the CTAS
  // promote pair — lets a spec drive a racing delete into exactly the
  // window the late-dels merge-forward closes
  private[graft] var compactRaceHook: Option[() => Unit] = None

  /** Fold an ADMITTED batch into a persisted MinHash band index — the
    * q95 incremental-index contract applied to near-dup ingestion
    * (reference analog: the append semantics of `etl/pipeline.py:717-725`).
    * After [[incrementalNearDupPairs]] admits the batch's
    * non-duplicates, their band/sig rows land as NEW BUCKET FILES
    * appended to the two bucketed tables — O(|batch|) work; the corpus
    * rows are never re-read, re-hashed or rewritten — so the next batch
    * dedups against corpus ∪ admitted. Fold ≡ full rebuild
    * (DedupSpec): folding batch B into index(A) yields tables row-equal
    * to [[ensureMinhashBandIndex]](A ∪ B).
    *
    * Idempotent per `batchTag`: folded tags are recorded in the bands
    * table's TBLPROPERTIES (`graft.folds`), so a replayed ingestion
    * batch (driver retry, at-least-once upstream) is a no-op rather
    * than a double-append. The crash window between the two appends and
    * the ledger write is closed by an INTENT property
    * (`graft.folds.intent`, set before the appends): a replay of a tag
    * whose intent is still standing probes each table for the batch's
    * doc_ids and re-appends only the table whose append never committed
    * (Spark appends are all-or-nothing via the commit protocol), so a
    * crashed fold REPAIRS on replay instead of double-appending — the
    * probe scan is paid only on that crash-replay path, never in the
    * O(|batch|) happy path. A rebuild through [[ensureMinhashBandIndex]]
    * (new srcTag/schema) drops the table and with it the fold ledger —
    * folds always belong to exactly one base lineage. Caller contract:
    * `admitted` holds NEW doc_ids only (admission filtered them);
    * re-folding an id that is already indexed is the caller's bug, same
    * as any append sink.
    */
  def foldIntoMinhashBandIndex(
      admitted: DataFrame,
      tablePrefix: String,
      batchTag: String,
      shingleN: Int = 3,
      bands: Int = 16,
      rows: Int = 4,
      buckets: Int = 8,
      seed: Long = 7L): Unit = {
    require(!batchTag.contains(","),
      s"batchTag must not contain ',' (the fold-ledger separator): '$batchTag'")
    val spark      = admitted.sparkSession
    val memoKey    = s"${spark.sparkContext.applicationId}|$tablePrefix|fold|$batchTag"
    if (foldMemo.contains(memoKey)) return
    // locks key on the PREFIX (stable across generation promotes), and
    // the physical pair resolves UNDER the lock so a fold never appends
    // to a generation a concurrent compaction is retiring
    foldLocks.computeIfAbsent(tablePrefix, _ => new Object).synchronized {
      if (foldMemo.contains(memoKey)) return
      WriterLease.withLease(spark,
          WriterLease.lockPathFor(spark, "default", tablePrefix)) {
      val (bandsTable, sigsTable) = currentIndexTables(spark, tablePrefix)
      val props = spark.sql(s"SHOW TBLPROPERTIES $bandsTable").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val folded = props.get("graft.folds")
        .map(_.split(",").toSet).getOrElse(Set.empty)
      if (!folded.contains(batchTag)) {
        // a standing intent for THIS tag means a previous attempt
        // crashed between its appends and the ledger write — probe each
        // table before re-appending (repair instead of double-append).
        // The intent is a SET (one crashed tag must survive other tags
        // folding in between), trimmed to tags still absent from the
        // ledger so it can't grow past the crash population
        val intents = props.get("graft.folds.intent")
          .map(_.split(",").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
        val suspect = intents.contains(batchTag)
        // tags whose crash window CONTAINED a tombstone purge
        // (recorded by compactMinhashBandIndex) — for these, "no batch
        // doc present" no longer means "append never landed"
        val purgewin = props.get("graft.folds.purgewin")
          .map(_.split(",").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
        // the re-insert guard (see [[deleteFromMinhashBandIndex]]): a
        // batch that intersects standing tombstones must fail loudly —
        // its old rows are still physical, so the tombstone would kill
        // both versions. One tiny broadcast probe, paid only when a
        // tombstone table exists at all.
        standingDels(spark, bandsTable).foreach { dels =>
          val hit = dels
            .join(broadcast(admitted.select("doc_id").distinct()), "doc_id")
            .limit(1).collect()
          require(hit.isEmpty,
            s"fold batch re-inserts tombstoned doc_id ${hit.headOption.map(_.getLong(0)).getOrElse(-1L)}: " +
              "compact the index first (compaction purges tombstones), " +
              "then re-fold the doc as new")
        }
        val pending = ((intents -- folded) + batchTag).toSeq.sorted
          .mkString(",").replace("'", "''")
        spark.sql(s"ALTER TABLE $bandsTable SET TBLPROPERTIES(" +
          s"'graft.folds.intent'='$pending')")
        // owned stage, released once both appends land: an ingestion
        // loop folding batches for the session's lifetime must not
        // accumulate one staged block per batch
        val staged = Checkpoints.stageOwned(
          minhashSignaturesPortable(admitted, shingleN, bands * rows, seed),
          Checkpoints.configured(spark))
        try {
          val sigs = staged.df
          // an append is all-or-nothing (commit protocol), so under a
          // standing intent "any batch doc_id present" ⇔ "that table's
          // append landed" — paid only on the crash-replay path
          def landed(table: String): Boolean = suspect && !spark.table(table)
            .join(broadcast(sigs.select("doc_id").distinct()), "doc_id")
            .isEmpty
          // crash-replay REPAIR must not resurrect deleted docs:
          // between the crash and the replay, batch docs may have been
          // tombstoned and the index compacted (purging the dels
          // table), so the landed sibling now holds only the
          // SURVIVORS — re-appending the full batch to the missing
          // table would diverge sigs from bands and bring deleted
          // signatures back into verification joins. On the suspect
          // path, the missing table gets only the doc_ids the landed
          // sibling still holds (the batch-ids broadcast keeps the
          // probe tiny; paid only on crash-replay). A batch deleted IN
          // FULL and compacted away leaves no survivors at all — that
          // replay is refused above via the purge-window ledger (the
          // standing-tombstone guard covers the uncompacted case
          // loudly), so no silent re-append can resurrect a completed
          // takedown.
          def survivorsOf(sibling: String)(df: DataFrame): DataFrame =
            if (!suspect) df
            else df.join(
              broadcast(spark.table(sibling)
                .join(broadcast(sigs.select("doc_id").distinct()), "doc_id")
                .select("doc_id").distinct()),
              Seq("doc_id"), "left_semi")
          val bandsLanded = landed(bandsTable)
          val sigsLanded  = landed(sigsTable)
          // the UNDECIDABLE region, now fenced (it used to be merely
          // documented): when a purge ran inside this tag's crash
          // window and NEITHER side holds any batch doc, a batch
          // deleted in full and physically purged is indistinguishable
          // from one whose appends never landed — silently re-appending
          // would resurrect a completed takedown, silently skipping
          // would drop a never-indexed batch. Refuse loudly and demand
          // an explicit operator decision under a fresh tag (the tag
          // stays poisoned in the intent + purge ledgers).
          if (suspect && purgewin.contains(batchTag) &&
              !bandsLanded && !sigsLanded)
            throw new IllegalStateException(
              s"fold replay of crashed tag '$batchTag' is undecidable: " +
                "a tombstone purge ran while its intent was standing, " +
                "so a batch deleted in full and compacted away is " +
                "indistinguishable from one whose appends never " +
                "landed. Re-submit under a NEW batchTag if the batch " +
                "should (re-)enter the index.")
          // append resolves columns BY NAME and must match the table's
          // bucket spec exactly — same keys/counts as ensureMinhashBandIndex
          if (!bandsLanded) {
            val out = if (sigsLanded) survivorsOf(sigsTable)(bandKeys(sigs, bands, rows))
                      else bandKeys(sigs, bands, rows)
            out.write.mode("append").format("parquet")
              .bucketBy(buckets, "bk").sortBy("bk")
              .saveAsTable(bandsTable)
          }
          if (!sigsLanded) {
            val out = if (bandsLanded) survivorsOf(bandsTable)(sigs) else sigs
            out.write.mode("append").format("parquet")
              .bucketBy(buckets, "doc_id").sortBy("doc_id")
              .saveAsTable(sigsTable)
          }
        } finally staged.release()
        val ledger = (folded + batchTag).toSeq.sorted.mkString(",")
          .replace("'", "''")
        val remaining = (intents -- folded - batchTag).toSeq.sorted
          .mkString(",").replace("'", "''")
        // a tag resolved decidably (something landed → survivors
        // repair) leaves the purge-window ledger
        val remainingPurge = (purgewin - batchTag).toSeq.sorted
          .mkString(",").replace("'", "''")
        spark.sql(s"ALTER TABLE $bandsTable SET TBLPROPERTIES(" +
          s"'graft.folds'='$ledger','graft.folds.intent'='$remaining'," +
          s"'graft.folds.purgewin'='$remainingPurge')")
        // files-per-bucket AUTO-COMPACTION policy (the IVF
        // maybeAutoCompactCells contract for the table-backed index):
        // every fold appends one file set per bucket, so when the bands
        // table averages ≥ `spark.graft.index.autoCompactFilesPerBucket`
        // files per bucket (default 32; ≤0 disables), the crash-safe
        // compactor runs under the lock this fold already holds. The
        // check is one catalog file listing — driver metadata, bounded
        // BECAUSE the policy keeps the count low. Tombstone purge rides
        // along, so a delete-heavy tier is cleaned on the same cadence.
        // defensive parse (Similarity.confInt): a typo'd conf value
        // must not abort the fold after its appends already landed
        val threshold = Similarity.confInt(
          spark, "spark.graft.index.autoCompactFilesPerBucket", 32)
        if (threshold > 0 &&
            spark.table(bandsTable).inputFiles.length >= threshold * buckets)
          compactMinhashBandIndex(spark, tablePrefix, buckets)
      }
      }
      foldMemo.add(memoKey)
      ()
    }
  }

  /** Tombstone DELETION from a maintained [[ensureMinhashBandIndex]]
    * lineage — [[graft.operators.Similarity.deleteFromIvfIndex]]'s
    * contract for the band index (reference analog: the replace
    * semantics of `etl/pipeline.py:698-716`): `delIds` (a `doc_id`
    * column) appends to the lineage's `<prefix>_dels` table —
    * O(|delete|) work, the band/sig tables untouched — and every
    * reader ([[liveIndexTable]]) excludes the docs immediately, so the
    * next batch can re-admit text that only the deleted docs
    * duplicated. Physical purge rides [[compactMinhashBandIndex]],
    * which drops the dead rows from both tables and the dels table in
    * the same pass: delete∘compact ≡ rebuild-from-remainder (q125
    * gates this against the oracle).
    *
    * Idempotent per `delTag` (ledger in the bands table's
    * `graft.dels` TBLPROPERTIES, the fold-ledger pattern) — and
    * naturally idempotent even without it: a crash between the append
    * and the ledger write replays as duplicate tombstone rows, which
    * anti-join semantics make harmless. Deleting a never-indexed doc
    * is likewise a no-op. Re-INSERTING a deleted doc requires a
    * compaction in between (the fold path rejects batches that
    * intersect standing tombstones — the old rows are still physical).
    */
  def deleteFromMinhashBandIndex(
      delIds: DataFrame,
      tablePrefix: String,
      delTag: String): Unit = {
    require(!delTag.contains(","),
      s"delTag must not contain ',' (the ledger separator): '$delTag'")
    val spark   = delIds.sparkSession
    val memoKey = s"${spark.sparkContext.applicationId}|${tablePrefix}_dels|$delTag"
    if (foldMemo.contains(memoKey)) return
    foldLocks.computeIfAbsent(tablePrefix, _ => new Object).synchronized {
      if (foldMemo.contains(memoKey)) return
      WriterLease.withLease(spark,
          WriterLease.lockPathFor(spark, "default", tablePrefix)) {
      val (bandsTable0, _) = currentIndexTables(spark, tablePrefix)
      val props = spark.sql(s"SHOW TBLPROPERTIES $bandsTable0").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val dels = props.get("graft.dels")
        .map(_.split(",").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
      if (!dels.contains(delTag)) {
        // append into the ACTIVE generation's dels table, then
        // re-resolve: a cross-process compaction (the prefix lock is
        // JVM-local) that promoted between the resolve and the append
        // would leave the tombstone in a superseded generation no new
        // reader applies — re-append to the generation that won
        // (duplicate rows in the loser are harmless anti-join no-ops;
        // it retires age-gated with its pair). The graft.dels LEDGER
        // rides the same loop so the winning bands table records the
        // tag.
        var bandsTable = bandsTable0
        var settled    = false
        var rounds     = 0
        while (!settled && rounds < 6) {
          val delsTable = delsTableFor(bandsTable)
          // first delete of a generation CREATES its dels table — clear
          // any orphaned same-name warehouse dir first (the recurring
          // LOCATION_ALREADY_EXISTS class: a fresh JVM's empty catalog
          // over a dir left by a previous process)
          if (!spark.catalog.tableExists(delsTable))
            graft.pipeline.Cleanup.ensureWritable(spark, "default", delsTable)
          delIds.select(col("doc_id").cast("long").as("doc_id"))
            .write.mode("append").format("parquet").saveAsTable(delsTable)
          val cur = spark.sql(s"SHOW TBLPROPERTIES $bandsTable").collect()
            .map(r => r.getString(0) -> r.getString(1)).toMap
            .get("graft.dels")
            .map(_.split(",").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
          val ledger = (cur + delTag).toSeq.sorted.mkString(",")
            .replace("'", "''")
          spark.sql(s"ALTER TABLE $bandsTable SET TBLPROPERTIES(" +
            s"'graft.dels'='$ledger')")
          val (now, _) = currentIndexTables(spark, tablePrefix)
          settled = now == bandsTable
          bandsTable = now
          rounds += 1
        }
        // the memo/ledger entry is the delete's durability witness —
        // recording an UNSETTLED tag would make its replay a no-op
        // while the tombstone sits in a retiring generation (served-
        // undeleted, permanently). Six promotes inside one delete
        // means a writer is compacting outside the writer lease:
        // refuse loudly, keep the tag replayable.
        require(settled,
          s"delete '$delTag' on lineage '$tablePrefix' could not " +
            "settle: the active generation changed through 6 " +
            "consecutive append attempts (a concurrent writer is " +
            "compacting outside the writer lease). The tag is " +
            "replayable — retry once the lineage is quiescent.")
        // TOMBSTONE-DEBT bound (the [[graft.operators.Similarity
        // .deleteFromIvfIndex]] contract for the table-backed index):
        // every live read broadcast-anti-joins the dels table, so its
        // row count must stay broadcast-sized — the delete path counts
        // it (one job over the small dels files) and compacts under
        // the lock it already holds once standing tombstones cross
        // `spark.graft.index.autoCompactTombstoneRows` (default 1M;
        // ≤0 disables).
        // distinct ids, not rows (the IVF debt check's contract):
        // replayed deletes append duplicate tombstone rows, and the
        // broadcast build side every read pays is deduped anyway.
        // compactMinhashBandIndex derives the bucket count from the
        // standing table's bucket spec (buckets=0 sentinel), so a
        // lineage built with a non-default count is NOT silently
        // re-bucketed — a later fold's append would fail on the
        // bucket-spec mismatch otherwise.
        val debtCap = Similarity.confInt(
          spark, "spark.graft.index.autoCompactTombstoneRows", 1 << 20)
        if (debtCap > 0 &&
            standingDels(spark, bandsTable).exists(
              _.select("doc_id").distinct().count() >= debtCap.toLong))
          compactMinhashBandIndex(spark, tablePrefix)
      }
      }
      foldMemo.add(memoKey)
      ()
    }
  }

  /** Small-file compaction for a fold-heavy [[ensureMinhashBandIndex]]
    * — [[graft.operators.Similarity.compactIvfCells]]'s contract for
    * the OTHER maintained index family: every
    * [[foldIntoMinhashBandIndex]] appends one bucket-file set per
    * batch, so a long-lived ingestion tier accumulates O(batches)
    * files per bucket; this rewrites both tables to ~one file per
    * bucket (aligning the shuffle partitioner with the bucket hash so
    * each writer task holds one whole bucket) and preserves every
    * `graft.*` table property — the Bucketing validity key AND the
    * fold ledger survive, so repeated ensure calls stay zero-cost and
    * a replayed batch tag still no-ops. Rows are unchanged (DedupSpec
    * pins row equality and pair-output parity).
    *
    * Promote contract (the path-layout compactor's manifest flip,
    * expressed in catalog terms): the rewrite lands as a NEW
    * generation pair (`<prefix>_{bands,sigs}_g<nano>`), each created
    * by ONE CTAS that attaches the copied `graft.*` ledger props in
    * the same catalog op — the bands creation, last of the pair, IS
    * the promote [[currentIndexTables]] resolves. No drop window:
    * a crash at any point leaves either the old generation active
    * (new one retired as an orphan by the next maintenance entry) or
    * the new one fully promoted, ledger attached. The superseded
    * generation is retained one compaction cycle for scans already in
    * flight, then retired.
    */
  def compactMinhashBandIndex(
      spark: SparkSession,
      tablePrefix: String,
      buckets: Int = 0,
      force: Boolean = false): Unit = {
    foldLocks.computeIfAbsent(tablePrefix, _ => new Object).synchronized {
      if (!spark.catalog.tableExists(
          currentIndexTables(spark, tablePrefix)._1)) return
      WriterLease.withLease(spark,
          WriterLease.lockPathFor(spark, "default", tablePrefix)) {
      // re-resolve UNDER the lease: the pre-lease peek above is only
      // the cheap no-op short-circuit
      val (curBands, curSigs) = currentIndexTables(spark, tablePrefix)
      // NO-OP SHORT-CIRCUIT (scale contract: a scheduled compaction
      // with nothing to do must never rewrite the index). Skip the
      // CTAS rewrite when there are no standing tombstones AND no
      // files were appended since the last rewrite — the promote
      // records its own post-CTAS file counts in `graft.compact.nfiles`
      // at flip time, so a fold (file append) or delete (dels row)
      // re-arms the next compaction, while a gen-0 lineage (no marker)
      // always rewrites. The age-gated generation GC a scheduled
      // compaction owes still runs. `force` is the drill escape for
      // specs exercising the promote machinery itself.
      if (!force && standingDels(spark, curBands).isEmpty) {
        val props0 = spark.sql(s"SHOW TBLPROPERTIES $curBands").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        val unchanged = props0.get("graft.compact.nfiles").exists { v =>
          v.split(",").map(_.toLong) match {
            case Array(nb, ns) =>
              spark.table(curBands).inputFiles.length <= nb &&
                spark.table(curSigs).inputFiles.length <= ns
            case _ => false
          }
        }
        if (unchanged) {
          log.info(s"compactMinhashBandIndex($tablePrefix): nothing to " +
            "purge and no appends since the last rewrite — skipping")
          dropGenerationsExcept(spark, tablePrefix,
            Set(curBands.stripPrefix(s"${tablePrefix}_bands")),
            ageGateHours = Similarity.confLong(
              spark, "spark.graft.index.gcStaleHours", 24L))
          return
        }
      }
      // buckets=0 (the default) derives the count from the standing
      // table's own bucket spec — the rewrite must preserve the layout
      // contract every fold append relies on (append fails loudly on a
      // bucket-spec mismatch), so a caller-free compaction (the
      // tombstone-debt auto-purge path) can never re-bucket a lineage
      // built with a non-default count
      val bk =
        if (buckets > 0) buckets
        else bucketCountOf(spark, curBands).getOrElse(8)
      // tombstone PURGE rides the rewrite ([[deleteFromMinhashBandIndex]]):
      // both tables drop the tombstoned docs, and the NEW generation
      // starts with NO dels table at all — the superseded generation
      // keeps its own dels table, so a scan still reading that
      // generation keeps applying exactly its deletes until the
      // age-gated retirement drops the whole triple (no per-file purge,
      // no window where a reader pairs old band rows with a post-purge
      // tombstone view — the race the maintenance fuzz caught on the
      // path-backed family). A cross-process delete landing
      // mid-rewrite re-appends itself to the winning generation
      // (deleteFromMinhashBandIndex's re-resolve loop). The
      // `graft.dels` LEDGER lives in the bands TBLPROPERTIES (copied
      // into the new generation's CTAS below), so a replayed delete
      // tag still no-ops after its tombstones are purged. Legacy
      // pre-generation-scoped `<prefix>_dels` rows (only standing on a
      // layout last written by the old binary) are consumed here and
      // the table dropped post-promote — a one-time migration window.
      // the snapshot is MATERIALIZED once (owned stage) and reused by
      // both CTAS passes: as a lazy plan it would be evaluated twice,
      // and a cross-process delete appending between the two
      // evaluations would yield a generation whose bands and sigs
      // DISAGREE on purged docs. The staged block also serves as the
      // baseline for the post-promote late-dels forward below.
      val delsStaged = standingDels(spark, curBands).map(d =>
        Checkpoints.stageOwned(d.select("doc_id").distinct(),
          Checkpoints.configured(spark)))
      try {
      val delsSnapshot = delsStaged.map(_.df)
      // test seam (ConcurrentMaintenanceSpec): runs between the dels
      // snapshot and the CTAS promote pair, simulating a delete landed
      // by a lease-broken or pre-lease writer inside exactly the window
      // the late-dels merge-forward below closes — the lease's per-JVM
      // re-entrancy lets the seam drive the real
      // deleteFromMinhashBandIndex path on this thread
      compactRaceHook.foreach(h => h())
      val legacyDels   = s"${tablePrefix}_dels"
      val hadDels      = delsSnapshot.isDefined
      // the purge-window ledger (names only, O(crashed tags)): a purge
      // that runs while a crashed fold's intent is STANDING makes that
      // tag's eventual replay undecidable when nothing of the batch
      // survived — record those tags so the replay refuses the silent
      // re-append (see foldIntoMinhashBandIndex)
      val bandProps = spark.sql(s"SHOW TBLPROPERTIES $curBands").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      def tagSet(k: String): Set[String] = bandProps.get(k)
        .map(_.split(",").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
      val purgewin =
        if (!hadDels) tagSet("graft.folds.purgewin")
        else tagSet("graft.folds.purgewin") ++
          (tagSet("graft.folds.intent") -- tagSet("graft.folds"))
      // epoch-nanos, not boot-relative nanoTime: stamps must order
      // correctly across processes and stamp widths (Similarity.genStamp)
      val newSfx = s"_g${Similarity.genStamp()}"
      val curSfx = curBands.stripPrefix(s"${tablePrefix}_bands")
      // sigs first, bands LAST: resolution requires the sigs twin, so
      // the bands CTAS is the single catalog event that promotes the
      // generation — ledger props attached in the same op
      Seq((curSigs, s"${tablePrefix}_sigs$newSfx", "doc_id"),
          (curBands, s"${tablePrefix}_bands$newSfx", "bk"))
        .foreach { case (src, destTable, key) =>
          val copied = spark.sql(s"SHOW TBLPROPERTIES $src").collect()
            .map(r => r.getString(0) -> r.getString(1))
            .filter(_._1.startsWith("graft.")).toMap
          val props =
            if (src == curBands && purgewin.nonEmpty)
              copied + ("graft.folds.purgewin" ->
                purgewin.toSeq.sorted.mkString(","))
            else copied
          val live = delsSnapshot match {
            case Some(dels) =>
              // already distinct and physically staged — both CTAS
              // passes anti-join the same materialized id set
              spark.table(src).join(
                broadcast(dels), Seq("doc_id"), "left_anti")
            case None => spark.table(src)
          }
          val staged = Checkpoints.stageOwned(
            live.repartition(bk, col(key)),
            Checkpoints.configured(spark))
          try {
            val view = s"${destTable}_ctas_src"
            staged.df.createOrReplaceTempView(view)
            val propsSql =
              if (props.isEmpty) ""
              else props.toSeq.sorted.map { case (k, v) =>
                s"'${k.replace("'", "''")}'='${v.replace("'", "''")}'"
              }.mkString(" TBLPROPERTIES(", ",", ")")
            spark.sql(
              s"CREATE TABLE $destTable USING parquet " +
                s"CLUSTERED BY ($key) SORTED BY ($key) INTO $bk BUCKETS" +
                s"$propsSql AS SELECT * FROM $view")
            spark.catalog.dropTempView(view)
          } finally staged.release()
        }
      // record the fresh generation's file counts: the no-op
      // short-circuit above compares against these, so only a fold's
      // append (or a delete's dels row) re-arms the next rewrite
      val newBands = s"${tablePrefix}_bands$newSfx"
      val newSigs  = s"${tablePrefix}_sigs$newSfx"
      spark.sql(s"ALTER TABLE $newBands SET TBLPROPERTIES(" +
        s"'graft.compact.nfiles'='${spark.table(newBands).inputFiles.length}," +
        s"${spark.table(newSigs).inputFiles.length}')")
      // LATE-DELS merge-forward (defense in depth below the writer
      // lease, the band-index analog of compactIvfCells' late-tombstone
      // copy): a delete landed by a writer whose lease was stale-broken
      // — or by a pre-lease binary — between the snapshot and the
      // bands-CTAS promote settles in the SUPERSEDED generation's dels
      // table with its ledger tag recorded there, so it would replay
      // as a no-op while the new generation serves the doc undeleted.
      // Forward rows standing on the old generation that the snapshot
      // did not consume into the new generation's dels table, and merge
      // the late ledger tags. One tiny probe per compaction; duplicate
      // rows are anti-join no-ops.
      standingDels(spark, curBands).foreach { cur =>
        val late = delsSnapshot match {
          case Some(snap) =>
            cur.select("doc_id").join(broadcast(snap), Seq("doc_id"),
              "left_anti")
          case None => cur.select("doc_id")
        }
        if (!late.isEmpty) {
          val newDels = delsTableFor(newBands)
          if (!spark.catalog.tableExists(newDels))
            graft.pipeline.Cleanup.ensureWritable(spark, "default", newDels)
          late.write.mode("append").format("parquet").saveAsTable(newDels)
          val lateTags = spark.sql(s"SHOW TBLPROPERTIES $curBands")
            .collect().map(r => r.getString(0) -> r.getString(1)).toMap
            .getOrElse("graft.dels", "")
            .split(",").filter(_.nonEmpty).toSet
          val newTags = spark.sql(s"SHOW TBLPROPERTIES $newBands")
            .collect().map(r => r.getString(0) -> r.getString(1)).toMap
            .getOrElse("graft.dels", "")
            .split(",").filter(_.nonEmpty).toSet
          if ((lateTags -- newTags).nonEmpty) {
            val merged = (lateTags ++ newTags).toSeq.sorted.mkString(",")
              .replace("'", "''")
            spark.sql(s"ALTER TABLE $newBands SET TBLPROPERTIES(" +
              s"'graft.dels'='$merged')")
          }
          log.warn(s"compactMinhashBandIndex($tablePrefix): forwarded " +
            "late tombstone rows from the superseded generation — a " +
            "cross-process delete raced this rewrite outside the " +
            "writer lease")
        }
      }
      // retire everything but the new generation and the one it just
      // superseded — AGE-GATED (same stale window as the IVF side's
      // generation GC): without the gate, two promotes inside one
      // in-flight scan would DROP the tables (and managed files) that
      // scan's listing points at, breaking the keep-reading guarantee
      // the promote contract makes for a single promote
      dropGenerationsExcept(spark, tablePrefix, Set(newSfx, curSfx),
        ageGateHours = Similarity.confLong(
          spark, "spark.graft.index.gcStaleHours", 24L))
      // the base `<prefix>_dels` table's rows were consumed by this
      // rewrite (either as gen 0's own dels or as a pre-upgrade legacy
      // leftover): MARK it consumed so new readers skip it — the table
      // itself is retained for scans still reading the superseded
      // generation and retires age-gated with the rest of the family
      if (hadDels && spark.catalog.tableExists(legacyDels))
        spark.sql(
          s"ALTER TABLE $legacyDels SET TBLPROPERTIES('graft.consumed'='true')")
      ()
      } finally delsStaged.foreach(_.release())
      }
    }
  }

  /** Incremental near-dup INGESTION: dedup a NEW batch of documents
    * against the persisted band index of the standing corpus — the
    * production path for continuous corpus growth, where re-running the
    * batch-global [[minhashNearDupPairsPortable]] over corpus+batch
    * would re-shingle and re-hash 100 TB to admit a few GB.
    *
    * Scale shape: only the BATCH is shingled/minhashed (the expensive
    * text kernel); the corpus contributes its compact band/sig tables,
    * consumed in place from their bucket files — the corpus TEXT is
    * never re-read, the corpus side never reshuffles (`bk`-bucketed
    * scan straight into the join; the batch side, |batch|·bands rows,
    * is the broadcast/shuffle side), and signature verification joins
    * the surviving pairs back against the `doc_id`-bucketed sig table.
    * The index-side skew cap mirrors the batch variant's: an over-cap
    * bucket (a boilerplate pile) is dropped whole, counted with a
    * shuffle-free window over the bucketed layout. Folding the admitted
    * batch into the index afterwards is [[foldIntoMinhashBandIndex]]
    * (the q95 incremental-index contract; q109 gates fold ≡ rebuild).
    *
    * Output: (new_doc, dup_of, n_match) — batch→corpus matches with
    * ≥ `minEstJaccardPct`% of signature positions agreeing.
    */
  def incrementalNearDupPairs(
      newDocs: DataFrame,
      bandsTable: String,
      sigsTable: String,
      shingleN: Int = 3,
      bands: Int = 16,
      rows: Int = 4,
      minEstJaccardPct: Int = 50,
      maxBucketSize: Int = 100,
      seed: Long = 7L): DataFrame = {
    val spark  = newDocs.sparkSession
    val sigLen = bands * rows
    val newSigs = Checkpoints.stage(
      minhashSignaturesPortable(newDocs, shingleN, sigLen, seed),
      Checkpoints.configured(spark))
    val newBands = bandKeys(newSigs, bands, rows)
    val idx = cappedBandIndex(spark, bandsTable, maxBucketSize)
    val pairs = idx
      .join(broadcast(newBands.select(col("doc_id").as("new_doc"), col("bk"))), "bk")
      .select(col("new_doc"), col("doc_id").as("dup_of"))
      .distinct()
    // verification: the corpus sig table is the STREAMED side (at scale
    // it is the big one); the pairs×batch-sig product — bounded by the
    // batch's candidate fan-out, never the corpus — is the broadcast
    // build side, so the verify pass is a map-only probe over the
    // doc_id-bucketed sig files
    val probe = pairs.join(
      broadcast(newSigs.select(col("doc_id").as("new_doc"), col("sig").as("sig_a"))),
      "new_doc")
    liveIndexTable(spark, sigsTable, bandsTable)
      .select(col("doc_id").as("dup_of"), col("sig").as("sig_b"))
      .join(broadcast(probe), "dup_of")
      .withColumn("n_match",
        size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _), x => x)).cast("long"))
      .filter(lit(100L) * col("n_match") >= lit(minEstJaccardPct.toLong * sigLen))
      .select(col("new_doc"), col("dup_of"), col("n_match"))
  }

  /** 60-bit md5 SimHash signatures: explode distinct words, one md5 per
    * word, then 60 sum-aggregated bit votes per doc (map-side combine).
    * 60 bits (15 hex chars) keeps every value — including 1<<59 — positive
    * in engines that raise on signed-64 overflow.
    */
  def simhashSignatures60(docs: DataFrame): DataFrame = {
    // spread before the per-word md5 explode (same rationale as
    // minhashSignaturesPortable — the kernel must leave the scan stage)
    val w = spread(docs, "doc_id")
      .select(col("doc_id"), explode(TextFunctions.wordSet(col("text"))).as("word"))
      .select(col("doc_id"), PortableHash.md5Hex60(col("word")).as("h"))
    val voteAggs = (0 until 60).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$j"))
    val bits = (0 until 60).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
    w.groupBy("doc_id")
      .agg(voteAggs.head, voteAggs.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("sig"))
  }

  /** Fused variant of [[simhashSignatures60]]: the whole 60-bit
    * signature in one native pass per row
    * ([[graft.plans.SimHashSig60Expr]]) — no word explode, no 60-vote
    * shuffle; identical output (spec-asserted), so the q24 oracle still
    * mirrors the composed arithmetic. The cheap size() pre-filter
    * mirrors the composed form's explode semantics (wordless docs
    * disappear) without a post-filter on the expensive expression.
    */
  def simhashSignatures60Fused(docs: DataFrame): DataFrame =
    spread(docs, "doc_id")
      .filter(size(TextFunctions.wordSet(col("text"))) > 0)
      .select(col("doc_id"),
        graft.plans.SimHashSig60Expr(TextFunctions.wordSet(col("text"))).as("sig"))

  /** Oracle-checkable SimHash near-dup pairs: 4 bands of 15 bits, bucket
    * cap, exact Hamming verify via popcount of the XOR.
    *
    * The banded (doc_id, sig, band, band_val) set is STAGED before the
    * self-join: without it, each join side replays the whole upstream
    * pipeline — the parquet text scan, the fused SimHash kernel and
    * the bucket-cap window all ran twice (the candidate join duplicates
    * its input subtree; signatures ride the banded rows here, so unlike
    * the MinHash path there is no staged sig frame to damp the replay).
    * One materialization of 4 narrow rows per doc buys scan+kernel+
    * window exactly once at any scale.
    */
  def simhashNearDupPairsPortable(
      docs: DataFrame,
      maxHamming: Int = 16,
      maxBucketSize: Int = 100,
      checkpointDir: Option[String] = None): DataFrame = {
    val withSig = simhashSignatures60Fused(docs)
    val banded0 = withSig.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 15).bitwiseAND(lit(0x7FFFL))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")
    val wBucket = Window.partitionBy("band", "band_val")
    val banded = Checkpoints.stage(
      banded0
        .withColumn("_bn", count(lit(1)).over(wBucket))
        .filter(col("_bn") <= maxBucketSize)
        .drop("_bn"),
      checkpointDir.orElse(Checkpoints.configured(docs.sparkSession)))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r,
        col("l.band") === col("r.band") &&
          col("l.band_val") === col("r.band_val") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** 64-bit SimHash over words — the fused native expression (one
    * xxhash64 per word, one pass; see [[graft.plans.SimHash64Expr]] for
    * why this beats the Column-fold composition, which re-hashed every
    * word 64 times).
    */
  def simhash64(text: Column): Column =
    graft.plans.SimHash64Expr(TextFunctions.wordSet(text))

  /** The original higher-order-function composition, kept as the
    * reference implementation the native expression is asserted
    * against (same role as VectorFunctions.cosine vs CosineSimExpr).
    */
  def simhash64Composed(text: Column): Column = {
    val words = TextFunctions.wordSet(text)
    // Per-word ±1 bit votes as a 64-element array built with
    // compile-time bit indices (shiftright takes a literal Int).
    def bitVotes(w: Column): Column =
      array((0 until 64).map(i =>
        shiftright(xxhash64(w), i).bitwiseAND(1L) * 2L - 1L): _*)
    val votes = aggregate(
      words,
      array_repeat(lit(0L), 64),
      (acc, w) => zip_with(acc, bitVotes(w), _ + _))
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(votes, powers, (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L), _ + _)
  }

  /** SimHash near-dup candidate pairs: docs whose simhash agrees on one
    * of 4 16-bit bands (≤ hamming-distance-ish prefilter), verified by
    * popcount of the XOR. maxHamming bounds the reported distance.
    */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int = 8,
      maxBucketSize: Int = 100): DataFrame = {
    val withSig = docs.select(col("doc_id"), simhash64(col("text")).as("sig"))
    val banded0 = withSig.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")
    val wBucket = Window.partitionBy("band", "band_val")
    val banded = banded0
      .withColumn("_bn", count(lit(1)).over(wBucket))
      .filter(col("_bn") <= maxBucketSize)
      .drop("_bn")
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r,
        col("l.band") === col("r.band") &&
          col("l.band_val") === col("r.band_val") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Benchmark decontamination report: for every training document, how
    * many of its distinct word n-grams also appear in the benchmark/eval
    * set. Training corpora must be scrubbed of eval n-grams before
    * training, or downstream scores are contaminated; the standard test
    * is exactly this n-gram overlap.
    *
    * Scale design (100 TB): the benchmark side is small by nature (eval
    * suites are thousands of documents, not billions), so its distinct
    * shingle set is BROADCAST — the training corpus is scanned once,
    * map-side semi-joined (zero shuffle of the corpus), and the per-doc
    * overlap count partial-aggregates before the one small shuffle on
    * doc_id. The cheap [[TextFunctions.hasShingles]] pre-filter keeps the
    * expensive shingle array from being built twice (see
    * [[minhashSignaturesPortable]]).
    *
    * Output: doc_id, n_shingles, n_overlap, overlap_pct — only documents
    * with at least one overlapping n-gram (clean docs produce no row).
    */
  def contaminationReport(train: DataFrame, bench: DataFrame, n: Int = 5): DataFrame = {
    val benchSh = bench
      .filter(TextFunctions.hasShingles(col("text"), n))
      .withColumn("_tk", TextFunctions.loweredTokens(col("text")))
      .select(explode(TextFunctions.shinglesFromTokens(col("_tk"), n)).as("shingle"))
      .distinct()
    // explode_outer, NOT explode: explode's inferred `size(sh) > 0`
    // filter is pushed below the spread exchange by alias substitution,
    // re-evaluating the whole n-gram build per row on the scan
    // partition (measured: the entire 5 s of this query at sf0.1). The
    // outer variant infers no filter; the isNotNull below sits ON the
    // generated attribute and cannot sink past the Generate.
    spread(train.filter(TextFunctions.hasShingles(col("text"), n)), "doc_id")
      .withColumn("_tk", TextFunctions.loweredTokens(col("text")))
      .withColumn("sh", TextFunctions.shinglesFromTokens(col("_tk"), n))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        explode_outer(col("sh")).as("shingle"))
      .filter(col("shingle").isNotNull)
      .join(broadcast(benchSh), Seq("shingle"), "leftsemi")
      .groupBy("doc_id", "n_shingles")
      .agg(count(lit(1)).as("n_overlap"))
      .withColumn("overlap_pct", expr("(100 * n_overlap) div n_shingles"))
      .select("doc_id", "n_shingles", "n_overlap", "overlap_pct")
  }

  /** Winnowing near-dup pairs: documents sharing ≥ `minShared` winnow
    * fingerprints (char-k-gram rolling-hash window minima — catches
    * copied PASSAGES that word-level Jaccard dilutes away). Inverted
    * index on the fingerprint with document-frequency pruning: a
    * fingerprint present in more than `maxDf` docs is boilerplate and
    * generates no candidates (same hot-key guard as the LSH banders —
    * never all-pairs, and the df cap bounds any single join key's fanout
    * at maxDf², independent of corpus size).
    */
  /** The kernel half of [[winnowNearDupPairs]]: df-pruned
    * (doc_id, fp) winnow fingerprint rows. Split out (un-staged) so the
    * plan-shape audit can probe the kernel-distribution repartition
    * directly; callers should stage the result before any self-join.
    */
  def winnowPrunedFps(
      docs: DataFrame,
      k: Int = 8,
      window: Int = 4,
      maxDf: Int = 20): DataFrame = {
    val fps = spread(docs.filter(length(col("text")) >= k), "doc_id")
      // fused native kernel (plans/WinnowFpExpr) — one pass per row,
      // distributed off the scan partitioning (see spread); outer +
      // post-filter so the inferred size()>0 predicate cannot sink
      // below the exchange and run the kernel on the scan partition
      .select(col("doc_id"),
        explode_outer(graft.plans.WinnowFpExpr.fps(col("text"), k, window)).as("fp"))
      .filter(col("fp").isNotNull)
    // df via a window (not a count+join): pruning then costs ONE
    // evaluation of the expensive winnow subtree
    fps
      .withColumn("df", count(lit(1)).over(Window.partitionBy("fp")))
      .filter(col("df") <= maxDf)
      .drop("df")
  }

  def winnowNearDupPairs(
      docs: DataFrame,
      k: Int = 8,
      window: Int = 4,
      minShared: Int = 3,
      maxDf: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    // STAGED before the self-join: the hoped-for ReusedExchange does
    // NOT survive AQE's broadcast promotion of one side (the committed
    // q55 plan showed the scan + winnow kernel + cap window duplicated
    // under both sides), so materialize the narrow (doc_id, fp) rows
    // once and let both sides read them.
    val pruned = Checkpoints.stage(
      winnowPrunedFps(docs, k, window, maxDf),
      checkpointDir.orElse(Checkpoints.configured(docs.sparkSession)))
    val l = pruned.as("l")
    val r = pruned.as("r")
    l.join(r, col("l.fp") === col("r.fp") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** End-to-end near-duplicate removal: the API a user actually calls.
    * Takes the corpus plus a near-dup pair set (from any of the pair
    * generators above — [[minhashNearDupPairsPortable]],
    * [[simhashNearDupPairsPortable]], [[winnowNearDupPairs]],
    * [[jaccardNearDupPairs]]), clusters the pairs with
    * [[Clusters.connectedComponents]], and anti-joins the corpus against
    * the non-minimum members of each cluster. Exactly one document (the
    * smallest id) survives per duplicate cluster; singletons never enter
    * the pair graph and are untouched.
    *
    * Scale design (100 TB): the drop list is O(|duplicates|), not
    * O(|corpus|) — the anti-join shuffles only ids on the corpus side
    * (AQE broadcasts the drop list when it is small, the common case).
    */
  def nearDedup(
      corpus: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      src: String = "doc_a",
      dst: String = "doc_b",
      checkpointDir: Option[String] = None): DataFrame = {
    val drop = Clusters.duplicatesToDrop(pairs, src, dst, checkpointDir)
      .withColumnRenamed("doc_id", idCol)
    corpus.join(drop, Seq(idCol), "left_anti")
  }
}
