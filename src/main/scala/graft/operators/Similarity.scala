package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design (100 TB): the query side is always tiny (one vector or a
  * small batch) → broadcast it; the corpus side streams through a
  * map-only cosine scan (brute force) or is pre-bucketed by
  * random-hyperplane LSH so each probe touches ~1/2^bits of the corpus.
  * Top-k uses a single partial-agg-friendly sort-limit, not a global
  * collect.
  */
object Similarity {

  /** Exact brute-force top-k by cosine against the vector with id
    * `queryId`. Broadcast single-row query → map-only scan → global
    * top-k (Spark's TakeOrdered, partial per partition).
    */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    embeddings
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", VectorFunctions.cosineFused(col("embedding"), col("q_embedding")))
      .orderBy(col("cos").desc, col("vec_id"))
      .select("vec_id", "cos")
      .limit(k)
  }

  /** Oracle-exact brute-force top-k: same broadcast + map-only scan +
    * TakeOrdered plan as [[bruteForceTopK]], but over fixed-point
    * quantized vectors so the ranking cosine is an IEEE-identical double
    * on every engine (CAST(dot)/sqrt(CAST(nrm)·CAST(qn)) of identical
    * longs — the q51 pattern). Emits the exact integer `dot` so the
    * result is hash-checkable, not just id-checkable.
    */
  def bruteForceTopKPortable(embeddings: DataFrame, queryId: Long, k: Int): DataFrame =
    bruteForceTopKPortableScored(embeddings, queryId, k).select("vec_id", "dot")

  /** [[bruteForceTopKPortable]] that also emits the ranking cosine
    * itself — `CAST(dot)/sqrt(CAST(nrm)·CAST(qn))` of identical longs
    * is the same IEEE double on every engine — for consumers that need
    * the ORDER KEY, not just the ordered ids (rank fusion,
    * [[Hybrid]]).
    */
  def bruteForceTopKPortableScored(
      embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val b = embeddings
      .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("q"))
      .withColumn("nrm", VectorFunctions.qdot(col("q"), col("q")))
    val qrow = b.filter(col("vec_id") === queryId)
      .select(col("q").as("qvec"), col("nrm").as("qn"))
    b.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qrow))
      .withColumn("dot", VectorFunctions.qdot(col("q"), col("qvec")))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("nrm").cast("double") * col("qn").cast("double")))
      .orderBy(col("cos").desc, col("vec_id"))
      .select("vec_id", "dot", "cos")
      .limit(k)
  }

  /** Batch exact top-k: for every query vector (small table, broadcast),
    * the k nearest corpus vectors. Window rank per query.
    */
  def bruteForceTopKBatch(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries.select(
        col("vec_id").as("query_id"), col("embedding").as("q_embedding"))))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", VectorFunctions.cosineFused(col("embedding"), col("q_embedding")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** LSH-bucketed ANN: corpus pre-hashed into 2^nBits hyperplane buckets;
    * a probe only scans its own bucket (plus Hamming-1 neighbors when
    * multiProbe). At 100 TB the bucketed corpus is written once
    * (partitioned by bucket) and each query is a pruned scan.
    */
  def lshTopK(
      embeddings: DataFrame,
      queryId: Long,
      k: Int,
      nBits: Int = 4,
      seed: Long = 42L,
      dim: Int = 64,
      multiProbe: Boolean = true): DataFrame = {
    val planes = VectorFunctions.seededPlanes(seed, dim, nBits)
    val bucketed = embeddings.withColumn(
      "bucket", VectorFunctions.hyperplaneBucket(col("embedding"), planes))
    val q = bucketed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"), col("bucket").as("q_bucket"))
    val probeBuckets =
      if (multiProbe)
        explode(array(col("q_bucket") +:
          (0 until nBits).map(i => col("q_bucket").bitwiseXOR(lit(1L << i))): _*))
      else col("q_bucket")
    val probes = q.select(col("q_embedding"), probeBuckets.as("bucket")).distinct()
    bucketed
      .filter(col("vec_id") =!= queryId)
      .join(broadcast(probes), Seq("bucket"))
      .withColumn("cos", VectorFunctions.cosineFused(col("embedding"), col("q_embedding")))
      .orderBy(col("cos").desc, col("vec_id"))
      .select("vec_id", "cos")
      .limit(k)
  }

  /** Oracle-checkable LSH ANN: same plan shape as [[lshTopK]] (bucketed
    * probe + broadcast query + top-k) but over fixed-point quantized
    * vectors, so bucket assignment is exact integer arithmetic and the
    * ranking cosine is an IEEE-identical double on every engine
    * (CAST(dot)/sqrt(CAST(na)·CAST(nb)) of identical longs).
    */
  def lshTopKPortable(
      embeddings: DataFrame,
      queryId: Long,
      k: Int,
      nBits: Int = 4,
      seed: Long = 42L,
      dim: Int = 64,
      multiProbe: Boolean = true): DataFrame = {
    val planes = VectorFunctions.quantPlanes(seed, dim, nBits)
    val b = embeddings
      .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("q"))
      .select(col("vec_id"), col("q"),
        VectorFunctions.hyperplaneBucketQ(col("q"), planes).as("bucket"),
        VectorFunctions.qdot(col("q"), col("q")).as("nrm"))
    val qrow = b.filter(col("vec_id") === queryId)
      .select(col("q").as("qvec"), col("bucket").as("qb"), col("nrm").as("qn"))
    val probeBuckets =
      if (multiProbe)
        explode(array(col("qb") +:
          (0 until nBits).map(i => col("qb").bitwiseXOR(lit(1L << i))): _*))
      else col("qb")
    val probes = qrow.select(col("qvec"), col("qn"), probeBuckets.as("bucket")).distinct()
    b.filter(col("vec_id") =!= queryId)
      .join(broadcast(probes), Seq("bucket"))
      .withColumn("dot", VectorFunctions.qdot(col("q"), col("qvec")))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("nrm").cast("double") * col("qn").cast("double")))
      .orderBy(col("cos").desc, col("vec_id"))
      .select("vec_id", "dot")
      .limit(k)
  }

  /** IVF (inverted-file) ANN: the corpus is partitioned into `nCentroids`
    * cells by nearest centroid; a query scans only its `nProbe` closest
    * cells. Complements [[lshTopKPortable]]: IVF cells adapt to the data
    * distribution (centroids are corpus vectors) where LSH planes are
    * data-oblivious.
    *
    * Scale shape (100 TB): centroids are a tiny broadcast table;
    * assignment is a map-only broadcast product + partial-agg argmax
    * (one pass over the corpus, no shuffle of the vectors themselves —
    * only the grouped argmax reduction); in production the assigned
    * corpus is written once partitioned by `cent_id`, after which every
    * query is a partition-pruned scan of nProbe/nCentroids of the data.
    *
    * Oracle-exact: all dots are integer arithmetic over quantized
    * vectors; ranking/argmax doubles derive from identical longs
    * (CAST(dot)/sqrt(CAST·CAST)) so every engine orders identically.
    * Centroid choice is deterministic: the vectors with
    * `vec_id < nCentroids` (a seeded sample in production).
    *
    * `nCentroids` has NO default: pass [[nCentroidsForCorpus]] of the
    * corpus count (or a caller-owned constant with its own scale
    * argument) — a frozen built-in constant is exactly the trajectory
    * that made fixed-C probing linear in the corpus (21.5× wall at the
    * 100× scale point before the adaptive-C fix).
    */
  def ivfTopKPortable(
      embeddings: DataFrame,
      queryId: Long,
      k: Int,
      nCentroids: Int,
      nProbe: Int = 4): DataFrame = {
    val b = embeddings
      .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("q"))
      .withColumn("nrm", VectorFunctions.qdot(col("q"), col("q")))
    val cents = b.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("q").as("cvec"), col("nrm").as("cnrm"))
    def cosOf(dot: Column, na: Column, nb: Column): Column =
      dot.cast("double") / sqrt(na.cast("double") * nb.cast("double"))
    // argmax centroid per vector: broadcast product + struct-max partial agg
    // (ties → larger cent_id; the oracle mirrors with ORDER BY cos, cent_id)
    val assigned = b.crossJoin(broadcast(cents))
      .withColumn("ccos", cosOf(VectorFunctions.qdot(col("q"), col("cvec")),
        col("nrm"), col("cnrm")))
      .groupBy("vec_id")
      .agg(max(struct(col("ccos"), col("cent_id"))).getField("cent_id").as("cent_id"),
        first(col("q")).as("q"), first(col("nrm")).as("nrm"))
    val qrow = b.filter(col("vec_id") === queryId)
      .select(col("q").as("qvec"), col("nrm").as("qn"))
    val probes = cents.crossJoin(broadcast(qrow))
      .withColumn("pcos", cosOf(VectorFunctions.qdot(col("cvec"), col("qvec")),
        col("cnrm"), col("qn")))
      .orderBy(col("pcos").desc, col("cent_id").desc)
      .limit(nProbe)
      .select("cent_id")
    assigned
      .join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qrow))
      .withColumn("dot", VectorFunctions.qdot(col("q"), col("qvec")))
      .withColumn("cos", cosOf(col("dot"), col("nrm"), col("qn")))
      .orderBy(col("cos").desc, col("vec_id"))
      .select("vec_id", "dot")
      .limit(k)
  }

  /** Build the IVF index as a persistent layout (the production write
    * path the in-query [[ivfTopKPortable]] demonstrates): one corpus-wide
    * pass assigns every quantized vector to its argmax-cosine centroid
    * and writes the cells `partitionBy("cent_id")`; the tiny centroid
    * table lands beside them. After this, every probe is a
    * partition-pruned scan of nProbe/nCentroids of the data — the
    * SimilaritySpec file-count proof shows the executed scan touches
    * only the probed cells' files.
    */
  /** Argmax-cosine centroid assignment (broadcast product + struct-max
    * partial agg; ties → larger cent_id). Shared by the one-shot
    * assignment paths and the Lloyd refinement loop.
    */
  private[operators] def assignToCentroids(b: DataFrame, cents: DataFrame): DataFrame =
    b.crossJoin(broadcast(cents))
      .withColumn("ccos",
        VectorFunctions.qdot(col("q"), col("cvec")).cast("double") /
          sqrt(col("nrm").cast("double") * col("cnrm").cast("double")))
      .groupBy("vec_id")
      .agg(max(struct(col("ccos"), col("cent_id"))).getField("cent_id").as("cent_id"),
        first(col("q")).as("q"), first(col("nrm")).as("nrm"))

  /** Lloyd (k-means) refinement of IVF centroids: `iters` rounds of
    * assign-to-nearest / recompute-as-mean over the quantized vectors.
    * Seeded centroids (`vec_id < nCentroids` — arbitrary corpus points)
    * land wherever the ids happen to sit; refinement moves them to the
    * density, which tightens cells and makes a fixed nProbe recall more
    * (the round-4 ask: without this, IVF is a partition scheme, not a
    * quantizer).
    *
    * Scale design: each round is ONE broadcast assignment pass over the
    * corpus (no vector shuffle) plus ONE (cent_id, pos) shuffle of
    * component partial sums — avg is map-side combinable, and the
    * shuffled rows are `nCentroids·dim` triples, independent of corpus
    * size. Component means are re-quantized with `round` so centroids
    * stay exact integer vectors (same arithmetic as every other
    * portable-cosine path); empty cells keep their previous centroid.
    */
  def refineIvfCentroids(b: DataFrame, cents0: DataFrame, iters: Int): DataFrame = {
    var c = cents0
    for (_ <- 1 to iters) {
      val means = assignToCentroids(b, c)
        .select(col("cent_id"), posexplode(col("q")))
        .groupBy("cent_id", "pos")
        .agg(avg(col("col")).as("m"))
        .groupBy("cent_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => round(x.getField("m")).cast("long")).as("cvec"))
        .withColumn("cnrm", VectorFunctions.qdot(col("cvec"), col("cvec")))
      c = c.select(col("cent_id"), col("cvec").as("cvec0"), col("cnrm").as("cnrm0"))
        .join(means, Seq("cent_id"), "left")
        .select(col("cent_id"),
          coalesce(col("cvec"), col("cvec0")).as("cvec"),
          coalesce(col("cnrm"), col("cnrm0")).as("cnrm"))
      // truncate the per-round lineage (tiny table); honors
      // spark.graft.checkpointDir for reliable storage at scale
      c = graft.util.Checkpoints.stage(c)
    }
    c
  }

  def buildIvfIndex(
      embeddings: DataFrame,
      path: String,
      nCentroids: Int,
      refineIters: Int = 0): Unit = {
    val b = embeddings
      .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("q"))
      .withColumn("nrm", VectorFunctions.qdot(col("q"), col("q")))
    val seed = b.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("q").as("cvec"), col("nrm").as("cnrm"))
    val cents =
      if (refineIters <= 0) seed else refineIvfCentroids(b, seed, refineIters)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    assignToCentroids(b, cents)
      .write.mode("overwrite").partitionBy("cent_id").parquet(s"$path/cells")
  }

  /** Probe a [[buildIvfIndex]] layout with a raw query vector: centroid
    * ranking happens driver-side over the ≤nCentroids-row table (a
    * sanctioned tiny collect), then the cells scan is partition-pruned
    * to the chosen nProbe ids. Ranking matches [[ivfTopKPortable]]
    * exactly (quantized integer dots, IEEE-identical cosine ordering).
    */
  def ivfProbe(
      spark: SparkSession,
      path: String,
      queryVec: Seq[Float],
      k: Int,
      nProbe: Int = 4,
      exclude: Option[Long] = None): DataFrame = {
    // HALF-AWAY-FROM-ZERO, matching VectorFunctions.quantize (Spark SQL
    // round) and the oracle's DuckDB round: math.round is floor(x+0.5),
    // which disagrees on negative halves (-62.5 → -62 vs -63) — a
    // corpus with an exactly-representable negative half (e.g.
    // -0.0625f) would silently rank differently on this path
    val qq = queryVec.map { f =>
      val d = f.toDouble * 1000
      if (d >= 0) math.round(d) else -math.round(-d)
    }
    val qn = qq.map(x => x * x).sum
    val cents = spark.read.parquet(s"$path/centroids")
      .select("cent_id", "cvec", "cnrm").collect()
    val probeIds = cents.map { r =>
      val cv  = r.getAs[collection.Seq[Long]]("cvec")
      val dot = cv.iterator.zip(qq.iterator).map { case (a, b) => a * b }.sum
      val cos = dot.toDouble / math.sqrt(r.getAs[Long]("cnrm").toDouble * qn.toDouble)
      (cos, r.getAs[Long]("cent_id"))
    }.sortBy { case (cos, id) => (-cos, -id) }.take(nProbe).map(_._2)
    val qCol = array(qq.map(lit): _*)
    val cells = liveCells(spark, path)
      .filter(col("cent_id").isin(probeIds.toIndexedSeq: _*))
    exclude.fold(cells)(id => cells.filter(col("vec_id") =!= id))
      .withColumn("dot", VectorFunctions.qdot(col("q"), qCol))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("nrm").cast("double") * lit(qn.toDouble)))
      .orderBy(col("cos").desc, col("vec_id"))
      .select("vec_id", "dot")
      .limit(k)
  }

  /** Batched probe of a [[buildIvfIndex]] layout — the serving-
    * throughput shape: N query vectors answered by ONE partition-pruned
    * scan instead of N sequential probes.
    *
    * Centroid ranking is DISTRIBUTED: the query batch becomes a
    * DataFrame, the ≤C-row centroid table is broadcast against it, and
    * a query-partitioned window takes each query's top-nProbe cells —
    * |batch|·C dot products as executor map work (formerly a
    * single-threaded driver loop: ~10¹⁰ driver multiply-adds at the
    * C=65536 clamp × a 10k batch). The probe map (query_id, cent_id,
    * qvec, qn — |batch|·nProbe rows) is staged once and feeds both
    * consumers; the only driver materialization left is the DISTINCT
    * probed cell ids (≤ min(|batch|·nProbe, C) longs — metadata for
    * static partition pruning of the cells scan, same class as
    * [[ivfProbe]]'s sanctioned collect).
    *
    * The cells half is unchanged: the union of probed cells prunes ONE
    * scan, the broadcast probe map fans each scanned row out to only
    * the queries probing its cell, and a query-partitioned window takes
    * each top-k (candidate volume ≈ N·nProbe·√n rows — every shuffle
    * bounded by the batch, never the corpus).
    *
    * Output: (query_id, rk, vec_id, dot), rk = 1-based rank by the
    * portable cosine (identical integer dots + IEEE ordering on every
    * engine — the q51 contract).
    */
  def ivfProbeBatch(
      spark: SparkSession,
      path: String,
      queries: Seq[(Long, Seq[Float])],
      k: Int,
      nProbe: Int = 4,
      excludeSelf: Boolean = true): DataFrame =
    ivfProbeBatchOwned(spark, path, queries, k, nProbe, excludeSelf)._1

  /** [[ivfProbeBatch]] with a CALLER-OWNED lifetime for the staged
    * probe map (the `tfidfTopKOwned` contract): each batch call stages
    * one tiny (|batch|·nProbe-row) probe-map block so the ranking runs
    * once for its two consumers; a long-lived serving driver answering
    * thousands of batches should consume the result, then `release()`
    * the handle — otherwise one block per call accumulates in executor
    * storage for the life of the session.
    */
  def ivfProbeBatchOwned(
      spark: SparkSession,
      path: String,
      queries: Seq[(Long, Seq[Float])],
      k: Int,
      nProbe: Int = 4,
      excludeSelf: Boolean = true): (DataFrame, graft.util.Checkpoints.Staged) = {
    import spark.implicits._
    ivfProbeBatchDfOwned(spark, path,
      queries.toDF("query_id", "emb"), k, nProbe, excludeSelf)
  }

  /** [[ivfProbeBatch]] over a query DATAFRAME (`query_id` LONG, `emb`
    * ARRAY<FLOAT>) — the batch never rides through the driver at all:
    * queries may come straight off a parquet scan, a streaming
    * micro-batch, or an upstream join. The `Seq` overloads are
    * convenience wrappers over this; prefer this form whenever the
    * batch is already distributed data.
    *
    * Scale contract: every term is bounded by the BATCH or by C, never
    * the corpus — the ranking is |batch|·C map work, the staged probe
    * map is |batch|·nProbe rows, and the driver sees only the ≤C
    * distinct probed cell ids (partition-prune literals). The probe map
    * is BROADCAST to the cells scan, so one batch should stay within
    * broadcast size (~10⁵ queries at typical dims); shard a larger
    * stream of queries into such batches — each pays one pruned scan.
    */
  def ivfProbeBatchDf(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      excludeSelf: Boolean = true): DataFrame =
    ivfProbeBatchDfOwned(spark, path, queries, k, nProbe, excludeSelf)._1

  /** [[ivfProbeBatchDf]] with the caller-owned staged-probe-map
    * lifetime (see [[ivfProbeBatchOwned]]).
    */
  def ivfProbeBatchDfOwned(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      excludeSelf: Boolean = true): (DataFrame, graft.util.Checkpoints.Staged) = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .select("cent_id", "cvec", "cnrm")
    // same quantization kernel as the corpus side ([[VectorFunctions
    // .quantize]]), so query and centroid arithmetic stay bit-identical
    val qdf = queries
      .select(col("query_id"),
        VectorFunctions.quantize(col("emb")).as("qvec"))
      .withColumn("qn", VectorFunctions.qdot(col("qvec"), col("qvec")))
    val pw = Window.partitionBy("query_id")
      .orderBy(col("pcos").desc, col("cent_id").desc)
    // the |batch|·C ranking sheds qvec/qn BEFORE the window's
    // partitionBy(query_id) exchange — the crossJoin side is map-only
    // (broadcast nested loop), so the qvec array (~550B/row at dim 64)
    // would otherwise ride the full |batch|·C shuffle just to be
    // re-selected after the filter; ranking on (query_id, cent_id,
    // pcos) alone shrinks that exchange ~20×, and the survivors
    // (|batch|·nProbe rows) get qvec/qn back from a broadcast of the
    // |batch|-row query side
    val ranked = qdf.crossJoin(broadcast(cents))
      .withColumn("pcos",
        VectorFunctions.qdot(col("cvec"), col("qvec")).cast("double") /
          sqrt(col("cnrm").cast("double") * col("qn").cast("double")))
      .select(col("query_id"), col("cent_id"), col("pcos"))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("cent_id"))
    // staged: the distinct-cells prune below and the candidate join both
    // read the ranking — one |batch|·C pass, not two
    val staged = graft.util.Checkpoints.stageOwned(
      ranked.join(broadcast(qdf), Seq("query_id"))
        .select(col("query_id"), col("cent_id"), col("qvec"), col("qn")))
    val probeMap = staged.df
    val probedCells: Seq[Long] =
      probeMap.select("cent_id").distinct().as[Long].collect().toIndexedSeq
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    val cells = liveCells(spark, path)
      .filter(col("cent_id").isin(probedCells: _*))
      .join(broadcast(probeMap), Seq("cent_id"))
    val out =
      (if (excludeSelf) cells.filter(col("vec_id") =!= col("query_id")) else cells)
        .withColumn("dot", VectorFunctions.qdot(col("q"), col("qvec")))
        .withColumn("cos", col("dot").cast("double") /
          sqrt(col("nrm").cast("double") * col("qn").cast("double")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
        .select(col("query_id"), col("rk"), col("vec_id"), col("dot"))
    (out, staged)
  }

  /** The hyperplane count that keeps expected LSH bucket OCCUPANCY at
    * `targetOccupancy` for an `n`-vector corpus: the smallest K with
    * n/2^K ≤ target. THE scale knob for the bucket-collision pair
    * generators — with K fixed, occupancy grows linearly in the corpus
    * and the candidate join grows quadratically (measured at the sf10
    * scale point: 100× vectors → 196× wall for fixed K=6); with K from
    * this formula, candidates stay ≈ n·target/2 — linear.
    *
    * Integer arithmetic only (ceil-div + bit length), NOT
    * `ceil(log2(…))` — a float log straddles integers differently
    * across libm implementations, and the DuckDB oracle mirrors this
    * exact derivation (`length(bin(M-1))`) so both engines always pick
    * the same K. Clamped to [1, 16]: 16 bits = 65,536 buckets, enough
    * for 2M vectors at occupancy 32; the q47 oracle inlines 16 planes.
    */
  def nBitsForOccupancy(n: Long, targetOccupancy: Int = 32): Int = {
    require(targetOccupancy > 0, "targetOccupancy must be positive")
    val m = (n + targetOccupancy - 1) / targetOccupancy // ceil(n/target)
    val k = if (m <= 1L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    (k max 1) min 16
  }

  /** The IVF cell count for an `n`-vector corpus: the power of two
    * nearest √n from above — `2^ceil(bitLength(n-1)/2)` — clamped to
    * [4, 65536]. THE scale knob for IVF (the [[nBitsForOccupancy]]
    * pattern applied to cells): with a FIXED cell count, probe cost is
    * a constant fraction nProbe/C of the corpus — linear in n (measured
    * at the sf10 scale point: 21.5× wall at 100× data for fixed C=32).
    * With C ≈ √n, cell size is also ≈ √n, so BOTH per-query costs —
    * ranking C centroids and scanning nProbe cells — grow as √n:
    * sublinear, and balanced against each other (the classic IVF
    * operating point; skewing C either way makes one of the two legs
    * dominate).
    *
    * Integer arithmetic only (bit length, shift — no float log/sqrt),
    * and the DuckDB oracle derives the same C verbatim from COUNT(*)
    * (`1 << ((length(bin(n-1)) + 1) // 2)`), so both engines always
    * seed the same `vec_id < C` centroid set. Clamp ceiling 65536 =
    * 2^16 cells (√n balance up to ~4B vectors); past that a deployment
    * goes hierarchical (coarse quantizer over cells), not wider.
    */
  def nCentroidsForCorpus(n: Long): Int = {
    if (n <= 1L) 4
    else {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(n - 1) // bitLength(n-1)
      val c  = 1L << ((bl + 1) / 2)
      ((c max 4L) min 65536L).toInt
    }
  }

  // stats/layouts already validated THIS application (appId|path →
  // value): repeated ensure calls must cost zero file reads / Spark
  // jobs (the Bucketing.validated contract — layouts graft itself
  // wrote cannot drift mid-run, landed dirs are immutable).
  private val statsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()
  private val ivfMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val ivfFoldMemo =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // test seam (ConcurrentMaintenanceSpec): invoked by compactIvfCells
  // between its tombstone snapshot and its manifest flip with the
  // superseded generation's dir — lets a spec drive a racing delete
  // into exactly the window the late-tombstone merge-forward closes
  private[graft] var compactRaceHook: Option[String => Unit] = None
  // per-layout build locks (the ResponseCache anti-stampede pattern):
  // concurrent ensure calls on the same layout build it once; the
  // winner's double-check inside the lock makes the loser a no-op
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(path: String): Object =
    buildLocks.computeIfAbsent(path, _ => new Object)

  /** Cheap DATA fingerprint of the frame's input files — (path, length,
    * mtime) per file, md5'd driver-side from FS metadata the scan's
    * FileIndex already listed (no Spark job, no data read). Folded into
    * every layout key so a dataset REGENERATED at the same path with
    * the same schema (new lengths/mtimes — the wiped-and-rebuilt /tmp
    * fixture case) invalidates the staged stats/IVF layout instead of
    * silently serving a stale corpus. Frames with no file inputs
    * (in-memory test data) fingerprint to the empty-digest constant and
    * key on srcTag + schema alone, as before.
    */
  private[operators] def inputFingerprint(df: DataFrame): String = {
    val conf   = df.sparkSession.sessionState.newHadoopConf()
    val digest = java.security.MessageDigest.getInstance("MD5")
    df.inputFiles.sorted.foreach { f =>
      val p  = new org.apache.hadoop.fs.Path(f)
      val st =
        try Some(p.getFileSystem(conf).getFileStatus(p))
        catch { case _: java.io.IOException => None }
      val line =
        st.fold(s"$f|?|?")(s => s"$f|${s.getLen}|${s.getModificationTime}")
      digest.update(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      digest.update(0.toByte)
    }
    digest.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Layout home: co-located with the SESSION WAREHOUSE (the
    * Bucketing/saveAsTable home), not the global java.io.tmpdir —
    * wiping the warehouse resets these sidecars together with the
    * bucketed tables instead of leaving immortal cross-run state.
    * Local-FS warehouses come back as a plain path (test specs touch
    * markers with java.io.File); remote schemes stay fully qualified.
    */
  private def layoutPath(
      spark: SparkSession, kind: String, key: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"_graft_layouts/${kind}_$digest")
    val uri = p.toUri
    if (uri.getScheme == null || uri.getScheme == "file") uri.getPath
    else p.toString
  }

  /** The corpus row count as STAGED METADATA: computed once per source
    * tag, persisted as a sidecar `stats.json` beside the layouts, and
    * read back driver-side (a metadata file read, NOT a Spark action).
    * The ANN planners ([[nBitsForOccupancy]] K for the near-dup
    * buckets, [[nCentroidsForCorpus]] C for IVF) derive their knobs
    * from this, so query planning stops costing a `count()` job per
    * invocation — at 100 TB the count comes from the ingest ledger /
    * catalog stats, never a per-query scan. Idempotence key =
    * srcTag + schema (the ensureBucketed contract: landed inputs are
    * immutable snapshots).
    */
  def ensureCorpusStats(
      df: DataFrame, srcTag: String, fp: Option[String] = None): Long = {
    val spark = df.sparkSession
    val key   = s"$srcTag|stats|fp=${fp.getOrElse(inputFingerprint(df))}" +
      s"|${df.schema.catalogString}"
    val memo  = s"${spark.sparkContext.applicationId}|$key"
    Option(statsMemo.get(memo)).getOrElse {
      val dir  = layoutPath(spark, "embstats", key)
      val path = new org.apache.hadoop.fs.Path(dir, "stats.json")
      val fs   = path.getFileSystem(spark.sessionState.newHadoopConf())
      // per-path lock: concurrent first calls count once, and the
      // corrupt-sidecar rewrite below never races a reader
      val n = lockFor(dir).synchronized {
        // tolerant read — a truncated/corrupt/foreign file at the
        // well-known path means RECOUNT AND REPAIR, never a parse crash
        val parsed: Option[Long] =
          try {
            if (!fs.getFileStatus(path).isFile) None
            else {
              val in = fs.open(path)
              val s =
                try new String(in.readAllBytes(),
                  java.nio.charset.StandardCharsets.UTF_8)
                finally in.close()
              """"n"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
                .flatMap(_.group(1).toLongOption)
            }
          } catch { case _: java.io.IOException => None }
        parsed.getOrElse {
          val c = df.count()
          fs.mkdirs(path.getParent)
          val tmp = new org.apache.hadoop.fs.Path(
            dir, s"stats.json.tmp${System.nanoTime()}")
          val out = fs.create(tmp, true)
          try out.write(s"""{"n": $c}""".getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          fs.delete(path, false)
          if (!fs.rename(tmp, path))
            throw new java.io.IOException(s"could not promote $tmp -> $path")
          c
        }
      }
      statsMemo.put(memo, n)
      n
    }
  }

  /** Idempotent IVF layout build (the [[Bucketing.ensureBucketed]]
    * contract applied to the [[buildIvfIndex]] path layout): cell count
    * adaptive via [[nCentroidsForCorpus]] of the staged corpus count,
    * written once per source tag, reused by every probe. Returns
    * (layout path, cell count). This is what makes IVF serving scale:
    * the O(n·C) assignment pass is INGEST (pay once, amortized over
    * every query), and each query is centroid ranking (√n rows) plus a
    * partition-pruned scan of nProbe cells (√n rows each) — vs the
    * in-query [[ivfTopKPortable]] demonstrator which re-assigns the
    * corpus per call and therefore must keep C frozen.
    */
  def ensureIvfIndex(
      embeddings: DataFrame,
      srcTag: String): (String, Int) = {
    val spark = embeddings.sparkSession
    // one FS-metadata sweep serves both the stats key and the layout key
    val fp    = inputFingerprint(embeddings)
    val n     = ensureCorpusStats(embeddings, srcTag, Some(fp))
    val c     = nCentroidsForCorpus(n)
    val key   = s"$srcTag|ivf|c=$c|fp=$fp" +
      s"|${embeddings.schema.catalogString}"
    val path = layoutPath(spark, "ivf", key)
    val memo = s"${spark.sparkContext.applicationId}|$key"
    if (ivfMemo.get(memo) != path) {
      // per-path lock + marker double-check + atomic promote: two
      // concurrent ensures build once, and a probe never scans a
      // half-written layout (the build lands in a temp sibling and
      // becomes visible with one directory rename)
      lockFor(path).synchronized {
        val dest   = new org.apache.hadoop.fs.Path(path)
        // marker = _SUCCESS of the ACTIVE generation (a compacted
        // layout keeps its completeness witness across promotes)
        def marker = new org.apache.hadoop.fs.Path(
          activeCellsDir(spark, path), "_SUCCESS")
        val fs     = dest.getFileSystem(spark.sessionState.newHadoopConf())
        // a COMPLETE layout resolves lease-free: ensure on the serving
        // path is logically a read, and making it wait on the writer
        // lease would let a long-running compaction in another process
        // stall probes behind a lock they don't need (the generation
        // manifest already gives readers a consistent view through any
        // promote). Only an actual build takes the lease.
        val complete =
          try fs.exists(marker)
          catch { case _: IllegalArgumentException => false } // torn: writer path decides
        if (!complete) WriterLease.withLease(
            spark, WriterLease.lockPathFor(path)) {
        recoverCells(spark, path)
        if (!fs.exists(marker)) {
          val tmp = new org.apache.hadoop.fs.Path(
            s"$path.tmp${System.nanoTime()}")
          buildIvfIndex(embeddings, tmp.toString, nCentroids = c)
          // cross-PROCESS race (the JVM lock only covers this process):
          // if another process promoted a complete layout while we
          // built, ours is the redundant copy — discard it rather than
          // deleting a layout a concurrent probe may be scanning. The
          // layout key already carries a data fingerprint, so both
          // builds are byte-equivalent; losing the race is benign.
          if (fs.exists(marker)) fs.delete(tmp, true)
          else {
            fs.delete(dest, true)
            if (!fs.rename(tmp, dest)) {
              if (fs.exists(marker)) fs.delete(tmp, true) // lost at the wire
              else throw new java.io.IOException(
                s"could not promote IVF layout $tmp -> $dest")
            }
          }
        }
        }
      }
      ivfMemo.put(memo, path)
    }
    (path, c)
  }

  /** Incremental VECTOR ingestion into a standing [[ensureIvfIndex]]
    * layout — the [[Dedup.foldIntoMinhashBandIndex]] contract applied
    * to the serving index: new vectors are quantized, assigned to the
    * EXISTING centroids (one broadcast pass, O(|batch|·C) executor
    * work), and appended as new cell files — O(|batch|) rows written,
    * the corpus cells never re-read or rewritten, so the next probe
    * serves corpus ∪ batch from the same partition-pruned scan. The
    * maintained index is BY CONSTRUCTION the assignment of every
    * vector to the standing centroids (SimilaritySpec pins fold ≡
    * [[assignToCentroids]] over the union); centroids only move on a
    * full [[ensureIvfIndex]] rebuild (new srcTag / fingerprint), which
    * also serves as small-file compaction after many folds — standard
    * IVF maintenance semantics (insert-into-cell, re-train offline).
    *
    * Idempotent per `batchTag`: folded tags are recorded as marker
    * files under `path/folds/` (md5 of the tag — fs-safe), checked
    * through the Hadoop FileSystem API under the per-layout lock, so a
    * replayed ingestion batch (driver retry, at-least-once upstream) is
    * a no-op in this and in any later process. Caller contract: the
    * batch holds NEW vec_ids only — re-folding an indexed id is the
    * caller's bug, same as any append sink.
    */
  /** The fold's entire DISTRIBUTED half, exposed for the shuffle-probe
    * tooling (p03/p04): quantize the batch, broadcast-assign to the
    * layout's standing centroids, shape for the cell append. The one
    * exchange is the assignment's argmax groupBy — |batch| rows
    * (map-side combined from the broadcast crossJoin), each carrying
    * the quantized vector it is about to land in the cell file; the
    * standing corpus cells never ride any exchange, and the append
    * itself is shuffle-free (partitionBy writes per-task files).
    */
  def foldAssignment(newVecs: DataFrame, path: String): DataFrame = {
    val spark = newVecs.sparkSession
    val cents = spark.read.parquet(s"$path/centroids")
      .select("cent_id", "cvec", "cnrm")
    val b = newVecs
      .select(col("vec_id"),
        VectorFunctions.quantize(col("embedding")).as("q"))
      .withColumn("nrm", VectorFunctions.qdot(col("q"), col("q")))
    assignToCentroids(b, cents).select("vec_id", "cent_id", "q", "nrm")
  }

  def foldIntoIvfIndex(
      newVecs: DataFrame,
      path: String,
      batchTag: String): Unit = {
    val spark   = newVecs.sparkSession
    val memoKey = s"${spark.sparkContext.applicationId}|$path|fold|$batchTag"
    if (ivfFoldMemo.contains(memoKey)) return
    lockFor(path).synchronized {
      if (ivfFoldMemo.contains(memoKey)) return
      WriterLease.withLease(spark, WriterLease.lockPathFor(path)) {
      recoverCells(spark, path)
      val tagHash = java.security.MessageDigest.getInstance("MD5")
        .digest(batchTag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      val marker =
        new org.apache.hadoop.fs.Path(path, s"folds/$tagHash")
      val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(marker)) {
        requireNotTombstoned(spark, path, newVecs.select("vec_id"))
        foldAssignment(newVecs, path)
          .write.mode("append").partitionBy("cent_id")
          .parquet(activeCellsDir(spark, path))
        // marker AFTER the append lands (same ordering as the MinHash
        // fold ledger): a crash in between replays the batch — callers
        // needing exactly-once must rebuild, as with any append sink
        fs.mkdirs(marker.getParent)
        val out = fs.create(marker, true)
        try out.write(batchTag.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        // policy check under the already-held layout lock (reentrant)
        maybeAutoCompactCells(spark, path)
      }
      }
      ivfFoldMemo.add(memoKey)
      ()
    }
  }

  // ---- auto-compaction: the policy that keeps a fold tier healthy ----

  /** The files-per-cell AUTO-COMPACTION policy, evaluated after every
    * fold (the r14/r15 ask: the advisor and the crash-safe compactor
    * existed, but nothing ran them — a long-lived fold tier degraded
    * until an operator remembered a function call). When the cells
    * layout averages ≥ `spark.graft.index.autoCompactFilesPerCell`
    * data files per cell (default 32 — each fold appends up to one
    * file set per touched cell, so the default compacts roughly every
    * 32 batches; ≤0 disables), [[compactIvfCells]] runs under the
    * layout lock already held by the fold. Cost of the check: ONE
    * recursive listing of cells/ — driver metadata, and bounded
    * BECAUSE the policy keeps the file count low; the compaction
    * itself is the one inherent shuffle of the index, amortized across
    * the threshold's worth of batches. Tombstone purge rides along,
    * so a delete-heavy tier is physically cleaned on the same cadence.
    *
    * Concurrent probes are SAFE across the promote: compaction writes
    * a new generation and flips the `cells.MANIFEST` pointer in one
    * atomic rename, so a probe constructed during the rewrite resolves
    * the old generation and a scan already in flight keeps its (still
    * physical) old-generation file listing until the age-gated GC —
    * no maintenance window needed (ConcurrentMaintenanceSpec drives a
    * slow probe through an auto-compacting fold to pin this).
    */
  private def maybeAutoCompactCells(
      spark: SparkSession, path: String): Unit = {
    // defensive parse: a malformed conf value must not abort an
    // ingestion fold mid-batch — fall back to the default, loudly
    val threshold = confInt(
      spark, "spark.graft.index.autoCompactFilesPerCell", 32)
    if (threshold > 0) {
      val cellsDir =
        new org.apache.hadoop.fs.Path(activeCellsDir(spark, path))
      val fs = cellsDir.getFileSystem(spark.sessionState.newHadoopConf())
      var files = 0L
      val cells = scala.collection.mutable.HashSet.empty[String]
      try {
        val it = fs.listFiles(cellsDir, true)
        while (it.hasNext) {
          val f = it.next()
          val n = f.getPath.getName
          val parent = f.getPath.getParent.getName
          // skip metadata files AND anything under a metadata dir —
          // the generation-scoped `_tombstones/` rows are not cell
          // files and must not inflate the files-per-cell policy
          if (!n.startsWith("_") && !n.startsWith(".") &&
              !parent.startsWith("_") && !parent.startsWith(".")) {
            files += 1
            cells += parent
          }
        }
      } catch { case _: java.io.IOException => return }
      if (cells.nonEmpty && files >= threshold.toLong * cells.size)
        compactIvfCells(spark, path)
    }
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // conf ints parsed defensively for the maintenance policies: a typo'd
  // value degrades to the default with a loud warning instead of
  // throwing NumberFormatException inside a fold that already appended
  private[operators] def confInt(
      spark: SparkSession, key: String, default: Int): Int =
    spark.conf.getOption(key) match {
      case None => default
      case Some(v) => v.trim.toIntOption.getOrElse {
        log.warn(s"ignoring malformed $key='$v' (not an int); " +
          s"using default $default")
        default
      }
    }

  // Long variant for hour/size-scale knobs, so a deployment that
  // effectively disabled a policy with a beyond-Int value keeps it
  // disabled rather than silently degrading to the default
  private[operators] def confLong(
      spark: SparkSession, key: String, default: Long): Long =
    spark.conf.getOption(key) match {
      case None => default
      case Some(v) => v.trim.toLongOption.getOrElse {
        log.warn(s"ignoring malformed $key='$v' (not a long); " +
          s"using default $default")
        default
      }
    }

  // the one definition of "tombstone/cell DATA file" shared by every
  // reader and the compaction purge — two drifting copies of this
  // predicate would make readers and the purge disagree on which ids
  // are tombstoned
  private[operators] def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  // ---- generation manifest: the atomic cells promote ----
  // A maintained layout's row data lives in a GENERATION directory;
  // `cells.MANIFEST` (one line: the directory's name) is the pointer
  // readers resolve. A layout that has never been compacted has no
  // manifest and resolves to the original `cells/` — so a fresh build
  // costs no extra I/O and old layouts read unchanged. Compaction
  // writes the rewrite to a NEW generation dir and promotes it with
  // ONE atomic pointer flip (create-then-rename-overwrite, POSIX/HDFS
  // atomic), so there is no window where the layout is headless and a
  // scan already in flight keeps reading the old generation's files
  // until the age-gated GC collects them (reference analog: the
  // delete+recreate visibility hole of the replace strategy,
  // etl/pipeline.py:698-716 — which the reference leaves open).

  private val CellsManifest = "cells.MANIFEST"

  // test seam: counts sleeps of the manifest-absence wait loop — the
  // loop must NEVER run on the hot path (manifest present, or cells/
  // standing, or an atomic-flip scheme); a spec pins that the
  // crash-before-first-flip fallback resolves with ZERO retries
  // instead of paying 8×50 ms per resolution, timing-insensitively
  private[graft] val manifestWaitRetries =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Cross-process-comparable generation stamp: nanoseconds since the
    * EPOCH (wall-clock millis plus a sub-millis nano component for
    * same-millis uniqueness). `System.nanoTime` alone is wrong for
    * generation names: it is boot-relative, so stamps from two driver
    * JVMs — the exact cross-process case the writer lease exists for —
    * are mutually incomparable, and even one process's stamps change
    * digit width as uptime crosses 10^k ns (~2.8 h, ~1.2 d, ~11.6 d),
    * breaking any string-ordered comparison. Epoch-nanos are 19 digits
    * until 2262 and numerically above any realistic boot-relative
    * stamp, so legacy layouts keep their age order under the NUMERIC
    * comparisons ([[cellsGenNum]], `Dedup.genSuffixNum`) that replaced
    * string order.
    */
  private val lastGenStamp = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] def genStamp(): Long = {
    val raw = System.currentTimeMillis() * 1000000L +
      java.lang.Math.floorMod(System.nanoTime(), 1000000L)
    // monotonic within the process: two stamps inside one millisecond
    // could otherwise invert (the sub-millis nano component wraps)
    lastGenStamp.updateAndGet(prev => math.max(raw, prev + 1))
  }

  /** Numeric generation number of a cells-sibling name: Some(0) for
    * the gen-0 `cells`, the parsed stamp for `cells.g<digits>`, None
    * for everything else (legacy `cells.old*`/`cells.compact*` and tmp
    * siblings never join the generation ORDER — they stay purely
    * age-gated). Ordering must be numeric, never lexical: standing
    * names may carry different stamp widths (pre-fix boot-relative
    * stamps, other hosts' stamps).
    */
  private[graft] def cellsGenNum(name: String): Option[Long] =
    if (name == "cells") Some(0L)
    else {
      val d = name.stripPrefix("cells.g")
      if ((d ne name) && d.nonEmpty && d.length <= 19 &&
          d.forall(_.isDigit))
        try Some(d.toLong) catch { case _: NumberFormatException => None }
      else None
    }

  // manifest I/O goes through the RAW filesystem: on a local
  // ChecksumFileSystem the hidden .crc sidecar is a SECOND file, so a
  // rename-overwrite of the manifest alone leaves readers verifying new
  // bytes against the stale sidecar (observed as ChecksumException
  // under concurrent probes). HDFS checksums internally per block and
  // passes through unchanged; the manifest is one short line, so the
  // lost crc protection is irrelevant.
  private def manifestFs(
      fs: org.apache.hadoop.fs.FileSystem): org.apache.hadoop.fs.FileSystem =
    fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }

  /** The ACTIVE generation directory of a maintained layout — the one
    * named by `cells.MANIFEST`, or the original `cells/` for a layout
    * that has never been compacted. Every reader and every fold append
    * resolves through this; benches and specs inspecting physical
    * layout state should too.
    */
  def activeCellsDir(spark: SparkSession, path: String): String = {
    val mf = new org.apache.hadoop.fs.Path(path, CellsManifest)
    val fs = manifestFs(mf.getFileSystem(spark.sessionState.newHadoopConf()))
    // Absence of the manifest normally means "never compacted → cells/".
    // When `cells/` survives, that resolution is ALWAYS legitimate —
    // either the layout was never compacted, or a first-ever compaction
    // crashed before its flip (documented crash contract: old
    // generation stays active, and GC never collects `cells/` while
    // nothing superseded it) — so the hot path resolves immediately
    // with no retry sleeps and no globStatus RPCs. Only when cells/ is
    // ALSO gone does absence need interpretation: on a filesystem whose
    // replace primitive is NOT atomic (any scheme outside the
    // file:/hdfs: legs of [[flipCellsManifest]]) a reader could land
    // inside a delete+rename gap — if generation dirs exist the layout
    // HAS been compacted, so wait the gap out rather than guessing.
    // On file:/hdfs: the flip is atomic, so there is no gap to wait
    // for: manifest absent + cells/ absent + generations present is a
    // TORN layout, refused immediately.
    var exists = fs.exists(mf)
    if (!exists &&
        !fs.exists(new org.apache.hadoop.fs.Path(path, "cells"))) {
      def gensPresent: Boolean = {
        val st =
          fs.globStatus(new org.apache.hadoop.fs.Path(path, "cells.g*"))
        st != null && st.nonEmpty
      }
      val atomicFlip = {
        val s = fs.getUri.getScheme
        s == "file" || s == "hdfs"
      }
      var retries = 0
      while (!exists && !atomicFlip && retries < 8 && gensPresent) {
        Thread.sleep(50L); retries += 1; exists = fs.exists(mf)
        manifestWaitRetries.incrementAndGet()
      }
      // a post-promote layout whose cells/ was GC'd MUST have a
      // manifest — refusing loudly beats silently resolving a
      // generation that may no longer exist
      require(exists || !gensPresent,
        s"layout $path has generation dirs but no $CellsManifest and no " +
          "cells/ fallback (torn or non-atomic promote): refusing to " +
          "guess the active generation")
    }
    val name =
      if (!exists) "cells"
      else {
        val in  = fs.open(mf)
        val raw = try {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
          buf.toString("UTF-8").trim
        } finally in.close()
        // a manifest naming anything but an engine-written generation
        // is corruption — fail fast, never silently read a stale dir
        require(raw == "cells" || raw.matches("cells\\.g\\d+"),
          s"corrupt $CellsManifest under $path: '$raw'")
        raw
      }
    new org.apache.hadoop.fs.Path(path, name).toString
  }

  /** Promote generation dir `gen` (a name under `path`) as the layout's
    * active cells: write the pointer to a temp sibling, then one
    * atomic replace. The replace primitive is SCHEME-specific because
    * Hadoop's rename-with-OVERWRITE is only atomic on HDFS — the
    * AbstractFileSystem default (which RawLocalFs inherits) is
    * delete(dst) THEN rename, leaving a window where the manifest does
    * not exist and a reader would fall back to a stale generation. On
    * `file:` we therefore use java.nio's ATOMIC_MOVE (a POSIX rename(2),
    * atomic w.r.t. concurrent opens); everywhere else the FileContext
    * OVERWRITE rename stands (atomic on HDFS, the deploy target).
    */
  private def flipCellsManifest(
      spark: SparkSession, path: String, gen: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val mf   = new org.apache.hadoop.fs.Path(path, CellsManifest)
    val tmp  = new org.apache.hadoop.fs.Path(
      path, s"$CellsManifest.tmp${System.nanoTime()}")
    val fs  = manifestFs(mf.getFileSystem(conf))
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // URI scheme, not FileSystem.getScheme: RawLocalFileSystem (the
    // manifestFs unwrap target) throws UnsupportedOperationException on
    // the latter
    if (fs.getUri.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath),
        java.nio.file.Paths.get(fs.makeQualified(mf).toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        mf.toUri, conf)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(mf),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  // ---- deletion: the tombstone tier of the maintained-index contract ----

  /** The LIVE view of a layout's cells: physical rows minus standing
    * tombstones ([[deleteFromIvfIndex]]). Every probe/stats/rebuild
    * path reads through this, so a delete is SERVED the moment its
    * tombstone lands — no rewrite on the delete path. The tombstone
    * set is bounded between compactions — ENFORCED, not assumed:
    * [[deleteFromIvfIndex]] auto-compacts once the standing set
    * crosses `spark.graft.index.autoCompactTombstoneRows` (default
    * 1M) — so the anti-join build side is an explicit BROADCAST — the cells scan
    * never reshuffles, and the caller's cent_id partition-prune filter
    * still pushes below the join to the scan (left-side predicate).
    */
  def liveCells(spark: SparkSession, path: String): DataFrame = {
    // the manifest promote ([[compactIvfCells]]) leaves no headless
    // window — a reader resolves either the old generation or the new
    // one, both complete. The retry below covers one residual race:
    // resolving a generation whose directory the age-gated GC collects
    // between the manifest read and the parquet listing (a scan that
    // outlived `spark.graft.index.gcStaleHours` re-resolves and reads
    // the current generation). Only path-absence retries — any other
    // analysis error (corrupt layout, bad schema) must fail fast, and
    // a genuinely missing layout costs at most the ~1 s budget once.
    //
    // (cells, tombstones) resolve ATOMICALLY: the tombstone files live
    // INSIDE the generation dir ([[tombstoneDataFiles]]), so whichever
    // generation this read lands on, it applies exactly that
    // generation's standing deletes — a promote racing this
    // construction can not pair old cells with a post-purge tombstone
    // view (served-deleted rows) or vice versa (the PATH_NOT_FOUND
    // the maintenance fuzz caught at seed 31).
    var cells: DataFrame = null
    var gen: String = null
    var attempt = 0
    while (cells == null) {
      try {
        gen = activeCellsDir(spark, path)
        cells = spark.read.parquet(gen)
      } catch {
        case e: org.apache.spark.sql.AnalysisException
            if attempt < 8 &&
              (e.getCondition == "PATH_NOT_FOUND" ||
                String.valueOf(e.getMessage).contains("Path does not exist")) =>
          attempt += 1; Thread.sleep(125L)
      }
    }
    val tomb = tombstoneDataFiles(spark, path, gen)
    if (tomb.nonEmpty)
      cells.join(
        broadcast(spark.read.parquet(tomb: _*).select("vec_id").distinct()),
        Seq("vec_id"), "left_anti")
    else cells
  }

  // Standing tombstone files of ONE generation: `<gen>/_tombstones/`
  // (the underscore prefix keeps Spark's file index from treating them
  // as cell data), plus the pre-generation-scoped legacy location
  // `<path>/tombstones/` — legacy rows are exactly the UN-consumed
  // deletes of an old-binary layout (its compactions deleted consumed
  // files), so they union in as live deletes everywhere. A dir can
  // exist with ZERO data files (crash windows) — spark.read.parquet on
  // it throws UNABLE_TO_INFER_SCHEMA, so every tombstone read goes
  // through this listing and treats the empty dir as "no tombstones"
  // (the same _/. filter compactIvfCells uses).
  private def tombstoneDataFiles(
      spark: SparkSession, path: String, genDir: String): Seq[String] = {
    def ls(dir: org.apache.hadoop.fs.Path): Seq[String] = {
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.map(_.getPath)
        .filter(p => isDataFile(p.getName))
        .map(_.toString)
    }
    ls(new org.apache.hadoop.fs.Path(genDir, "_tombstones")) ++
      ls(new org.apache.hadoop.fs.Path(path, "tombstones"))
  }

  // every standing tombstone file of the layout's ACTIVE generation —
  // the spec-facing resolution (tests must not hardcode the physical
  // location, which moved when tombstones became generation-scoped)
  private[graft] def standingTombstoneFiles(
      spark: SparkSession, path: String): Seq[String] =
    tombstoneDataFiles(spark, path, activeCellsDir(spark, path))

  /** Tombstone DELETION from a maintained [[ensureIvfIndex]] /
    * [[ensureIvfPqIndex]] layout — the missing half of the "never
    * rebuilt, only maintained" contract (the lexical index has folded
    * deletes since q95; reference analog: the replace semantics of
    * `etl/pipeline.py:698-716`). `delIds` (a `vec_id` column) lands as
    * appended rows under `path/tombstones/` — O(|delete|) work,
    * index-size independent; the corpus cells are untouched and every
    * reader ([[liveCells]]) excludes the ids immediately. Physical
    * purge rides [[compactIvfCells]] (or any rebuild), which drops the
    * dead rows and clears the tombstone set in the same pass, so
    * delete∘compact ≡ rebuild-from-remainder (q126/q127 gate this
    * against the oracle; SimilaritySpec pins probe parity).
    *
    * Idempotent per `delTag` (marker under `path/dels/`, the fold-
    * ledger pattern) — and naturally idempotent even WITHOUT the
    * marker: a crash-replayed delete appends duplicate tombstone rows,
    * which anti-join semantics make harmless. Deleting an id that was
    * never indexed is likewise a harmless no-op.
    *
    * Caller contract: re-INSERTING a deleted id (delete X, fold a new
    * X) requires a compaction in between — the fold paths REJECT a
    * batch that intersects standing tombstones, because the old rows
    * are still physically present and the tombstone would kill both
    * versions. Compact purges the old rows and clears the tombstone;
    * after that the id folds as any new id.
    */
  def deleteFromIvfIndex(
      delIds: DataFrame,
      path: String,
      delTag: String): Unit = {
    val spark   = delIds.sparkSession
    val memoKey = s"${spark.sparkContext.applicationId}|$path|del|$delTag"
    if (ivfFoldMemo.contains(memoKey)) return
    lockFor(path).synchronized {
      if (ivfFoldMemo.contains(memoKey)) return
      WriterLease.withLease(spark, WriterLease.lockPathFor(path)) {
      recoverCells(spark, path)
      val tagHash = java.security.MessageDigest.getInstance("MD5")
        .digest(delTag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      val marker = new org.apache.hadoop.fs.Path(path, s"dels/$tagHash")
      val fs     = marker.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(marker)) {
        // append into the ACTIVE generation's tombstone dir, then
        // re-resolve: a cross-process compaction (lockFor is JVM-local)
        // that promoted between the resolve and the append would leave
        // the tombstone in a superseded generation no new reader
        // applies — re-append to the generation that won (duplicate
        // tombstone rows in the loser are harmless anti-join no-ops,
        // and the loser dir ages out whole). Bounded: promotes are
        // rare; 3 attempts outlast any realistic pile-up.
        val ids = delIds.select(col("vec_id").cast("long").as("vec_id"))
        var gen     = activeCellsDir(spark, path)
        var settled = false
        var rounds  = 0
        while (!settled && rounds < 6) {
          ids.write.mode("append").parquet(s"$gen/_tombstones")
          val now = activeCellsDir(spark, path)
          settled = now == gen
          gen = now
          rounds += 1
        }
        // the marker is the delete's durability witness — writing it
        // for an UNSETTLED append would make the tag replay as a no-op
        // while the tombstone sits in a retired generation (the doc
        // would be served undeleted, permanently). Six promotes inside
        // one delete means something outside the writer lease is
        // rewriting the layout in a hot loop: refuse loudly, keep the
        // tag replayable.
        require(settled,
          s"delete '$delTag' on $path could not settle: the active " +
            "generation changed through 6 consecutive append attempts " +
            "(a concurrent writer is compacting outside the writer " +
            "lease). The tag is replayable — retry once the layout is " +
            "quiescent.")
        fs.mkdirs(marker.getParent)
        val out = fs.create(marker, true)
        try out.write(delTag.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        // TOMBSTONE-DEBT bound, enforced not assumed: every read pays
        // a BROADCAST anti-join against the standing tombstones, so
        // their count must stay broadcast-sized. The docs used to
        // assume "deletes are takedown/refresh trickle"; a mass
        // takedown would quietly grow the build side until executors
        // OOM at 100 TB. Now the delete path itself counts the
        // standing set (one job over the small tombstone files, paid
        // only on deletes) and compacts under the already-held lock
        // once it crosses `spark.graft.index.autoCompactTombstoneRows`
        // (default 1M ids ≈ 8 MB of longs broadcast — comfortable;
        // ≤0 disables, restoring the trickle assumption).
        val debtCap = confInt(
          spark, "spark.graft.index.autoCompactTombstoneRows", 1 << 20)
        if (debtCap > 0) {
          val tomb = tombstoneDataFiles(spark, path, gen)
          // distinct ids, not rows: replayed/overlapping deletes append
          // duplicate tombstone rows (harmless by design), and the
          // broadcast build side every read actually pays is deduped —
          // counting rows would trigger premature full-index rewrites
          if (tomb.nonEmpty &&
              spark.read.parquet(tomb: _*)
                .select("vec_id").distinct().count() >= debtCap.toLong)
            compactIvfCells(spark, path)
        }
      }
      }
      ivfFoldMemo.add(memoKey)
      ()
    }
  }

  // the fold-path guard behind the re-insert contract (see
  // [[deleteFromIvfIndex]]): a batch that intersects standing
  // tombstones must fail LOUDLY before the append — the old rows are
  // still physical, so admitting the new ones would make the tombstone
  // kill both. One tiny broadcast-join probe, paid only when a
  // tombstone set exists at all.
  private def requireNotTombstoned(
      spark: SparkSession, path: String, ids: DataFrame): Unit = {
    val tomb = standingTombstoneFiles(spark, path)
    if (tomb.nonEmpty) {
      val hit = spark.read.parquet(tomb: _*)
        .join(broadcast(ids.select("vec_id").distinct()), "vec_id")
        .limit(1).collect()
      require(hit.isEmpty,
        s"fold batch re-inserts tombstoned vec_id ${hit.headOption.map(_.getLong(0)).getOrElse(-1L)}: " +
          "compact the layout first (compaction purges tombstones), " +
          "then re-fold the id as new")
    }
  }

  /** Cell-occupancy telemetry for a [[buildIvfIndex]] layout — the
    * rebuild advisor: per-cell LIVE vector counts (tombstoned rows
    * excluded — the advisor reasons about servable rows) over the
    * partitioned cells layout. The scan projects only the ids the
    * tombstone anti-join needs (`cent_id` is the partition column).
    * Folds ([[foldIntoIvfIndex]]) never move centroids, so occupancy
    * skew grows monotonically with drift between the ingested corpus
    * and the standing centroids — when max/mean crosses the caller's
    * threshold, rebuild ([[ensureIvfIndex]] under a new srcTag), which
    * re-seeds centroids and compacts in one pass. Shuffle: C rows of
    * (cent_id, partial count) — index-size independent.
    */
  def ivfCellStats(spark: SparkSession, path: String): DataFrame =
    liveCells(spark, path)
      .groupBy(col("cent_id").cast("long").as("cent_id"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("cent_id")

  /** Small-file compaction for a fold-heavy [[buildIvfIndex]] layout:
    * every [[foldIntoIvfIndex]] appends one file set per batch, so a
    * long-lived ingestion tier accumulates O(batches) files per cell —
    * this rewrites the cells to ~one file per cell (ONE shuffle of the
    * index, the inherent compaction cost; at 100 TB run it per-cell or
    * accept the rebuild, which compacts for free) into a NEW
    * generation dir and promotes it with one atomic `cells.MANIFEST`
    * pointer flip ([[activeCellsDir]]) — concurrent probes keep
    * working through the promote, reading whichever generation they
    * resolved. Rows, centroids and the fold ledger are
    * untouched — a replayed old batch tag still no-ops after
    * compaction, and probes see identical data (SimilaritySpec pins
    * row equality and probe parity). Schema-agnostic over the cells
    * rows, so the same compactor serves BOTH maintained layouts —
    * [[buildIvfIndex]] (vector cells) and [[buildIvfPqIndex]] (code
    * cells).
    */
  def compactIvfCells(spark: SparkSession, path: String,
      force: Boolean = false): Unit =
    lockFor(path).synchronized {
      WriterLease.withLease(spark, WriterLease.lockPathFor(path)) {
      recoverCells(spark, path)
      val cellsDir =
        new org.apache.hadoop.fs.Path(activeCellsDir(spark, path))
      val fs  = cellsDir.getFileSystem(spark.sessionState.newHadoopConf())
      val gen = new org.apache.hadoop.fs.Path(
        path, s"cells.g${genStamp()}")
      // tombstone PURGE rides the compaction rewrite: the active
      // generation's standing tombstones (plus any legacy-location
      // leftovers) are dropped from the rewrite, and the NEW generation
      // starts with no tombstone dir at all — the old generation keeps
      // its `_tombstones/` INSIDE its own dir, so a scan still reading
      // that generation keeps applying exactly its deletes until the
      // age-gated GC collects the dir whole (no per-file purge, no
      // window where a reader pairs old cells with a post-purge
      // tombstone view). A delete appended by another process
      // mid-rewrite re-appends itself to the winning generation
      // (deleteFromIvfIndex's re-resolve loop), so nothing is lost.
      val tombData = tombstoneDataFiles(spark, path, cellsDir.toString)
      // legacy `<path>/tombstones/` files (pre-generation-scoped
      // layouts only): consumed by this rewrite and deleted after the
      // promote, as the old binary did — a one-time migration window
      val legacyTombDir = new org.apache.hadoop.fs.Path(path, "tombstones")
      val legacyTombFiles: Seq[org.apache.hadoop.fs.Path] =
        if (fs.exists(legacyTombDir))
          fs.listStatus(legacyTombDir).toSeq.map(_.getPath)
        else Seq.empty
      // NO-OP SHORT-CIRCUIT (the compactMinhashBandIndex contract,
      // path-backed side): a scheduled compaction with nothing to do
      // must never rewrite the index. Skip when there are no standing
      // tombstones anywhere AND no cell files were appended since the
      // last rewrite — the promote stamps its post-write data-file
      // count in `_graft_nfiles` inside the new generation dir, so a
      // fold (file append) or delete (tombstone) re-arms the next
      // compaction, while a never-compacted gen-0 `cells/` (no stamp)
      // always rewrites. recoverCells above already ran the age-gated
      // GC a scheduled compaction owes. `force` is the drill escape.
      if (!force && tombData.isEmpty && legacyTombFiles.isEmpty &&
          readNFilesStamp(fs, cellsDir)
            .exists(_ >= countCellDataFiles(fs, cellsDir))) {
        log.info(s"compactIvfCells($path): nothing to purge and no " +
          "appends since the last rewrite — skipping")
        return
      }
      val raw = spark.read.parquet(cellsDir.toString)
      val cells =
        if (tombData.isEmpty) raw
        else raw.join(
          broadcast(spark.read.parquet(tombData: _*)
            .select("vec_id").distinct()),
          Seq("vec_id"), "left_anti")
      // ≤C-row metadata table — the target partition count, so each
      // output task holds ~one whole cell and writes ~one file for it
      val c = spark.read.parquet(s"$path/centroids").count().toInt
      cells
        .repartition(math.max(c, 1), col("cent_id"))
        .write.partitionBy("cent_id").parquet(gen.toString)
      // stamp the rewrite's own data-file count: the no-op
      // short-circuit above compares the active generation's current
      // count against this, so only an append re-arms the rewrite
      writeNFilesStamp(fs, gen, countCellDataFiles(fs, gen))
      // test seam (ConcurrentMaintenanceSpec): runs between this
      // rewrite's tombstone snapshot and the manifest flip, simulating
      // a delete landed by a lease-broken or pre-lease writer exactly
      // inside the window the merge-forward below exists for — the
      // lease's per-JVM re-entrancy lets the seam drive the real
      // deleteFromIvfIndex path on this thread
      compactRaceHook.foreach(h => h(cellsDir.toString))
      // ONE atomic pointer flip: the rewrite landed complete in a new
      // generation dir, and the manifest rename promotes it without a
      // headless window. A crash before the flip leaves the old
      // generation active and the new one an age-gated GC candidate; a
      // crash after it leaves the OLD generation the candidate — no
      // state needs repair, and a scan already in flight keeps reading
      // the old generation's files until [[recoverCells]]' GC collects
      // them (`spark.graft.index.gcStaleHours`, default 24 h).
      flipCellsManifest(spark, path, gen.getName)
      // LATE-TOMBSTONE merge-forward (defense in depth below the
      // writer lease, which already serializes cross-process deletes
      // against this rewrite): a delete landed by a writer whose lease
      // was stale-broken — or by a pre-lease binary — between this
      // rewrite's tombstone snapshot and the flip settles in the
      // SUPERSEDED generation (its re-resolve saw the old manifest)
      // and writes its non-generation-scoped dels marker, so it would
      // replay as a no-op while the new generation serves the doc
      // undeleted. Re-list the old generation's tombstones after the
      // flip and COPY (never move — old-generation scans keep their
      // own view) every file the snapshot did not consume into the new
      // generation. Any file visible here landed before the flip; a
      // delete whose append completes after the flip re-resolves to
      // the new generation itself (deleteFromIvfIndex's settle loop).
      // Duplicated rows are anti-join no-ops.
      val late = tombstoneDataFiles(spark, path, cellsDir.toString)
        .filterNot(tombData.toSet)
      if (late.nonEmpty) {
        val dstDir = new org.apache.hadoop.fs.Path(gen, "_tombstones")
        fs.mkdirs(dstDir)
        late.foreach { f =>
          val src = new org.apache.hadoop.fs.Path(f)
          org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
            new org.apache.hadoop.fs.Path(dstDir, s"fwd_${src.getName}"),
            false, spark.sessionState.newHadoopConf())
        }
        log.warn(s"compactIvfCells($path): forwarded ${late.size} " +
          "late tombstone file(s) from the superseded generation — a " +
          "cross-process delete raced this rewrite outside the writer " +
          "lease")
      }
      // purge only the LEGACY-location files (snapshot only — see
      // above); the active generation's own tombstones stay with its
      // dir and die in the age-gated GC
      legacyTombFiles.foreach(fs.delete(_, false))
      // non-recursive: fails closed if a cross-process delete committed
      // a tombstone between the listing and here
      if (legacyTombFiles.nonEmpty && fs.exists(legacyTombDir) &&
          fs.listStatus(legacyTombDir).isEmpty)
        fs.delete(legacyTombDir, false)
      // post-promote GC: the generation COUNT bound
      // (`spark.graft.index.maxStaleGenerations`, enforced in
      // [[recoverCells]]) must hold immediately after the promote, not
      // only when the next maintenance op happens to run — a hot
      // compaction loop would otherwise stand one extra generation per
      // promote until its next entry point
      recoverCells(spark, path)
      ()
      }
    }

  /** Data files of a cells generation dir (recursive), EXCLUDING the
    * `_tombstones/` side dir and `_`/`.`-prefixed bookkeeping files —
    * the quantity the compaction no-op short-circuit compares against
    * its [[writeNFilesStamp]] stamp. One recursive listing; never a
    * Spark job.
    */
  private def countCellDataFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Long = {
    val it = fs.listFiles(dir, true)
    var n = 0L
    while (it.hasNext) {
      val f    = it.next()
      val name = f.getPath.getName
      val inSide = f.getPath.toString.contains("/_tombstones/")
      if (!inSide && !name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  private def nFilesStampPath(gen: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(gen, "_graft_nfiles")

  /** The post-rewrite data-file count [[compactIvfCells]] stamped into
    * its generation dir; None for a generation without one (gen-0
    * layouts, pre-stamp binaries) — those always rewrite.
    */
  private def readNFilesStamp(
      fs: org.apache.hadoop.fs.FileSystem,
      gen: org.apache.hadoop.fs.Path): Option[Long] =
    try {
      if (!fs.exists(nFilesStampPath(gen))) None
      else {
        val in = fs.open(nFilesStampPath(gen))
        try Some(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
        finally in.close()
      }
    } catch { case _: Exception => None }

  private def writeNFilesStamp(
      fs: org.apache.hadoop.fs.FileSystem,
      gen: org.apache.hadoop.fs.Path,
      n: Long): Unit = {
    val out = fs.create(nFilesStampPath(gen), true)
    try out.write(n.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Housekeeping under the layout lock, run by every maintenance
    * entry point. With the manifest promote ([[compactIvfCells]])
    * there is no crash state to REPAIR — a crash on either side of the
    * atomic pointer flip leaves a complete active generation — so this
    * is (a) garbage collection of superseded generation dirs, crashed
    * rewrite leftovers and legacy `cells.old*`/`cells.compact*`
    * siblings, all age-gated so an in-flight scan (or a live
    * cross-process rewrite) keeps its files, and (b) the one legacy
    * heal kept for layouts written by the pre-manifest binary: a
    * headless layout (no manifest, no `cells/`) restores its newest
    * `cells.old*` sibling instead of letting ensure* rebuild and
    * silently discard the fold ledger.
    */
  private[operators] def recoverCells(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val active = new org.apache.hadoop.fs.Path(
      try activeCellsDir(spark, path)
      catch { case _: java.io.IOException => return })
    val exists =
      try fs.exists(active) catch { case _: java.io.IOException => return }
    val candidates =
      try fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      catch { case _: java.io.IOException => Seq.empty }
    // GC candidates: every cells* sibling that is not the active
    // generation and not the manifest pointer itself — superseded
    // generations, crashed rewrites, manifest temp files, legacy
    // cells.old*/cells.compact* leftovers
    val stale = candidates.filter { s =>
      val n = s.getPath.getName
      n.startsWith("cells") && n != CellsManifest &&
        fs.makeQualified(s.getPath) != fs.makeQualified(active)
    }
    if (!exists)
      stale.map(_.getPath).filter(_.getName.startsWith("cells.old"))
        .sortBy(_.getName).lastOption
        .foreach(old => fs.rename(old, active))
    else {
      // age-gated: a superseded generation may still be under an
      // in-flight scan, and a fresh cells.g*/cells.compact* dir may be
      // a LIVE rewrite in another process (lockFor is JVM-local) —
      // liveness keyed on the NEWEST FILE inside the dir (a very large
      // rewrite keeps writing part files, refreshing its lease for as
      // long as it makes progress; the dir's own mtime only reflects
      // top-level entry creation), window configurable for deployments
      // whose scans or rewrites legitimately run longer.
      val staleHours = confLong(
        spark, "spark.graft.index.gcStaleHours", 24L)
      val tombDir = new org.apache.hadoop.fs.Path(path, "tombstones")
      try {
        if (fs.exists(tombDir)) {
          val st = fs.getFileStatus(tombDir)
          if (fs.listStatus(tombDir).isEmpty &&
              st.getModificationTime <
                System.currentTimeMillis() - staleHours * 3600 * 1000)
            fs.delete(tombDir, false)
        }
      } catch { case _: java.io.IOException => }
      val cutoff = System.currentTimeMillis() - staleHours * 3600 * 1000
      def newestMtime(p: org.apache.hadoop.fs.Path, own: Long): Long = {
        var m = own
        try {
          val it = fs.listFiles(p, true)
          while (it.hasNext) m = math.max(m, it.next().getModificationTime)
        } catch { case _: java.io.IOException => }
        m
      }
      // COUNT bound on top of the age gate (the age gate alone lets a
      // hot compaction loop accumulate generation dirs without limit
      // for gcStaleHours): among SUPERSEDED generations — NUMERIC
      // stamps strictly below the active's ([[cellsGenNum]]; string
      // order breaks across stamp widths and across hosts); anything
      // numbered above may be a live cross-process rewrite that has
      // not flipped yet and stays age-gated only, as do legacy
      // `cells.old*`/`cells.compact*` siblings (no generation number —
      // crashed-rewrite debris, not standing generations, so they
      // never consume count-bound budget) — keep the newest
      // `spark.graft.index.maxStaleGenerations` (default 4, ≤0
      // disables) and delete the excess REGARDLESS of age. Contract
      // shift a reader accepts by design: an in-flight scan survives
      // min(gcStaleHours, K subsequent promotes); liveCells' absence
      // retry re-resolves a scan that outlives either bound.
      val keepStale = confInt(
        spark, "spark.graft.index.maxStaleGenerations", 4)
      val forced: Set[org.apache.hadoop.fs.Path] =
        if (keepStale <= 0) Set.empty
        else {
          val activeGen =
            cellsGenNum(active.getName).getOrElse(Long.MaxValue)
          stale.map(_.getPath)
            .flatMap(p =>
              cellsGenNum(p.getName).filter(_ < activeGen).map((_, p)))
            .sortBy(-_._1).drop(keepStale).map(_._2).toSet
        }
      stale.foreach { s =>
        if (forced.contains(s.getPath) ||
            newestMtime(s.getPath, s.getModificationTime) < cutoff)
          fs.delete(s.getPath, true)
      }
    }
  }

  /** Rebuild advisor over a maintained (built + folded) IVF layout:
    * ONE row of integer drift metrics plus the rebuild decision under
    * the caller's thresholds. `skew_permille` = max-cell occupancy over
    * the mean (n/C) in permille — folds never move centroids, so a
    * drifting ingest stream piles into few cells and this ratio grows;
    * `new_mass_permille` = folded fraction of the index — past ~half
    * the corpus, the one-pass rebuild (re-seed, reassign, compact)
    * costs less than the recall it recovers. `corpusN` is the build-
    * time corpus count, INGEST-LEDGER METADATA ([[ensureCorpusStats]]
    * — a memoized sidecar read, never a scan). Plan: the zero-column
    * occupancy scan of [[ivfCellStats]] aggregated to one row, cross-
    * joined with the ≤C-row centroid count — shuffle is C count rows,
    * index-size independent, so an ingestion tier can run this after
    * every fold.
    */
  def ivfRebuildAdvice(
      spark: SparkSession,
      path: String,
      corpusN: Long,
      skewPermilleMax: Long = 2000L,
      newMassPermilleMax: Long = 500L): DataFrame =
    ivfCellStats(spark, path)
      .agg(sum(col("n_vecs")).as("n_vecs"),
        count(lit(1)).as("n_cells"),
        max(col("n_vecs")).as("max_cell"))
      .crossJoin(
        spark.read.parquet(s"$path/centroids").agg(count(lit(1)).as("c")))
      .withColumn("skew_permille",
        expr("(max_cell * c * 1000) div n_vecs"))
      .withColumn("new_mass_permille",
        expr(s"((n_vecs - ${corpusN}L) * 1000) div n_vecs"))
      .withColumn("rebuild",
        when(col("skew_permille") >= skewPermilleMax ||
          col("new_mass_permille") >= newMassPermilleMax, 1L).otherwise(0L))
      .select("n_vecs", "n_cells", "c", "max_cell",
        "skew_permille", "new_mass_permille", "rebuild")

  /** Full IVF rebuild FROM THE INDEX ITSELF — what [[ivfRebuildAdvice]]
    * recommends: re-derive C from the maintained row count, re-seed
    * centroids from the indexed quantized vectors (`vec_id < C`, the
    * [[buildIvfIndex]] seeding rule), reassign every row, and promote
    * the new layout at `dest` with the same temp-sibling atomic rename
    * as [[ensureIvfIndex]]. Reading the CELLS (not the source table)
    * matters at 100 TB: the index is self-contained, so maintenance
    * never re-ingests or re-quantizes the source — and because folds
    * preserve exactly (vec_id, q, nrm), rebuild-from-index ≡
    * build-from-source over the union corpus (SimilaritySpec pins
    * byte-equality of cells and centroids; q115's oracle re-derives
    * the probe from the raw table). Cost: one broadcast assignment
    * pass + the partitioned write — same as the original build, and it
    * compacts fold small-files for free. Idempotent per `dest`
    * (marker + lock), skipped when a promoted layout already exists.
    */
  def rebuildIvfIndex(
      spark: SparkSession, path: String, dest: String): String = {
    lockFor(dest).synchronized {
      WriterLease.withLease(spark, WriterLease.lockPathFor(dest)) {
      recoverCells(spark, path)
      val destP  = new org.apache.hadoop.fs.Path(dest)
      def marker = new org.apache.hadoop.fs.Path(
        activeCellsDir(spark, dest), "_SUCCESS")
      val fs     = destP.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(marker)) {
        // rebuild from the LIVE rows: tombstoned ids drop out here, so
        // rebuild-from-index ≡ build-from-remainder and the new layout
        // starts with an empty tombstone set
        val b = liveCells(spark, path)
          .select(col("vec_id"), col("q"), col("nrm"))
        val c = nCentroidsForCorpus(b.count())
        val seeds = b.filter(col("vec_id") < c)
          .select(col("vec_id").as("cent_id"),
            col("q").as("cvec"), col("nrm").as("cnrm"))
        val tmp =
          new org.apache.hadoop.fs.Path(s"$dest.tmp${System.nanoTime()}")
        seeds.write.mode("overwrite").parquet(s"$tmp/centroids")
        assignToCentroids(b, spark.read.parquet(s"$tmp/centroids"))
          .write.mode("overwrite").partitionBy("cent_id")
          .parquet(s"$tmp/cells")
        // same cross-process promote rule as ensureIvfIndex: losing a
        // race to an identical complete layout is benign
        if (fs.exists(marker)) fs.delete(tmp, true)
        else {
          fs.delete(destP, true)
          if (!fs.rename(tmp, destP)) {
            if (fs.exists(marker)) fs.delete(tmp, true)
            else throw new java.io.IOException(
              s"could not promote rebuilt IVF layout $tmp -> $destP")
          }
        }
      }
      }
    }
    dest
  }

  // ---- product quantization (PQ): m subspaces × ks-codeword books ----

  /** Quantized subvector rows (vec_id, sub, sq, snrm): each vector
    * split into `m` contiguous `subDim`-wide slices of its fixed-point
    * quantization — the PQ working form. Map-only (explode by a
    * literal m-array, slice, fused integer dot); no shuffle.
    */
  private def pqSubvectors(
      embeddings: DataFrame, m: Int, subDim: Int): DataFrame =
    embeddings
      .select(col("vec_id"),
        VectorFunctions.quantize(col("embedding")).as("q"))
      .select(col("vec_id"),
        explode(array((0 until m).map(lit(_)): _*)).as("sub"), col("q"))
      .withColumn("sq", slice(col("q"), col("sub") * subDim + 1, lit(subDim)))
      .withColumn("snrm", VectorFunctions.qdot(col("sq"), col("sq")))
      .select("vec_id", "sub", "sq", "snrm")

  /** Per-subspace codebooks (sub, code_id, cvec, cnrm): the first `ks`
    * corpus vectors' subvectors, the same deterministic seeding rule as
    * [[buildIvfIndex]] centroids. m·ks rows — a codebook is FIXED-SIZE
    * compression state (independent of corpus size, unlike IVF's
    * adaptive C), always broadcastable.
    */
  def pqCodebooks(
      embeddings: DataFrame,
      m: Int = 4, ks: Int = 256, subDim: Int = 16): DataFrame =
    pqSubvectors(embeddings.filter(col("vec_id") < ks), m, subDim)
      .select(col("sub"), col("vec_id").as("code_id"),
        col("sq").as("cvec"), col("snrm").as("cnrm"))

  /** Per-(vector, subspace) nearest codeword by EXACT integer squared
    * L2 — ‖a−b‖² = na + nb − 2·dot, all BIGINT, so code assignment is
    * hash-stable on every engine (ties → smaller code_id via the
    * struct-min). Plan: broadcast the m·ks codebook against the
    * map-only subvector rows, then ONE map-side-combinable groupBy of
    * n·m (vec_id, sub, code) triples — the corpus vectors themselves
    * never ride a shuffle.
    */
  def pqAssignments(
      embeddings: DataFrame, m: Int, ks: Int, subDim: Int): DataFrame =
    pqSubvectors(embeddings, m, subDim)
      .join(broadcast(pqCodebooks(embeddings, m, ks, subDim)), Seq("sub"))
      .withColumn("l2", col("snrm") + col("cnrm") -
        lit(2L) * VectorFunctions.qdot(col("sq"), col("cvec")))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("l2"), col("code_id")))
        .getField("code_id").as("code_id"))

  /** PQ encoding: one row per vector with its m codeword ids as wide
    * BIGINT columns (c0..c{m-1}) — at the defaults each 64-float
    * vector compresses to m·log2(ks) bits (4 bytes at the defaults), the
    * form a 100 TB corpus ships to
    * the serving tier. Shuffles: the assignment groupBy plus the wide
    * pivot-style agg, both over n·m three-int rows.
    */
  def pqEncode(
      embeddings: DataFrame,
      m: Int = 4, ks: Int = 256, subDim: Int = 16): DataFrame = {
    val wide = (0 until m).map { s0 =>
      max(when(col("sub") === s0, col("code_id"))).as(s"c$s0")
    }
    pqAssignments(embeddings, m, ks, subDim)
      .groupBy("vec_id").agg(wide.head, wide.tail: _*)
      .orderBy("vec_id")
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query keeps its
    * exact subvectors; each corpus vector is its reconstruction from
    * codewords, so the approximate distance is a SUM OF m TABLE
    * LOOKUPS. Plan: build the m·ks-entry lookup table (query × each
    * codeword's exact squared L2) and broadcast it — the scan then
    * touches only the CODES (n·m int triples, never the vectors), one
    * map-side-combinable sum per vec_id, TakeOrdered top-k. This is
    * the PQ serving contract at 100 TB: vectors stay in cold storage,
    * the hot path reads ~4-byte codes. All-integer arithmetic → ties
    * broken by vec_id identically on every engine.
    */
  def pqAdcTopK(
      embeddings: DataFrame, queryId: Long, k: Int,
      m: Int = 4, ks: Int = 256, subDim: Int = 16): DataFrame = {
    val qs = pqSubvectors(
        embeddings.filter(col("vec_id") === queryId), m, subDim)
      .select(col("sub"), col("sq").as("qv"), col("snrm").as("qn"))
    val lut = pqCodebooks(embeddings, m, ks, subDim)
      .join(broadcast(qs), Seq("sub"))
      .withColumn("pd", col("qn") + col("cnrm") -
        lit(2L) * VectorFunctions.qdot(col("qv"), col("cvec")))
      .select("sub", "code_id", "pd")
    pqAssignments(embeddings, m, ks, subDim)
      .filter(col("vec_id") =!= queryId)
      .join(broadcast(lut), Seq("sub", "code_id"))
      .groupBy("vec_id")
      .agg(sum(col("pd")).as("adist"))
      .orderBy(col("adist").asc, col("vec_id"))
      .limit(k)
  }

  // ---- IVF-PQ: partition-pruned cells storing PQ codes ----

  /** Build the composed IVF-PQ layout — THE standard serving design at
    * 100 TB: IVF gives partition pruning (a probe touches nProbe/C of
    * the corpus), PQ gives compression (a pruned cell row is vec_id +
    * m code ids, ~4 bytes of payload at the defaults — the raw vectors
    * never reach the serving tier). Cells hold (vec_id, codes)
    * partitioned by cent_id; the ≤C-row centroid table and the m·ks
    * codebooks land beside them. Build cost: the IVF assignment pass,
    * the PQ assignment pass, and one n-row join of the two id streams
    * — all corpus-linear, pay-once.
    */
  def buildIvfPqIndex(
      embeddings: DataFrame,
      path: String,
      nCentroids: Int,
      m: Int = 4, ks: Int = 256, subDim: Int = 16): Unit = {
    val b = embeddings
      .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("q"))
      .withColumn("nrm", VectorFunctions.qdot(col("q"), col("q")))
    val cents = b.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"),
        col("q").as("cvec"), col("nrm").as("cnrm"))
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    pqCodebooks(embeddings, m, ks, subDim)
      .write.mode("overwrite").parquet(s"$path/codebooks")
    val codes = pqAssignments(embeddings, m, ks, subDim)
      .groupBy("vec_id")
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code_id")))),
        x => x.getField("code_id")).as("codes"))
    assignToCentroids(b, readCentroids(embeddings, path))
      .select("vec_id", "cent_id")
      .join(codes, Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(s"$path/cells")
  }

  // read-back of the just-written centroid table so the assignment and
  // the probe rank against the SAME bytes (not a re-planned frame)
  private def readCentroids(embeddings: DataFrame, path: String): DataFrame =
    embeddings.sparkSession.read.parquet(s"$path/centroids")

  /** Idempotent IVF-PQ layout ([[ensureIvfIndex]]'s contract for the
    * composed index): C adaptive from the staged corpus count, keyed by
    * srcTag + data fingerprint + schema, atomic promote.
    */
  def ensureIvfPqIndex(
      embeddings: DataFrame, srcTag: String,
      m: Int = 4, ks: Int = 256, subDim: Int = 16): (String, Int) = {
    val spark = embeddings.sparkSession
    val fp    = inputFingerprint(embeddings)
    val n     = ensureCorpusStats(embeddings, srcTag, Some(fp))
    val c     = nCentroidsForCorpus(n)
    val key   = s"$srcTag|ivfpq|c=$c|m=$m|ks=$ks|sd=$subDim" +
      s"|fp=$fp|${embeddings.schema.catalogString}"
    val path = layoutPath(spark, "ivfpq", key)
    val memo = s"${spark.sparkContext.applicationId}|$key"
    if (ivfMemo.get(memo) != path) {
      lockFor(path).synchronized {
        val dest   = new org.apache.hadoop.fs.Path(path)
        // marker = _SUCCESS of the ACTIVE generation (a compacted
        // layout keeps its completeness witness across promotes)
        def marker = new org.apache.hadoop.fs.Path(
          activeCellsDir(spark, path), "_SUCCESS")
        val fs     = dest.getFileSystem(spark.sessionState.newHadoopConf())
        // complete layouts resolve LEASE-FREE (the ensureIvfIndex
        // serving-path contract): only an actual build writes
        val complete =
          try fs.exists(marker)
          catch { case _: IllegalArgumentException => false }
        if (!complete) WriterLease.withLease(
            spark, WriterLease.lockPathFor(path)) {
        recoverCells(spark, path)
        if (!fs.exists(marker)) {
          val tmp = new org.apache.hadoop.fs.Path(
            s"$path.tmp${System.nanoTime()}")
          buildIvfPqIndex(embeddings, tmp.toString, nCentroids = c,
            m = m, ks = ks, subDim = subDim)
          if (fs.exists(marker)) fs.delete(tmp, true)
          else {
            fs.delete(dest, true)
            if (!fs.rename(tmp, dest)) {
              if (fs.exists(marker)) fs.delete(tmp, true)
              else throw new java.io.IOException(
                s"could not promote IVF-PQ layout $tmp -> $dest")
            }
          }
        }
        }
      }
      ivfMemo.put(memo, path)
    }
    (path, c)
  }

  /** Probe an IVF-PQ layout: [[ivfProbe]]'s driver-side centroid
    * ranking prunes the cells scan to nProbe partitions, then ADC runs
    * as a MAP-ONLY expression — the m·ks lookup table is computed
    * driver-side from the tiny codebook file and inlined as literal
    * arrays, so each scanned row costs m array-index adds, no join, no
    * shuffle beyond the top-k partials. The scan reads (vec_id, codes)
    * only: at 100 TB the serving tier holds ~4 bytes per vector and
    * the exact vectors stay in cold storage (re-rank there if recall
    * demands it). All-BIGINT distances; ties broken by vec_id — the
    * q117 portability contract.
    */
  def ivfPqProbe(
      spark: SparkSession,
      path: String,
      queryVec: Seq[Float],
      k: Int,
      nProbe: Int = 4,
      exclude: Option[Long] = None,
      m: Int = 4, subDim: Int = 16): DataFrame = {
    // same half-away-from-zero quantization as ivfProbe
    val qq = queryVec.map { f =>
      val d = f.toDouble * 1000
      if (d >= 0) math.round(d) else -math.round(-d)
    }
    val qn = qq.map(x => x * x).sum
    val cents = spark.read.parquet(s"$path/centroids")
      .select("cent_id", "cvec", "cnrm").collect()
    val probeIds = cents.map { r =>
      val cv  = r.getAs[collection.Seq[Long]]("cvec")
      val dot = cv.iterator.zip(qq.iterator).map { case (a, b) => a * b }.sum
      val cos = dot.toDouble / math.sqrt(r.getAs[Long]("cnrm").toDouble * qn.toDouble)
      (cos, r.getAs[Long]("cent_id"))
    }.sortBy { case (cos, id) => (-cos, -id) }.take(nProbe).map(_._2)
    // the ADC lookup table: exact integer ‖q_sub − codeword‖² per
    // (sub, code), from the m·ks-row codebook file — driver metadata
    val lut = Array.fill(m)(collection.mutable.Map.empty[Long, Long])
    spark.read.parquet(s"$path/codebooks").collect().foreach { r =>
      val s0   = r.getAs[Number]("sub").intValue()
      val cv   = r.getAs[collection.Seq[Long]]("cvec")
      val cnrm = r.getAs[Long]("cnrm")
      val qs   = qq.slice(s0 * subDim, s0 * subDim + subDim)
      val dot  = qs.iterator.zip(cv.iterator).map { case (a, b) => a * b }.sum
      val qsn  = qs.map(x => x * x).sum
      lut(s0)(r.getAs[Long]("code_id")) = qsn + cnrm - 2 * dot
    }
    val lutCols = (0 until m).map { s0 =>
      val arr = (0L until lut(s0).keys.max + 1)
        .map(cid => lut(s0).getOrElse(cid, Long.MaxValue / (2 * m)))
      element_at(typedlit(arr), col("codes").getItem(s0).cast("int") + 1)
    }
    val cells = liveCells(spark, path)
      .filter(col("cent_id").isin(probeIds.toIndexedSeq: _*))
    exclude.fold(cells)(id => cells.filter(col("vec_id") =!= id))
      .withColumn("adist", lutCols.reduce(_ + _))
      .orderBy(col("adist").asc, col("vec_id"))
      .select("vec_id", "adist")
      .limit(k)
  }

  /** Incremental ingestion into a standing [[ensureIvfPqIndex]] layout
    * — [[foldIntoIvfIndex]]'s contract for the COMPOSED index: the new
    * batch is PQ-encoded against the STANDING codebooks (broadcast m·ks
    * rows, never re-trained — the PQ analog of never moving centroids)
    * and assigned to the standing IVF centroids, then appended as new
    * cell files of (vec_id, codes). O(|batch|) rows written, corpus
    * cells untouched, idempotent per batchTag via the same fold-ledger
    * markers — so the serving tier ingests vectors at code size
    * (~4 bytes each at the defaults) with zero index rewrites, and
    * drift is governed by the same advisor/rebuild pair as plain IVF.
    */
  def foldIntoIvfPqIndex(
      newVecs: DataFrame,
      path: String,
      batchTag: String,
      m: Int = 4, ks: Int = 256, subDim: Int = 16): Unit = {
    val spark   = newVecs.sparkSession
    val memoKey =
      s"${spark.sparkContext.applicationId}|$path|pqfold|$batchTag"
    if (ivfFoldMemo.contains(memoKey)) return
    lockFor(path).synchronized {
      if (ivfFoldMemo.contains(memoKey)) return
      WriterLease.withLease(spark, WriterLease.lockPathFor(path)) {
      recoverCells(spark, path)
      val tagHash = java.security.MessageDigest.getInstance("MD5")
        .digest(batchTag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      val marker = new org.apache.hadoop.fs.Path(path, s"folds/$tagHash")
      val fs     = marker.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(marker)) {
        requireNotTombstoned(spark, path, newVecs.select("vec_id"))
        val cents = spark.read.parquet(s"$path/centroids")
          .select("cent_id", "cvec", "cnrm")
        val cb = spark.read.parquet(s"$path/codebooks")
        val b = newVecs
          .select(col("vec_id"),
            VectorFunctions.quantize(col("embedding")).as("q"))
          .withColumn("nrm", VectorFunctions.qdot(col("q"), col("q")))
        // encode against the STANDING codebooks (not pqAssignments,
        // which would re-derive books from the batch)
        val codes = pqSubvectors(newVecs, m, subDim)
          .join(broadcast(cb), Seq("sub"))
          .withColumn("l2", col("snrm") + col("cnrm") -
            lit(2L) * VectorFunctions.qdot(col("sq"), col("cvec")))
          .groupBy("vec_id", "sub")
          .agg(min(struct(col("l2"), col("code_id")))
            .getField("code_id").as("code_id"))
          .groupBy("vec_id")
          .agg(transform(
            array_sort(collect_list(struct(col("sub"), col("code_id")))),
            x => x.getField("code_id")).as("codes"))
        assignToCentroids(b, cents)
          .select("vec_id", "cent_id")
          .join(codes, Seq("vec_id"))
          .write.mode("append").partitionBy("cent_id")
          .parquet(activeCellsDir(spark, path))
        fs.mkdirs(marker.getParent)
        val out = fs.create(marker, true)
        try out.write(batchTag.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        // policy check under the already-held layout lock (reentrant)
        maybeAutoCompactCells(spark, path)
      }
      }
      ivfFoldMemo.add(memoKey)
      ()
    }
  }

  /** Batched probe of an [[ensureIvfPqIndex]] layout — [[
    * ivfProbeBatchDf]]'s serving-throughput shape for the COMPRESSED
    * index: N queries answered by ONE partition-pruned scan of code
    * rows. Centroid ranking is the same distributed |batch|·C pass +
    * per-query window; the ADC lookup table becomes a BROADCAST FRAME
    * (query_id, sub, code_id, pd) of |batch|·m·ks exact integer
    * distances (the distributed analog of the single-probe literal
    * arrays — m·ks ≈ 10³ rows/query at the defaults, so ~10⁴-query
    * batches stay broadcastable; shard beyond that). Scanned code rows fan out
    * only to the queries probing their cell, explode to m (sub, code)
    * pairs, join the LUT map-side, and partial-agg back to one adist
    * per (query, vec) before the per-query top-k window — every
    * exchange bounded by batch·nProbe·cellsize·m SMALL rows, never the
    * corpus, and the scan still reads ~4-byte payloads.
    * Output: (query_id, rk, vec_id, adist), all BIGINT.
    */
  def ivfPqProbeBatchDfOwned(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      excludeSelf: Boolean = true,
      m: Int = 4, subDim: Int = 16): (DataFrame, graft.util.Checkpoints.Staged) = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .select("cent_id", "cvec", "cnrm")
    val qdf = queries
      .select(col("query_id"),
        VectorFunctions.quantize(col("emb")).as("qvec"))
      .withColumn("qn", VectorFunctions.qdot(col("qvec"), col("qvec")))
    val pw = Window.partitionBy("query_id")
      .orderBy(col("pcos").desc, col("cent_id").desc)
    // shed qvec/qn BEFORE the window's partitionBy(query_id) exchange
    // (the ivfProbeBatchDfOwned rationale) — the PQ probe map never
    // needs them back, so no re-join either
    val staged = graft.util.Checkpoints.stageOwned(
      qdf.crossJoin(broadcast(cents))
        .withColumn("pcos",
          VectorFunctions.qdot(col("cvec"), col("qvec")).cast("double") /
            sqrt(col("cnrm").cast("double") * col("qn").cast("double")))
        .select(col("query_id"), col("cent_id"), col("pcos"))
        .withColumn("pr", row_number().over(pw))
        .filter(col("pr") <= nProbe)
        .select(col("query_id"), col("cent_id")))
    val probeMap = staged.df
    val probedCells: Seq[Long] =
      probeMap.select("cent_id").distinct().as[Long].collect().toIndexedSeq
    // the batch LUT: per-query subvectors × the standing codebooks
    val lut = qdf
      .select(col("query_id"),
        explode(array((0 until m).map(lit(_)): _*)).as("sub"), col("qvec"))
      .withColumn("qsv", slice(col("qvec"), col("sub") * subDim + 1, lit(subDim)))
      .withColumn("qsn", VectorFunctions.qdot(col("qsv"), col("qsv")))
      .join(broadcast(spark.read.parquet(s"$path/codebooks")), Seq("sub"))
      .withColumn("pd", col("qsn") + col("cnrm") -
        lit(2L) * VectorFunctions.qdot(col("qsv"), col("cvec")))
      .select("query_id", "sub", "code_id", "pd")
    val cells = liveCells(spark, path)
      .filter(col("cent_id").isin(probedCells: _*))
      .join(broadcast(probeMap), Seq("cent_id"))
    val cand =
      if (excludeSelf) cells.filter(col("vec_id") =!= col("query_id"))
      else cells
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("vec_id"))
    val out = cand
      .select(col("query_id"), col("vec_id"),
        posexplode(col("codes")).as(Seq("sub", "code_id")))
      .join(broadcast(lut), Seq("query_id", "sub", "code_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("pd")).as("adist"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("adist"))
    (out, staged)
  }

  /** [[ivfPqProbeBatchDfOwned]] over an in-memory query batch, staged
    * block released implicitly with the session (convenience form —
    * long-lived serving drivers should use the Owned variant).
    */
  def ivfPqProbeBatch(
      spark: SparkSession,
      path: String,
      queries: Seq[(Long, Seq[Float])],
      k: Int,
      nProbe: Int = 4,
      excludeSelf: Boolean = true,
      m: Int = 4, subDim: Int = 16): DataFrame = {
    import spark.implicits._
    ivfPqProbeBatchDfOwned(spark, path,
      queries.toDF("query_id", "emb"), k, nProbe, excludeSelf, m, subDim)._1
  }

  /** [[ivfPqProbe]] + EXACT RE-RANK — the full production recipe: the
    * compressed index nominates `kAdc` candidates by ADC (cheap, code-
    * only scan), then the exact vectors for just those ids are fetched
    * from the SOURCE table and re-ranked by the portable quantized
    * cosine. Raw ADC is a coarse sieve on isotropic vectors (IvfPqBench
    * measures recall@10 alone ~0.2); the re-rank recovers exactness for
    * whatever the sieve caught, which rises quickly with kAdc — at the
    * defaults (ks=256 books, kAdc=1000) the measured sf10 ladder
    * reaches 0.985 recall@10, exactly the plain-IVF nProbe=4 pruning
    * ceiling, at 4.3× compression and the same probe latency
    * (BENCH_ivfpq.json); dial ks/kAdc down to trade recall for
    * compression/candidate-lookup cost. Scale shape: the candidate ids are a ≤kAdc
    * driver list (same sanctioned-collect class as the centroid
    * ranking) pushed into the source scan as an `IN` filter — parquet
    * row-group pruning serves a point lookup, or the q75 bucketed
    * layout / a row store at 100 TB; the exact vectors touched are
    * kAdc rows, never the corpus.
    */
  def ivfPqProbeRerank(
      spark: SparkSession,
      path: String,
      embeddings: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      kAdc: Int = 1000,
      nProbe: Int = 4,
      exclude: Option[Long] = None,
      m: Int = 4, subDim: Int = 16): DataFrame = {
    val candIds =
      ivfPqProbe(spark, path, queryVec, kAdc, nProbe, exclude, m, subDim)
      .select("vec_id").collect().map(_.getLong(0)).toIndexedSeq
    val qq = queryVec.map { f =>
      val d = f.toDouble * 1000
      if (d >= 0) math.round(d) else -math.round(-d)
    }
    val qn   = qq.map(x => x * x).sum
    val qCol = array(qq.map(lit): _*)
    embeddings
      .filter(col("vec_id").isin(candIds: _*))
      .select(col("vec_id"),
        VectorFunctions.quantize(col("embedding")).as("q"))
      .withColumn("nrm", VectorFunctions.qdot(col("q"), col("q")))
      .withColumn("dot", VectorFunctions.qdot(col("q"), qCol))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("nrm").cast("double") * lit(qn.toDouble)))
      .orderBy(col("cos").desc, col("vec_id"))
      .select("vec_id", "dot")
      .limit(k)
  }

  /** Oracle-checkable cosine near-dup pairs: LSH bucket collisions over
    * quantized vectors; the threshold `cos ≥ m/1000` is decided by the
    * exact integer cross-multiplication  dot>0 ∧ den·dot² ≥ num·na·nb
    * with num/den = (m/1000)² reduced — no floating point anywhere.
    *
    * Scale knobs: pass `nBits = nBitsForOccupancy(count)` so bucket
    * occupancy (and with it the quadratic-per-bucket candidate join)
    * stays constant as the corpus grows, and `maxBucketSize` as the
    * skew guard for CLUSTERED corpora — a bucket over the cap (a
    * near-identical pile: boilerplate embeddings) is dropped whole,
    * the same hot-key semantics as the MinHash/winnow caps
    * (SkewStressSpec). Uniform corpora need the bits knob, clustered
    * ones the cap; a 100 TB run wants both.
    */
  def cosineNearDupPairsPortable(
      embeddings: DataFrame,
      minCosineMilli: Int = 400,
      nBits: Int = 6,
      seed: Long = 42L,
      dim: Int = 64,
      maxAbsValue: Double = 1.0,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val (num, den) = cosThresholdFraction(minCosineMilli)
    // overflow guard for the exact integer comparison below: with
    // |v_i| ≤ maxAbsValue the quantized components are ≤ 1000·maxAbsValue,
    // so |dot| ≤ dim·(1000·maxAbsValue)² =: D and the largest product is
    // max(den·dot², num·nrm_l·nrm_r) ≤ max(num,den)·D². Spark WRAPS on
    // signed-64 overflow (silently wrong pairs) while the oracle engine
    // raises — so reject thresholds whose reduced fraction is too fine
    // (e.g. 401 → den=1_000_000) instead of diverging. Thresholds that are
    // multiples of 100 (or any m whose (m/1000)² reduces to a small
    // fraction) always pass.
    val maxDot = (dim.toLong * math.pow(1000.0 * maxAbsValue, 2)).toLong max 1L
    val headroom = Long.MaxValue / maxDot / maxDot
    require(num <= headroom && den <= headroom,
      s"minCosineMilli=$minCosineMilli reduces to $num/$den; with dim=$dim and " +
        s"|value|<=$maxAbsValue the products den*dot^2 / num*nrm_l*nrm_r can exceed " +
        s"2^63 (need num,den <= $headroom). Pick a coarser threshold " +
        "(e.g. a multiple of 100) or reduce dim/maxAbsValue.")
    val planes = VectorFunctions.quantPlanes(seed, dim, nBits)
    // spread before the quantize/bucket/norm kernels — the hyperplane
    // buckets are nBits higher-order-function dot products per row and
    // must not run on the scan's (possibly single) partition; the
    // explicit count is AQE-proof (see Dedup.spread). Measured 2.2 s →
    // 0.9 s at sf0.1.
    val b0 = Dedup.spread(embeddings, "vec_id")
      .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("q"))
      .select(col("vec_id"), col("q"),
        VectorFunctions.hyperplaneBucketQ(col("q"), planes).as("bucket"),
        VectorFunctions.qdot(col("q"), col("q")).as("nrm"))
    val b = maxBucketSize.fold(b0) { cap =>
      b0.withColumn("_bn",
          count(lit(1)).over(Window.partitionBy("bucket")))
        .filter(col("_bn") <= cap)
        .drop("_bn")
    }
    val l = b.as("l")
    val r = b.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .withColumn("dot", VectorFunctions.qdot(col("l.q"), col("r.q")))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(den) >= lit(num) * col("l.nrm") * col("r.nrm"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"), col("dot"))
  }

  /** Multi-table (banded) hyperplane-LSH cosine near-dup pairs — the
    * RECALL answer at scale. A single K-bit table's collision
    * probability for a true near-dup pair is p^K (p = 1 − θ/π per
    * hyperplane), so the occupancy-correct K for a large corpus
    * ([[nBitsForOccupancy]]) drives single-table recall toward zero;
    * OR-ing L independent tables lifts it to 1 − (1 − p^K)^L — the
    * exact analog of MinHash banding (bands = L, rows = K), with the
    * same candidate-set economics: work scales with L·occupancy per
    * vector, recall compounds exponentially in L.
    *
    * Same payload-diet shape as [[graft.operators.Dedup.minhashNearDupPairs]]:
    * the quantized vectors are staged once
    * ([[graft.util.Checkpoints.stage]] — three consumers, kernel runs
    * once), only (vec_id, table, bucket) rides the banding shuffle and
    * the candidate self-join, the per-(table,bucket) cap bounds
    * clustered skew, and surviving distinct pairs re-join the staged
    * vectors for the exact integer threshold verify (identical
    * arithmetic to [[cosineNearDupPairsPortable]], so the two variants'
    * outputs are set-comparable: banded ⊇ single-table on the same K).
    *
    * All L·K planes are drawn from ONE seeded stream and sliced per
    * table — prefix-stable (table t's planes do not depend on L) and
    * independent, with no cross-seed correlation concerns.
    */
  def cosineNearDupPairsBanded(
      embeddings: DataFrame,
      minCosineMilli: Int = 400,
      nTables: Int = 4,
      nBits: Int = 6,
      maxBucketSize: Int = 1000,
      seed: Long = 42L,
      dim: Int = 64,
      maxAbsValue: Double = 1.0,
      checkpointDir: Option[String] = None): DataFrame = {
    val (num, den) = cosThresholdFraction(minCosineMilli)
    val maxDot = (dim.toLong * math.pow(1000.0 * maxAbsValue, 2)).toLong max 1L
    val headroom = Long.MaxValue / maxDot / maxDot
    require(num <= headroom && den <= headroom,
      s"minCosineMilli=$minCosineMilli reduces to $num/$den; products can exceed 2^63 " +
        s"with dim=$dim and |value|<=$maxAbsValue (need num,den <= $headroom)")
    val allPlanes = VectorFunctions.quantPlanes(seed, dim, nTables * nBits)
    val q = graft.util.Checkpoints.stage(
      Dedup.spread(embeddings, "vec_id")
        .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("q"))
        .withColumn("nrm", VectorFunctions.qdot(col("q"), col("q"))),
      checkpointDir.orElse(graft.util.Checkpoints.configured(embeddings.sparkSession)))
    val bucketCols = (0 until nTables).map { t =>
      VectorFunctions.hyperplaneBucketQ(col("q"),
        allPlanes.slice(t * nBits, (t + 1) * nBits))
    }
    val banded0 = q
      .select(col("vec_id"), posexplode(array(bucketCols: _*)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bucket")
    val banded = banded0
      .withColumn("_bn", count(lit(1)).over(Window.partitionBy("tbl", "bucket")))
      .filter(col("_bn") <= maxBucketSize)
      .drop("_bn")
    val l = banded.as("l")
    val r = banded.as("r")
    val pairs = l.join(r,
        col("l.tbl") === col("r.tbl") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"))
      .distinct()
    pairs
      .join(q.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("nrm").as("na")), "vec_a")
      .join(q.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("nrm").as("nb")), "vec_b")
      .withColumn("dot", VectorFunctions.qdot(col("qa"), col("qb")))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(den) >= lit(num) * col("na") * col("nb"))
      .select(col("vec_a"), col("vec_b"), col("dot"))
  }

  /** (m/1000)² as a reduced fraction num/den — shared with the oracle SQL
    * so both engines compare identical (overflow-safe) products.
    */
  def cosThresholdFraction(minCosineMilli: Int): (Long, Long) = {
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val num0 = minCosineMilli.toLong * minCosineMilli
    val den0 = 1000000L
    val g    = gcd(num0, den0)
    (num0 / g, den0 / g)
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * restricted to LSH bucket collisions (the scale path — never n²).
    */
  def cosineNearDupPairs(
      embeddings: DataFrame,
      minCosine: Double,
      nBits: Int = 6,
      seed: Long = 42L,
      dim: Int = 64): DataFrame = {
    val planes = VectorFunctions.seededPlanes(seed, dim, nBits)
    val bucketed = embeddings.select(
      col("vec_id"), col("embedding"),
      VectorFunctions.hyperplaneBucket(col("embedding"), planes).as("bucket"))
    val l = bucketed.as("l")
    val r = bucketed.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", VectorFunctions.cosineFused(col("l.embedding"), col("r.embedding")))
      .filter(col("cos") >= minCosine)
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"), col("cos"))
  }

  /** Per-vector symmetric int8 scalar quantization: `q_i =
    * ⌊x_i·127/maxabs + ½⌋` — the standard 4× (fp32) memory reduction
    * for ANN serving, where a 100 TB embedding store becomes 25 TB and
    * integer dot products replace float ones in the scan kernel.
    *
    * Cosine is per-vector scale-invariant, so quantized cosine tracks
    * the original ranking (SimilaritySpec measures recall on the
    * fixture). The arithmetic is deterministic across engines: floats
    * widen to double exactly, then one multiply, one divide, one
    * `floor(·+0.5)` — IEEE-identical everywhere, which makes quantized
    * vectors themselves oracle-checkable (q67), not just their recall.
    *
    * `maxabs` is staged as its own column and referenced twice so
    * CollapseProject cannot inline the O(d) array reduction into the
    * per-element lambda (the O(d²)/row trap). A zero vector quantizes
    * to zeros.
    */
  def quantizeInt8(embeddings: DataFrame, embCol: String = "embedding"): DataFrame =
    embeddings
      .withColumn("_maxabs",
        array_max(transform(col(embCol), x => abs(x.cast("double")))))
      .withColumn("qvec",
        when(col("_maxabs") === 0d,
          transform(col(embCol), _ => lit(0L)))
        .otherwise(transform(col(embCol),
          x => floor(x.cast("double") * lit(127d) / col("_maxabs") + lit(0.5d)))))
      .drop("_maxabs")

  /** Exact top-k over the int8-quantized store ([[quantizeInt8]]):
    * integer dot products in the scan kernel (dot ≤ 127²·dim — no
    * overflow anywhere near dim 10⁶), ranked by the IEEE-identical
    * `CAST(dot)/√(CAST(nrm)·CAST(qn))` double — the q51 ordering
    * pattern, so the int8 serving path is oracle-checkable end-to-end
    * (q68). Per-vector scales cancel in cosine, which is why symmetric
    * per-vector quantization preserves ranking. Zero vectors (nrm = 0)
    * have no cosine and are excluded on both engines.
    */
  def bruteForceTopKInt8(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    // zero-vector exclusion happens on the RAW embedding (maxabs > 0 ⟺
    // the quantized norm is > 0: the max-|x| element always quantizes
    // to ±127). Filtering on the computed nrm column instead lets
    // PushDownPredicate substitute the whole quantize chain into the
    // filter condition — measured as the quantize kernel evaluating 3×
    // per row at sf1.0 (plan showed maxabs recomputed 4× inside the
    // pushed filter).
    def nonZero(df: DataFrame): DataFrame =
      df.filter(array_max(transform(col("embedding"), x => abs(x.cast("double")))) > 0)
    val qrow = quantizeInt8(embeddings.filter(col("vec_id") === queryId))
      .select(col("qvec").as("qv"))
      .withColumn("qn", VectorFunctions.qdot(col("qv"), col("qv")))
    quantizeInt8(nonZero(embeddings.filter(col("vec_id") =!= queryId)))
      .select(col("vec_id"), col("qvec").as("q"))
      .withColumn("nrm", VectorFunctions.qdot(col("q"), col("q")))
      .crossJoin(broadcast(qrow))
      .withColumn("dot", VectorFunctions.qdot(col("q"), col("qv")))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("nrm").cast("double") * col("qn").cast("double")))
      .orderBy(col("cos").desc, col("vec_id"))
      .select("vec_id", "dot")
      .limit(k)
  }
}
