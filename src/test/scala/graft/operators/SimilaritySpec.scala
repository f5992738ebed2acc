package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite
    (4L, Array(0.7f, 0.7f, 0.0f))   // 45°
  ).toDF("vec_id", "embedding")

  test("cosine matches hand-computed values") {
    val cos = vecs.filter($"vec_id" === 4L)
      .select(VectorFunctions.cosine($"embedding",
        typedlit(Seq(1.0, 0.0, 0.0))).as("c"))
      .as[Double].head()
    assert(math.abs(cos - math.sqrt(0.5)) < 1e-6)
  }

  test("bruteForceTopK ranks by cosine desc, excludes the query") {
    val top = Similarity.bruteForceTopK(vecs, queryId = 0L, k = 3)
      .select("vec_id").as[Long].collect()
    assert(top.head == 1L)
    assert(top.toSeq == Seq(1L, 4L, 2L))
  }

  test("bruteForceTopKBatch ranks per query") {
    val out = Similarity.bruteForceTopKBatch(vecs, vecs.filter($"vec_id" <= 1), k = 2)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
    assert(out.filter(_._1 == 0L).sortBy(_._3).map(_._2).toSeq == Seq(1L, 4L))
    assert(out.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq == Seq(0L, 4L))
  }

  test("lshTopK on the real embeddings fixture overlaps brute force") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, 0L, 10).select("vec_id").as[Long].collect().toSet
    val approx = Similarity.lshTopK(emb, 0L, 10).select("vec_id").as[Long].collect().toSet
    assert(approx.size == 10)
    // Unclustered random embeddings are LSH's worst case; with 4 bits +
    // multiprobe (~31% of corpus scanned) expect partial overlap only.
    assert((exact intersect approx).size >= 2, s"ANN recall too low: $exact vs $approx")
  }

  test("cosineNearDupPairs finds bucket-colliding high-cosine pairs") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val pairs = Similarity.cosineNearDupPairs(emb, minCosine = 0.95)
    val bad = pairs.filter($"cos" < 0.95).count()
    assert(bad == 0)
  }
}
