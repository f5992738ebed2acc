package graft.operators

import graft.SparkSpec

class HybridSpec extends SparkSpec {
  import spark.implicits._

  // two top-k legs with incomparable score scales: integer tf·idf vs
  // a cosine-like double
  private def legA = Seq((1L, 100L), (2L, 90L), (3L, 80L)).toDF("doc_id", "_ord")
  private def legB = Seq((2L, 0.9), (3L, 0.8), (4L, 0.7)).toDF("doc_id", "_ord")

  test("rrfFuse: pinned exact-integer fusion, agreement set first") {
    val got = Hybrid.rrfFuse(Seq(legA, legB), "doc_id", "_ord", topK = 4)
      .as[(Long, Long, Long)].collect().toSeq
    // 1000000 div (60 + r): r=1 → 16393, r=2 → 16129, r=3 → 15873
    assert(got == Seq(
      (2L, 16129L + 16393L, 2L), // rank 2 in A, rank 1 in B
      (3L, 15873L + 16129L, 2L),
      (1L, 16393L, 1L),
      (4L, 15873L, 1L)))
  }

  test("rrfFuse is calibration-free: per-leg monotone rescaling is a no-op") {
    import org.apache.spark.sql.functions._
    val base = Hybrid.rrfFuse(Seq(legA, legB), "doc_id", "_ord", topK = 4)
      .as[(Long, Long, Long)].collect().toSeq
    val rescaled = Hybrid.rrfFuse(
        Seq(legA.withColumn("_ord", col("_ord") * 1000L),
          legB.withColumn("_ord", col("_ord") / 17.0)),
        "doc_id", "_ord", topK = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rescaled == base)
  }

  test("rrfFuse: single leg degenerates to the leg's own ranking") {
    val got = Hybrid.rrfFuse(Seq(legA), "doc_id", "_ord", topK = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got.forall(_._3 == 1L))
  }
}
