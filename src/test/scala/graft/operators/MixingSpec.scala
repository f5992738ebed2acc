package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixingSpec extends SparkSpec {
  import spark.implicits._

  test("isqrt is exact across perfect squares and their neighbours") {
    // k² − 1, k², k² + 1 around squares big enough that a 1-ulp sqrt
    // error would flip the floor without the correction; ks past
    // √(2^53) ≈ 9.49e7 exercise the range where the long→double CAST
    // is itself lossy (the upward-correction territory — n_s·n_min
    // products at 100 TB scale live here), up to ⌊√Long.MAX⌋ where
    // the (t+1)² probe must not wrap
    val ks = Seq(0L, 1L, 2L, 3L, 999L, 1000L, 1000000L,
      94906265L, 94906267L, 100000001L, 1000000007L, 2000000011L,
      3000000019L, 3037000499L)
    val xs = ks.flatMap(k => Seq(k * k - 1, k * k, k * k + 1)).filter(_ >= 0).distinct
    val got = xs.toDF("x").select(col("x"), Mixing.isqrt(col("x")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val r = BigInt(got(x))
      // BigInt: (r+1)² overflows a long at the top of the domain
      assert(r * r <= x && (r + 1) * (r + 1) > x, s"isqrt($x) = $r is not ⌊√x⌋")
    }
  }

  test("T=2 rates: hand-computed thresholds, smallest source kept in full") {
    // sources A×100, B×25, C×4 → n_min = 4
    //   A: isqrt(100·4)=20 → (1000·20) div 100 = 200‰
    //   B: isqrt(25·4)=10  → (1000·10) div 25  = 400‰
    //   C: isqrt(4·4)=4    → (1000·4)  div 4   = 1000‰ (kept in full)
    val docs = ((0 until 100).map(i => (i.toLong, "A")) ++
      (100 until 125).map(i => (i.toLong, "B")) ++
      (125 until 129).map(i => (i.toLong, "C"))).toDF("doc_id", "src")

    val rates = Mixing.mixRatesT2(docs, "src")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rates == Map("A" -> (100L, 200L), "B" -> (25L, 400L), "C" -> (4L, 1000L)))

    val mixed = Mixing.temperatureMixT2(docs, "src", "doc_id")
    val kept = mixed.groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse("C", 0L) == 4L, s"smallest source must survive whole: $kept")

    // acceptance is exactly the (salt, id) bucket threshold — recompute
    // row-by-row against the published permilleBucket contract
    val expected = docs
      .filter(Mixing.permilleBucket(col("doc_id"), "mix") <
        when(col("src") === "A", 200L).when(col("src") === "B", 400L).otherwise(1000L))
      .select("doc_id").as[Long].collect().sorted
    val gotIds = mixed.select("doc_id").as[Long].collect().sorted
    assert(gotIds.toSeq == expected.toSeq)
  }

  test("single source and equal sources are kept whole (rate 1000)") {
    val one = (0 until 30).map(i => (i.toLong, "only")).toDF("doc_id", "src")
    assert(Mixing.temperatureMixT2(one, "src", "doc_id").count() == 30)
    val eq = ((0 until 40).map(i => (i.toLong, "A")) ++
      (40 until 80).map(i => (i.toLong, "B"))).toDF("doc_id", "src")
    val rates = Mixing.mixRatesT2(eq, "src")
      .select("rate_pm").as[Long].collect().toSeq
    assert(rates == Seq(1000L, 1000L), s"equal sources must not be thinned: $rates")
  }

  test("mix is deterministic and stable under corpus growth for fixed rates") {
    val docs = (0 until 50).map(i => (i.toLong, "A")).toDF("doc_id", "src")
    val r1 = Mixing.temperatureMixT2(docs, "src", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val r2 = Mixing.temperatureMixT2(docs, "src", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(r1 == r2)
  }
}
