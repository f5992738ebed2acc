package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PortableHash

class HllDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def est(df: org.apache.spark.sql.DataFrame, p: Int = 6): Long =
    df.withColumn("h", PortableHash.md5Hex60($"v".cast("string")))
      .agg(HllDistinct.hllDistinct($"h", p).as("e"))
      .as[Long].head()

  test("estimate lands within the expected HLL error band") {
    val n = 5000L
    val e = est(spark.range(n).toDF("v"))
    // m=64 → stderr ≈ 1.04/8 = 13%; 3σ band
    assert(math.abs(e - n).toDouble / n < 0.40, s"estimate $e for $n distinct")
  }

  test("duplicates do not move the estimate") {
    val uniq = spark.range(2000).toDF("v")
    val dup  = uniq.union(uniq).union(uniq)
    assert(est(uniq) == est(dup))
  }

  test("estimate is partitioning-invariant (merge = register max)") {
    val df = spark.range(3000).toDF("v")
    val single = est(df.repartition(1))
    for (parts <- Seq(4, 13, 32))
      assert(est(df.repartition(parts)) == single)
  }

  test("higher precision tightens the estimate") {
    val n  = 10000L
    val df = spark.range(n).toDF("v")
    val coarse = est(df, p = 4)
    val fine   = est(df, p = 10)
    assert(math.abs(fine - n) <= math.abs(coarse - n) ||
      math.abs(fine - n).toDouble / n < 0.05)
  }
}
