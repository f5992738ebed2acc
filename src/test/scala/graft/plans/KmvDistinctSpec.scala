package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.KmvBuffer.kmvDistinct

class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k; within ~10% above k") {
    val small = spark.range(100).select(kmvDistinct(col("id"), 256).as("e"))
    assert(small.as[Long].head() == 100L)

    val big = spark.range(50000)
      .select(kmvDistinct(col("id"), 256).as("e")).as[Long].head()
    assert(math.abs(big - 50000L) < 5000L, s"estimate $big too far from 50000")
  }

  test("duplicates don't inflate the estimate") {
    val dup = spark.range(100000).select((col("id") % 500).as("v"))
      .select(kmvDistinct(col("v"), 1024).as("e")).as[Long].head()
    assert(dup == 500L) // 500 distinct < k=1024 → exact
  }

  test("partitioning-invariant: same estimate under any shuffle") {
    val base = spark.range(30000).select((col("id") * 7919 % 23000).as("v"))
    val one  = base.coalesce(1).select(kmvDistinct(col("v"), 128).as("e")).as[Long].head()
    val many = base.repartition(16).select(kmvDistinct(col("v"), 128).as("e")).as[Long].head()
    assert(one == many) // merge = set-union of minima → deterministic
  }

  test("pre-hashed 60-bit mode: exact below k, accurate and shuffle-invariant above") {
    import graft.functions.PortableHash
    import graft.plans.KmvBuffer.kmvDistinctPreHashed
    val h = PortableHash.md5Hex60(col("v").cast("string"))
    val small = spark.range(200).select((col("id") % 100).as("v"))
      .select(kmvDistinctPreHashed(h, 512, bits = 60).as("e")).as[Long].head()
    assert(small == 100L)
    val base = spark.range(40000).select(col("id").as("v"))
    val one = base.coalesce(1)
      .select(kmvDistinctPreHashed(h, 512, bits = 60).as("e")).as[Long].head()
    val many = base.repartition(16)
      .select(kmvDistinctPreHashed(h, 512, bits = 60).as("e")).as[Long].head()
    assert(one == many)
    assert(math.abs(one - 40000L) < 4000L, s"estimate $one too far from 40000")
    // floor((k-1)/R) with R = kth/2^60 — the formula the DuckDB oracle mirrors
    val buf = new KmvBuffer(4)
    Seq(1L << 55, 1L << 56, 1L << 57, 1L << 58, 1L << 59).foreach(buf.add)
    val r = (1L << 58).toDouble / math.pow(2.0, 60)
    assert(buf.estimateInDomain(60) == math.floor(3.0 / r).toLong)
  }

  test("works grouped and on strings") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val out = li.groupBy("l_returnflag")
      .agg(kmvDistinct(col("l_partkey"), 512).as("kmv"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    for (r <- out) {
      val kmv = r.getAs[Long]("kmv"); val exact = r.getAs[Long]("exact")
      assert(math.abs(kmv - exact).toDouble / exact < 0.15, s"$kmv vs $exact")
    }
    val s = Seq("a", "b", "a", "c").toDF("v")
      .select(kmvDistinct(col("v")).as("e")).as[Long].head()
    assert(s == 3L)
  }
}
