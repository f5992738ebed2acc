package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("insert, retract, and key-death semantics on a hand case") {
    val state = Seq(("a", 2L, 30L), ("b", 1L, 5L)).toDF("k", "n", "sum_c")
    val delta = Seq(
      ("a", 7L, 1L),   // insert into existing key
      ("b", 5L, -1L),  // retraction killing key b (n → 0)
      ("c", 4L, 1L)    // insert creating key c
    ).toDF("k", "v", "sign")
    val got = Incremental.maintainSumCount(state, delta, Seq("k"), "v", "sign")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 3L, 37L), ("c", 1L, 4L)))
  }

  test("maintenance equals direct aggregation of the effective row set") {
    val rows = (0L until 1000L).map(i => (i, s"t${i % 4}", i % 100)).toDF("id", "k", "v")
    val base = rows.filter($"id" % 5 =!= 0)
    val state = base.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_c"))
    val delta = rows.filter($"id" % 5 === 0).withColumn("sign", lit(1L))
      .unionByName(base.filter($"id" % 7 === 0).withColumn("sign", lit(-1L)))
      .select("k", "v", "sign")
    val got = Incremental.maintainSumCount(state, delta, Seq("k"), "v", "sign")
      .as[(String, Long, Long)].collect().toSet
    val direct = rows.filter($"id" % 5 === 0 || $"id" % 7 =!= 0)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sum_c"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == direct)
    // folding the delta in two batches lands on the same state
    val d1 = delta.filter($"sign" === 1L)
    val d2 = delta.filter($"sign" === -1L)
    val twoStep = Incremental.maintainSumCount(
      Incremental.maintainSumCount(state, d1, Seq("k"), "v", "sign"),
      d2, Seq("k"), "v", "sign").as[(String, Long, Long)].collect().toSet
    assert(twoStep == direct, "maintenance must be batch-associative")
  }
}
