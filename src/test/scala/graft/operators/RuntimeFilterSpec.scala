package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.BloomHash

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def lineitem = spark.read.parquet(s"${sf()}/lineitem.parquet")
  private def urgentKeys = spark.read.parquet(s"${sf()}/orders.parquet")
    .filter($"o_orderpriority" === "1-URGENT")
    .select($"o_orderkey")

  test("bloom build is deterministic and merge-order independent") {
    val once  = RuntimeFilter.buildBloom(urgentKeys, "o_orderkey", 1 << 14)
    val again = RuntimeFilter.buildBloom(urgentKeys.repartition(7), "o_orderkey", 1 << 14)
    assert(once.sameElements(again), "bitset must not depend on partitioning")
  }

  test("no false negatives: every build key passes the probe") {
    val bits = RuntimeFilter.buildBloom(urgentKeys, "o_orderkey", 1 << 14)
    val misses = urgentKeys
      .filter(!RuntimeFilter.mightContain($"o_orderkey", bits))
      .count()
    assert(misses == 0L, s"$misses build keys rejected by their own filter")
  }

  test("pruning is real and the fp rate is near theory for the sized filter") {
    val bits  = RuntimeFilter.buildBloom(urgentKeys, "o_orderkey", 1 << 17)
    val total = lineitem.count()
    val candidates = lineitem
      .filter(RuntimeFilter.mightContain($"l_orderkey", bits)).count()
    val exact = lineitem
      .join(urgentKeys, $"l_orderkey" === $"o_orderkey", "leftsemi").count()
    assert(candidates >= exact, "Bloom dropped a true match")
    assert(candidates < total, "Bloom pruned nothing")
    // ~3k keys in 2^17 bits, k=5 → theoretical fp ≈ 2e-5; allow 100×
    // slack so the assertion survives fixture growth, while still
    // catching a broken hash (which admits ~everything)
    val fp = (candidates - exact).toDouble / (total - exact).toDouble
    assert(fp < 0.01, f"false-positive rate $fp%.4f too high for 2^17 bits")
  }

  test("bloom-pruned semi-join equals the plain semi-join exactly") {
    val pruned = RuntimeFilter
      .semiJoin(lineitem, "l_orderkey", urgentKeys, "o_orderkey")
      .select($"l_orderkey", $"l_linenumber")
    val plain = lineitem
      .join(urgentKeys, $"l_orderkey" === $"o_orderkey", "leftsemi")
      .select($"l_orderkey", $"l_linenumber")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty,
      "runtime filter changed the semi-join result")
  }

  test("probe predicate evaluates in the scan stage, before any exchange") {
    val bits = RuntimeFilter.buildBloom(urgentKeys, "o_orderkey", 1 << 14)
    val df = lineitem
      .filter(RuntimeFilter.mightContain($"l_orderkey", bits))
      .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    val filterAt   = plan.indexOf("bloom_might_contain")
    val exchangeAt = plan.indexOf("Exchange")
    assert(filterAt >= 0, s"probe predicate missing from plan:\n$plan")
    // executed plans print top-down: the filter must sit BELOW the
    // exchange (later in the string), i.e. on the map side of the shuffle
    assert(exchangeAt >= 0 && filterAt > exchangeAt,
      s"bloom probe not below the exchange:\n$plan")
  }

  test("hash kernel: set/mightContain agree and stride never collapses") {
    val bits = new Array[Long](4) // 256 bits
    (0L until 64L).foreach(BloomHash.set(bits, _, 5))
    assert((0L until 64L).forall(BloomHash.mightContain(bits, _, 5)))
    // h2 is forced odd: all k probe positions of a key are distinct mod 2^m
    val probes = (0 until 5).map(i =>
      (BloomHash.h1(12345L) + i * BloomHash.h2(12345L)) & 255L).toSet
    assert(probes.size == 5)
  }
}
