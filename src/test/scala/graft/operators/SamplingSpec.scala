package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("id")

  test("hashSplit is total, disjoint, deterministic, and near the weights") {
    val splits = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val out = Sampling.hashSplit(ids(2000), "id", splits)
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test")) // total: no nulls, no extras
    assert(counts.values.sum == 2000L)
    // md5 buckets are near-uniform: 90/5/5 ±3pp on 2000 ids
    assert(math.abs(counts("train") - 1800L) <= 60, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 100L) <= 60, s"val=${counts("val")}")
    // deterministic: identical assignment on re-run
    val again = Sampling.hashSplit(ids(2000), "id", splits)
      .as[(Long, String)].collect().toSet
    assert(out.as[(Long, String)].collect().toSet == again)
  }

  test("hashSplit assignment is per-id stable as the corpus grows") {
    val splits = Seq("train" -> 90, "val" -> 10)
    val small = Sampling.hashSplit(ids(300), "id", splits).as[(Long, String)].collect().toMap
    val large = Sampling.hashSplit(ids(900), "id", splits).as[(Long, String)].collect().toMap
    small.foreach { case (id, s) => assert(large(id) == s) } // no bleed between runs
  }

  test("hashSplit rejects weights that do not sum to 100") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids(10), "id", Seq("a" -> 50, "b" -> 40))
    }
  }

  test("deterministicSample keeps a stable ~pct subset; salts are independent") {
    val kept = Sampling.deterministicSample(ids(2000), "id", 10).as[Long].collect().toSet
    assert(math.abs(kept.size - 200) <= 60, s"kept=${kept.size}")
    val again = Sampling.deterministicSample(ids(2000), "id", 10).as[Long].collect().toSet
    assert(kept == again)
    // a different salt draws a (practically) different subset
    val other = Sampling.deterministicSample(ids(2000), "id", 10, salt = "other")
      .as[Long].collect().toSet
    assert(kept != other)
    // sampling composes with splitting without correlation: ~10% of each
    val sampledTrain = Sampling.hashSplit(
        Sampling.deterministicSample(ids(2000), "id", 10),
        "id", Seq("train" -> 90, "val" -> 10))
      .filter($"split" === "train").count()
    assert(math.abs(sampledTrain - 180L) <= 60, s"sampledTrain=$sampledTrain")
  }

  test("stratifiedSample applies per-stratum rates; strata stay independent") {
    val df = (0 until 1000).map(i => (i.toLong, if (i % 10 == 0) "rare" else "common"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, "id", "lang",
      rates = Map("common" -> 20), defaultPct = 100)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("rare") == 100L) // default 100%: every rare row survives
    assert(math.abs(byLang("common") - 180L) <= 60, s"common=${byLang("common")}")
    // changing ANOTHER stratum's rate never disturbs this stratum's kept set
    val rareKept = out.filter($"lang" === "rare").select("id").as[Long].collect().toSet
    val rerated = Sampling.stratifiedSample(df, "id", "lang",
      rates = Map("common" -> 50), defaultPct = 100)
    assert(rerated.filter($"lang" === "rare").select("id").as[Long].collect().toSet == rareKept)
  }

  test("perKeyCap bounds every key, keeps small keys whole, and is deterministic") {
    val df = ((0 until 100).map(i => (i.toLong, "big")) ++
      (100 until 103).map(i => (i.toLong, "small"))).toDF("id", "domain")
    val kept = Sampling.perKeyCap(df, "domain", "id", cap = 10)
      .select("domain", "id").as[(String, Long)].collect()
    val byKey = kept.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byKey("big").size == 10)       // cap binds exactly
    assert(byKey("small") == Set(100L, 101L, 102L)) // under-cap key untouched
    // deterministic: same kept set on re-run
    val again = Sampling.perKeyCap(df, "domain", "id", cap = 10)
      .filter($"domain" === "big").select("id").as[Long].collect().toSet
    assert(again == byKey("big"))
  }

  test("perKeyCap: one key's population never disturbs another key's kept set") {
    val a = (0 until 50).map(i => (i.toLong, "a"))
    val keptA = Sampling.perKeyCap(a.toDF("id", "domain"), "domain", "id", cap = 5)
      .select("id").as[Long].collect().toSet
    val grownB = (a ++ (1000 until 2000).map(i => (i.toLong, "b"))).toDF("id", "domain")
    val keptA2 = Sampling.perKeyCap(grownB, "domain", "id", cap = 5)
      .filter($"domain" === "a").select("id").as[Long].collect().toSet
    assert(keptA2 == keptA, "rank order inside a key must be key-local")
  }

  test("stratifiedExact: hand-checked largest-remainder allocation") {
    // strata sizes a=5, b=3, c=2, budget 4: quotas 2.0/1.2/0.8 →
    // bases 2/1/0 (sum 3), remainders 0/2/8 → the one leftover goes to c
    val df = ((0 until 5).map(i => (i.toLong, "a")) ++
      (10 until 13).map(i => (i.toLong, "b")) ++
      (20 until 22).map(i => (i.toLong, "c"))).toDF("id", "s")
    val got = Sampling.stratifiedExact(df, "s", "id", budget = 4L)
      .select("s").as[String].collect().groupBy(identity).view.mapValues(_.length).toMap
    assert(got == Map("a" -> 2, "b" -> 1, "c" -> 1))
  }

  test("stratifiedExact: exact budget, near-proportional, partition-independent") {
    val df = ((0 until 700).map(i => (i.toLong, "x")) ++
      (1000 until 1250).map(i => (i.toLong, "y")) ++
      (2000 until 2050).map(i => (i.toLong, "z"))).toDF("id", "s")
    val out = Sampling.stratifiedExact(df, "s", "id", budget = 100L)
      .select("s", "id").as[(String, Long)].collect()
    assert(out.length == 100, "budget is exact")
    val byS = out.groupBy(_._1).view.mapValues(_.length).toMap
    // proportionality: |alloc − budget·n_s/N| < 1 (largest-remainder bound)
    assert(byS("x") == 70 && byS("y") == 25 && byS("z") == 5)
    val again = Sampling.stratifiedExact(df.repartition(13), "s", "id", budget = 100L)
      .select("s", "id").as[(String, Long)].collect()
    assert(again.toSet == out.toSet, "picks must not depend on partitioning")
  }

  test("stratifiedExact: a stratum can never yield more rows than it has") {
    // budget 12 > N=9: big's quota (10+1 leftover) exceeds its 8 rows —
    // the rank filter clamps to the population and the output
    // undershoots the infeasible budget
    val df = ((0 until 8).map(i => (i.toLong, "big")) ++
      Seq((100L, "tiny"))).toDF("id", "s")
    val out = Sampling.stratifiedExact(df, "s", "id", budget = 12L)
      .select("s").as[String].collect().groupBy(identity).view.mapValues(_.length).toMap
    assert(out("big") == 8 && out("tiny") == 1)
  }
}
