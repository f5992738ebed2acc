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
}
