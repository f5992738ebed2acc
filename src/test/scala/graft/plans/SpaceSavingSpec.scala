package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(SsBuffer.spaceSavingTopK($"item", k).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.est", $"e.err")
      .as[(String, Long, Long)].collect()

  test("below k distinct: counts exact, errors zero, under any partitioning") {
    val data = (1 to 500).map(i => s"w${i % 7}").toDF("item")
    for (parts <- Seq(1, 8)) {
      val got = sketch(data.repartition(parts), k = 16).map(t => t._1 -> t._2).toMap
      // 1..500 = 71 full cycles + residues 1,2,3 → those get the extra hit
      assert(got == (0 until 7).map(i => s"w$i" -> (if (i >= 1 && i <= 3) 72L else 71L)).toMap)
      assert(sketch(data.repartition(parts), 16).forall(_._3 == 0L))
    }
  }

  test("eviction: a planted hot key survives a stream of distinct noise") {
    // 200 hot + 1000 singletons, k=32: true(hot)=200 > N/k=1200/32=37.5
    // → SpaceSaving guarantees the hot item is in the summary, with
    // est >= true >= est - err, regardless of arrival order
    val rows = (1 to 200).map(_ => "hot") ++ (1 to 1000).map(i => s"noise$i")
    val data = scala.util.Random.shuffle(rows).toDF("item")
    for (parts <- Seq(1, 4)) {
      val got = sketch(data.repartition(parts), k = 32)
      assert(got.length == 32)
      val hot = got.find(_._1 == "hot")
      assert(hot.isDefined, s"hot key evicted: ${got.map(_._1).mkString(",")}")
      val (_, est, err) = hot.get
      assert(est >= 200L && est - err <= 200L, s"bound violated: est=$est err=$err")
    }
  }

  test("candidate-superset + exact recount equals the exact frequent set") {
    val rows = (1 to 300).map(_ => "alpha") ++ (1 to 250).map(_ => "beta") ++
      (1 to 900).map(i => s"tail${i % 450}") // 450 items with count 2
    val data  = scala.util.Random.shuffle(rows).toDF("item")
    val cands = sketch(data.repartition(4), k = 32).map(_._1).toSet
    // threshold 100 > N/k = 1450/32: every >=100 item must be a candidate
    val exact = data.groupBy("item").count().filter($"count" >= 100)
      .select("item").as[String].collect().toSet
    assert(exact == Set("alpha", "beta"))
    assert(exact.subsetOf(cands))
  }
}
