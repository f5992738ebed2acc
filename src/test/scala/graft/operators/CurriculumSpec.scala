package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def scored = Seq(
    // (id, score) with score ties to exercise the (score, id) tie-break
    (10L, 3L), (11L, 1L), (12L, 3L), (13L, 2L), (14L, 1L),
    (15L, 2L), (16L, 1L), (17L, 3L), (18L, 2L), (19L, 1L), (20L, 5L)
  ).toDF("id", "score")

  test("global rank equals the single-window reference on a tied, multi-bucket input") {
    // blockSize=4 forces multiple sub-buckets per score
    val got = Curriculum.shardByScore(scored, "score", "id", nShards = 3, blockSize = 4L)
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    val ref = scored
      .withColumn("rn", row_number().over(Window.orderBy($"score", $"id")).cast("long"))
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    assert(got == ref)
  }

  test("shard ids follow the NTILE identity: contiguous, sizes differ by at most one") {
    val rows = Curriculum.shardByScore(scored, "score", "id", nShards = 3, blockSize = 4L)
      .select($"rn", $"shard").as[(Long, Long)].collect().sortBy(_._1)
    // 11 rows / 3 shards → sizes 4,4,3 with the larger shards first
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes == Map(1L -> 4, 2L -> 4, 3L -> 3))
    // contiguity: shard is monotone in rank
    assert(rows.map(_._2).sameElements(rows.map(_._2).sorted))
  }

  test("result is independent of input partitioning and blockSize") {
    val a = Curriculum.shardByScore(scored, "score", "id", 4, blockSize = 2L)
      .select($"id", $"rn", $"shard").as[(Long, Long, Long)].collect().toSet
    val b = Curriculum.shardByScore(scored.repartition(7), "score", "id", 4, blockSize = 1000L)
      .select($"id", $"rn", $"shard").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("the only unpartitioned window runs over bucket totals, not rows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = Curriculum.shardByScore(scored, "score", "id", 3)
      .queryExecution.optimizedPlan
    val global = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(global.size == 1, s"expected exactly one global window:\n$plan")
    // it must consume the aggregated bucket counts (an Aggregate below),
    // never the raw rows
    val feedsAgg = global.head.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isDefined
    assert(feedsAgg, s"global window not over bucket totals:\n$plan")
  }

  private def weighted = Seq(
    // (id, score, weight) with score ties across sub-buckets
    (10L, 3L, 7L), (11L, 1L, 4L), (12L, 3L, 2L), (13L, 2L, 9L),
    (14L, 1L, 1L), (15L, 2L, 5L), (16L, 1L, 6L), (17L, 3L, 3L),
    (18L, 2L, 2L), (19L, 1L, 8L), (20L, 5L, 4L)
  ).toDF("id", "score", "w")

  test("selectByBudget cumulative weights equal the single-window running sum") {
    val got = Curriculum.selectByBudget(weighted, "score", "id", "w",
        budget = 20L, blockSize = 4L)
      .select($"id", $"cum_weight", $"selected").as[(Long, Long, Long)]
      .collect().map { case (id, c, sel) => id -> ((c, sel)) }.toMap
    val ref = weighted
      .withColumn("cum", sum($"w").over(Window.orderBy($"score", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"cum",
        ($"cum" <= 20L).cast("long").as("sel"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, c, sel) => id -> ((c, sel)) }.toMap
    assert(got == ref)
  }

  test("selectByBudget cut is a prefix of the (score, id) order and respects the budget") {
    val rows = Curriculum.selectByBudget(weighted, "score", "id", "w", budget = 20L)
      .orderBy($"score", $"id")
      .select($"w", $"cum_weight", $"selected").as[(Long, Long, Long)].collect()
    // selected is a prefix: once 0, always 0
    assert(rows.map(_._3).sameElements(rows.map(_._3).sorted.reverse))
    // the selected prefix fits the budget; adding the next row would not
    val kept = rows.takeWhile(_._3 == 1L)
    assert(kept.map(_._1).sum <= 20L)
    assert(rows.length == kept.length || kept.map(_._1).sum + rows(kept.length)._1 > 20L)
    // cum_weight is the inclusive running sum
    assert(rows.map(_._2).sameElements(rows.map(_._1).scanLeft(0L)(_ + _).tail))
  }

  test("selectByBudget is partitioning- and blockSize-independent; zero budget selects none") {
    val a = Curriculum.selectByBudget(weighted, "score", "id", "w", 17L, blockSize = 2L)
      .select($"id", $"cum_weight", $"selected").as[(Long, Long, Long)].collect().toSet
    val b = Curriculum.selectByBudget(weighted.repartition(5), "score", "id", "w", 17L,
        blockSize = 1000L)
      .select($"id", $"cum_weight", $"selected").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    val none = Curriculum.selectByBudget(weighted, "score", "id", "w", 0L)
      .agg(sum($"selected")).as[Long].head()
    assert(none == 0L)
  }
}
