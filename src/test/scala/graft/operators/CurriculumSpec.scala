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
}
