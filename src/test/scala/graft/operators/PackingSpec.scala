package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("concatPack on a hand-computed corpus") {
    // budget 10: stream offsets 0,4,9,9,17 — doc 3 is empty, doc 2
    // straddles the cut at 10
    val docs = Seq((1L, 4L), (2L, 5L), (3L, 0L), (4L, 8L), (5L, 3L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.concatPack(docs, "doc_id", "n_tokens", budget = 10L)
      .select("doc_id", "start_offset", "chunk_first", "chunk_last")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L),   // tokens 0-3
      (2L, 4L, 0L, 0L),   // tokens 4-8
      (3L, 9L, 0L, 0L),   // empty: boundary chunk, no step backwards
      (4L, 9L, 0L, 1L),   // tokens 9-16: straddles the cut at 10
      (5L, 17L, 1L, 1L))) // tokens 17-19
  }

  test("two-level prefix sum equals the single-window reference; buckets exercised") {
    // 500 rows with gaps in the key (non-dense ids) and blockSize 7 so
    // dozens of buckets participate
    val docs = (0 until 500).map(i => (i.toLong * 3 + (i % 2), (i * 31 % 97).toLong))
      .toDF("doc_id", "w")
    val got = Packing.withStartOffset(docs, "doc_id", "w", blockSize = 7L)
      .select("doc_id", "start_offset").as[(Long, Long)].collect().toMap
    val ref = docs.withColumn("start_offset",
        coalesce(sum($"w").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "start_offset").as[(Long, Long)].collect().toMap
    assert(got == ref)
  }

  test("plan shape: the only unpartitioned window runs over bucket totals") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val docs = (0 until 200).map(i => (i.toLong, (i % 7).toLong)).toDF("doc_id", "w")
    val plan = Packing.concatPack(docs, "doc_id", "w", budget = 64L, blockSize = 16L)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.size == 2)
    val (unpartitioned, partitioned) = windows.partition(_.partitionSpec.isEmpty)
    // the global-ordered window exists exactly once...
    assert(unpartitioned.size == 1 && partitioned.size == 1)
    // ...and consumes an Aggregate (bucket totals), never corpus rows —
    // the shape that keeps the single-partition stage at 1/blockSize
    assert(unpartitioned.head.exists {
      case _: Aggregate => true
      case _            => false
    }, "unpartitioned window must sit above the bucket-totals aggregate")
  }

  test("chunk accounting: every chunk except the last carries exactly budget tokens") {
    val docs = (0 until 300).map(i => (i.toLong, (i * 13 % 50 + 1).toLong))
      .toDF("doc_id", "w")
    val budget = 64L
    val packed = Packing.concatPack(docs, "doc_id", "w", budget)
      .select("start_offset", "w").as[(Long, Long)].collect()
    val total = packed.map(_._2).sum
    val lastChunk = (total - 1) / budget
    // token t lives in chunk t/budget; count tokens per chunk
    val perChunk = packed.flatMap { case (s, w) =>
      (s until s + w).map(_ / budget)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (0L until lastChunk).foreach { c =>
      assert(perChunk(c) == budget, s"chunk $c has ${perChunk(c)} tokens")
    }
    assert(perChunk(lastChunk) == total - lastChunk * budget)
  }
}
