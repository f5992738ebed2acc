package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Incremental

class IncrementalSinkSpec extends SparkSpec {
  import spark.implicits._

  private def zeroState = Seq.empty[(String, Long, Long)].toDF("k", "n", "sum_c")

  test("foreachBatch fold over real micro-batches equals one-shot maintenance") {
    val b0 = Seq(("a", 10L, 1L), ("a", 20L, 1L), ("b", 5L, 1L)).toDF("k", "v", "sign")
    val b1 = Seq(("a", 20L, -1L), ("c", 7L, 1L), ("b", 3L, 1L)).toDF("k", "v", "sign")
    val streamed = IncrementalSink.drainFolded(Seq(b0, b1), zeroState,
        (acc, b) => Incremental.maintainSumCount(acc, b, Seq("k"), "v", "sign"))
      .as[(String, Long, Long)].collect().toSet
    val oneShot = Incremental.maintainSumCount(
        zeroState, b0.unionByName(b1), Seq("k"), "v", "sign")
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == Set(("a", 1L, 10L), ("b", 2L, 8L), ("c", 1L, 7L)))
    assert(streamed == oneShot, "micro-batch boundaries must be invisible")
  }

  test("a retraction batch can empty the state") {
    val b0 = Seq(("x", 4L, 1L)).toDF("k", "v", "sign")
    val b1 = Seq(("x", 4L, -1L)).toDF("k", "v", "sign")
    val streamed = IncrementalSink.drainFolded(Seq(b0, b1), zeroState,
      (acc, b) => Incremental.maintainSumCount(acc, b, Seq("k"), "v", "sign"))
    assert(streamed.isEmpty)
  }

  test("the returned state is self-contained after the drain's cleanup") {
    val b0 = Seq(("a", 1L, 1L)).toDF("k", "v", "sign")
    val out = IncrementalSink.drainFolded(Seq(b0), zeroState,
      (acc, b) => Incremental.maintainSumCount(acc, b, Seq("k"), "v", "sign"))
    // scratch dir and drain session are gone; the frame must still scan
    assert(out.count() == 1L)
    assert(out.as[(String, Long, Long)].head() == ("a", 1L, 1L))
  }
}
