package graft.operators

import graft.SparkSpec

class SummaryAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("one-pass distributed phase/status counters") {
    val pairs = Seq(
      ("stage", "done"), ("stage", "done"), ("stage", "error"),
      ("publish", "done"), ("publish", "skip"), ("stage", "done")
    ).toDS().repartition(3)
    val out = SummaryAggregator.summarize(pairs)
    assert(out == Map(
      "stage/done" -> 3L, "stage/error" -> 1L,
      "publish/done" -> 1L, "publish/skip" -> 1L))
  }
}
