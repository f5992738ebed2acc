package graft.operators

import graft.SparkSpec

class DeltaSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val old = Seq(
      (1L, "alpha beta"),
      (2L, "to be removed"),
      (3L, "the original text"),
      (4L, "Spacing   And Case")
    ).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "alpha beta"),          // unchanged
      (3L, "an edited text"),      // changed
      (4L, "spacing and case"),    // formatting-only → unchanged (canonical fp)
      (5L, "brand new doc")        // added
    ).toDF("doc_id", "text")
    val got = Delta.snapshotDiff(old, neu)
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "removed", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
  }
}
