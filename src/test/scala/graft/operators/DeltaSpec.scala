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

  test("duplicate ids within a snapshot reduce to one deterministic status row") {
    // each side collapses to min-fingerprint per id BEFORE the join —
    // no fan-out, no contradictory rows, order-independent
    val old = Seq((1L, "zz text"), (1L, "aa text"), (2L, "stable")).toDF("doc_id", "text")
    val neu = Seq((1L, "aa text"), (1L, "zz text"), (2L, "stable")).toDF("doc_id", "text")
    val got = Delta.snapshotDiff(old, neu).as[(Long, String)].collect().toSeq
    assert(got.size == 2, s"one row per id expected: $got")
    // both sides carry the same duplicate set → same min fp → unchanged
    assert(got.toMap == Map(1L -> "unchanged", 2L -> "unchanged"))
  }
}
