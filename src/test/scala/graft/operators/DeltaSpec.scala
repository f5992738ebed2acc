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

  test("applyChanges: update replaces, insert lands, delete removes, rest pass through") {
    val base = Seq(
      (1L, "keep me"), (2L, "update me"), (3L, "delete me"), (4L, "also keep")
    ).toDF("doc_id", "text")
    val changes = Seq(
      (2L, "updated text", false),
      (3L, "ignored payload", true),
      (9L, "inserted doc", false)
    ).toDF("doc_id", "text", "is_delete")
    val got = Delta.applyChanges(base, changes, "doc_id", "is_delete")
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "keep me", 2L -> "updated text", 4L -> "also keep", 9L -> "inserted doc"))
  }

  test("applyChanges compacts duplicate change ids deterministically (delete wins)") {
    val base = Seq((1L, "base"), (2L, "base2")).toDF("doc_id", "text")
    val changes = Seq(
      (1L, "upsert a", false), (1L, "upsert b", false), // dup upserts → greatest payload
      (2L, "phantom", false), (2L, "phantom", true)     // delete beats upsert
    ).toDF("doc_id", "text", "is_delete")
    // result must not depend on the change set's partitioning
    val r1 = Delta.applyChanges(base, changes, "doc_id", "is_delete")
      .as[(Long, String)].collect().toMap
    val r2 = Delta.applyChanges(base, changes.repartition(5), "doc_id", "is_delete")
      .as[(Long, String)].collect().toMap
    assert(r1 == Map(1L -> "upsert b"))
    assert(r2 == r1)
  }

  test("applyChanges rejects a change set whose schema is not base + flag") {
    val base = Seq((1L, "x")).toDF("doc_id", "text")
    val bad  = Seq((1L, true)).toDF("doc_id", "is_delete")
    intercept[IllegalArgumentException] {
      Delta.applyChanges(base, bad, "doc_id", "is_delete")
    }
  }
}
