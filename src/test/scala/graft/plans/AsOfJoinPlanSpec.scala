package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Relational

class AsOfJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.install(spark)

  private lazy val ev = spark.read.parquet(s"${sf()}/events.parquet")
  private lazy val purchases =
    ev.filter($"event_type" === "purchase").select("event_id", "user_id", "ts")
  private lazy val clicks =
    ev.filter($"event_type" === "click").select("event_id", "user_id", "ts")

  private def native =
    AsOfJoin(purchases, clicks, keys = Seq("user_id"),
      leftTime = "ts", rightTime = "ts", carry = Seq("event_id"),
      tiebreak = "event_id")

  test("native as-of join matches the composed union+window variant") {
    val a = native
      .select($"event_id", $"user_id", $"asof_event_id")
      .orderBy("event_id").collect()
    val b = Relational.asOfJoin(purchases, clicks,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        carry = Seq("event_id"), tiebreak = "event_id")
      .select($"event_id", $"user_id", $"asof_event_id")
      .orderBy("event_id").collect()
    assert(a.length == purchases.count()) // left-outer: every left row survives
    assert(a.sameElements(b))
  }

  test("hand-built edge cases: exact-time match visible, unmatched null, tiebreak") {
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 50L))
      .toDF("id", "k", "t")
    val r = Seq((7L, 10L, 100L), (8L, 10L, 100L), (9L, 10L, 150L), (5L, 30L, 1L))
      .toDF("rid", "k", "t")
    val out = AsOfJoin(l, r, Seq("k"), "t", "t", Seq("rid"), "rid")
      .select($"id", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(8L)) // t=100: both rid 7,8 at 100 visible, tiebreak → 8
    assert(out(2L).contains(9L)) // latest ≤ 200 is rid 9 @150
    assert(out(3L).isEmpty)      // key 20 has no right rows → null
  }

  test("SQL null semantics: null keys/times never match, left rows survive") {
    val l = Seq(
      (1L, Some(10L), Some(100L)), // normal match
      (2L, None,      Some(100L)), // null key → unmatched, row kept
      (3L, Some(10L), None),       // null time → unmatched, row kept
      (4L, Some(99L), Some(100L))  // key only present as a null-time right
    ).toDF("id", "k", "t")
    val r = Seq(
      (7L, Some(10L), Some(50L)),  // the only legitimate match
      (8L, None,      Some(40L)),  // null key → can never match (even vs id=2)
      (9L, Some(99L), None)        // null time → can never match (even vs id=4)
    ).toDF("rid", "k", "t")
    val out = AsOfJoin(l, r, Seq("k"), "t", "t", Seq("rid"), "rid")
      .select($"id", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out.size == 4) // every left row survives
    assert(out(1L).contains(7L))
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("plans as AsOfJoinExec; pre-partitioned inputs add no exchange") {
    // SparkPlan.nodeName strips the "Exec" suffix → renders as "AsOfJoin"
    val planned = native.queryExecution.executedPlan.toString
    assert(planned.contains("AsOfJoin "))
    // cold inputs: EnsureRequirements inserts one exchange per side
    assert("Exchange hashpartitioning".r.findAllIn(planned).length == 2)

    // co-partitioned inputs (the bucketed-table / pre-shuffled case):
    // repartition both sides on the key first — the join itself must
    // then plan with NO additional exchange above those two
    val p = purchases.repartition(4, $"user_id")
    val c = clicks.repartition(4, $"user_id")
    val pre = AsOfJoin(p, c, Seq("user_id"), "ts", "ts", Seq("event_id"), "event_id")
    val prePlan = pre.queryExecution.executedPlan.toString
    assert(prePlan.contains("AsOfJoin "))
    assert("Exchange hashpartitioning".r.findAllIn(prePlan).length == 2,
      s"expected only the 2 explicit repartitions, got:\n$prePlan")
    assert(pre.count() == purchases.count())
  }
}
