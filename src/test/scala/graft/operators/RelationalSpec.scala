package graft.operators

import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin picks the latest right row at-or-before each left row") {
    val trades = Seq(
      ("A", 10L, 100L), ("A", 20L, 101L), ("B", 15L, 102L), ("A", 5L, 103L)
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      ("A", 8L, 1L), ("A", 10L, 2L), ("A", 18L, 3L), ("B", 99L, 4L), ("C", 1L, 5L)
    ).toDF("sym", "t", "quote_id")

    val out = Relational.asOfJoin(trades, quotes,
        keys = Seq("sym"), leftTime = "t", rightTime = "t",
        carry = Seq("quote_id"), tiebreak = "t")
      .select($"trade_id", $"asof_quote_id")
      .as[(Long, Option[Long])].collect().toMap

    assert(out(100L).contains(2L)) // t=10: quote at exactly 10 visible
    assert(out(101L).contains(3L)) // t=20: latest ≤ 20 is t=18
    assert(out(103L).isEmpty)      // t=5: no quote yet
    assert(out(102L).isEmpty)      // B t=15: B's only quote is at 99
  }

  test("asOfJoin result is partitioning-invariant") {
    val ev = spark.read.parquet(s"${sf("sf0.01")}/events.parquet")
    val p  = ev.filter($"event_type" === "purchase").select("event_id", "user_id", "ts")
    val c  = ev.filter($"event_type" === "click").select("event_id", "user_id", "ts")
    def run(parts: Int) = Relational.asOfJoin(
        p.repartition(parts), c.repartition(parts),
        Seq("user_id"), "ts", "ts", Seq("event_id"), "event_id")
      .select("event_id", "asof_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(run(1) == run(13))
  }

  test("saltedJoin inner/left match the plain join; right joins rejected") {
    val li = spark.read.parquet(s"${sf("sf0.001")}/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val o = spark.read.parquet(s"${sf("sf0.001")}/orders.parquet")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_orderpriority").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(agg(Relational.saltedJoin(li, o, Seq("l_orderkey"), numSalts = 8)) ==
      agg(li.join(o, Seq("l_orderkey"))))
    // left join keeps unmatched left rows exactly once
    val lonely = Seq((-1L, 0.0)).toDF("l_orderkey", "l_extendedprice")
    val lj = Relational.saltedJoin(li.union(lonely), o, Seq("l_orderkey"),
      numSalts = 4, joinType = "left")
    assert(lj.filter($"l_orderkey" === -1L).count() == 1)
    assert(lj.count() == li.count() + 1)
    intercept[IllegalArgumentException] {
      Relational.saltedJoin(li, o, Seq("l_orderkey"), joinType = "right")
    }
  }

  test("rangeJoin equals the naive cross-join filter, each pair exactly once") {
    val points = (0L to 100L).map(i => (i, i * 3)).toDF("pid", "x")
    val ivals = Seq(
      (1L, 0L, 10L), (2L, 5L, 5L),      // overlapping + degenerate
      (3L, 250L, 400L), (4L, 301L, 302L), // past the end / empty
      (5L, 7L, 93L)                      // many buckets wide
    ).toDF("iid", "lo", "hi")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(3))
    for (w <- Seq(1L, 7L, 100L)) {
      val got = Relational.rangeJoin(points, ivals, "x", "lo", "hi", w)
        .collect().map(key).sorted.toSeq
      val want = points.crossJoin(ivals)
        .filter($"x" >= $"lo" && $"x" <= $"hi")
        .collect().map(key).sorted.toSeq
      assert(got == want, s"bucketWidth=$w")
      assert(got.distinct == got, s"duplicate pairs at bucketWidth=$w")
    }
  }
}
