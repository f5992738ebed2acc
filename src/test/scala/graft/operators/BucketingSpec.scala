package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle; results match the shuffled join") {
    spark.conf.set("spark.sql.adaptive.enabled", "false") // stable plan inspection
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      val o  = spark.read.parquet(s"${sf()}/orders.parquet")
      Bucketing.writeBucketed(li, "li_bkt", 8, Seq("l_orderkey"))
      Bucketing.writeBucketed(o, "o_bkt", 8, Seq("o_orderkey"))

      val bucketed = spark.table("li_bkt")
        .join(spark.table("o_bkt"), $"l_orderkey" === $"o_orderkey")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      // join itself is exchange-free (only the final agg shuffles)
      val joinOnly = spark.table("li_bkt")
        .join(spark.table("o_bkt"), $"l_orderkey" === $"o_orderkey")
        .select("l_orderkey")
      assert(Bucketing.isShuffleFree(joinOnly),
        s"bucketed join still shuffles:\n${joinOnly.queryExecution.executedPlan}")

      val plain = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(!Bucketing.isShuffleFree(plain.select(lit(1))) ||
        plain.count() == bucketed.count()) // non-bucketed path shuffles; results equal
      assert(bucketed.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
        plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("ensureBucketed: writes once, skips on same key, rewrites on new source/schema") {
    val dir = sf()
    val li = spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_quantity")
    def files(): Map[String, Long] = {
      // resolve through the catalog so the test follows
      // spark.sql.warehouse.dir / working-directory configuration
      val uri = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("ensure_bkt"))
        .location
      val loc = new java.io.File(uri)
      assert(loc.isDirectory, s"bucketed table location missing: $uri")
      loc.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    Bucketing.ensureBucketed(li, "ensure_bkt", 4, Seq("l_orderkey"), srcTag = dir)
    val first = files()
    assert(first.nonEmpty)
    // same source tag + schema: no rewrite (identical file listing)
    Bucketing.ensureBucketed(li, "ensure_bkt", 4, Seq("l_orderkey"), srcTag = dir)
    assert(files() == first, "identical ingest must be skipped")
    // a new source tag forces a rewrite
    Bucketing.ensureBucketed(li, "ensure_bkt", 4, Seq("l_orderkey"), srcTag = s"$dir/v2")
    assert(files() != first, "new source tag must rewrite")
    // a schema change under the SAME tag also rewrites
    val before = files()
    Bucketing.ensureBucketed(
      spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_extendedprice"),
      "ensure_bkt", 4, Seq("l_orderkey"), srcTag = s"$dir/v2")
    assert(files() != before, "schema change must rewrite")
  }

  test("q75 plan shape: the only hash exchange is the aggregation, none under the join") {
    spark.conf.set("spark.sql.adaptive.enabled", "false") // stable plan inspection
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val df = graft.SparkEntry.queries("q75_bucketed_join")(spark, sf())
      val plan = df.queryExecution.executedPlan.toString
      val nHashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(nHashExchanges == 1,
        s"expected exactly 1 hash exchange (the groupBy) — a second one means " +
          s"a bucketed side shuffled:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
