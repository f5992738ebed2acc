package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.geo.{GeoFunctions, Geometry}

class GeomPlanSpec extends SparkSpec {
  import spark.implicits._

  private val box = Geometry.BBox(10.0, 500.0, 40.0, 1500.0)

  private lazy val parts = spark.read.parquet(s"${sf("sf0.01")}/part.parquet")
    .select(
      col("p_partkey"),
      col("p_size").cast("double").as("xmin"),
      col("p_retailprice").as("ymin"),
      (col("p_size").cast("double") + 1.0).as("xmax"),
      (col("p_retailprice") + 1.0).as("ymax"))

  test("BboxIntersectsExpr agrees with the Column formula, incl. nulls") {
    val viaExpr = parts.filter(
      BboxIntersectsExpr($"xmin", $"ymin", $"xmax", $"ymax", box))
    val viaCols = parts.filter(
      GeoFunctions.bboxIntersects($"xmin", $"ymin", $"xmax", $"ymax", box))
    assert(viaExpr.count() == viaCols.count())
    assert(viaExpr.count() > 0)
    // nulls: expression evaluates to null → row filtered, no crash
    val withNulls = parts.withColumn("xmin",
      when($"p_partkey" % 2 === 0, $"xmin"))
    val n = withNulls.filter(
      BboxIntersectsExpr($"xmin", $"ymin", $"xmax", $"ymax", box)).count()
    assert(n <= viaExpr.count())
  }

  test("expression participates in whole-stage codegen") {
    // AQE reports zero codegen subtrees on unexecuted plans — disable it
    // so the inspection sees the real stages.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = parts.filter(
        BboxIntersectsExpr($"xmin", $"ymin", $"xmax", $"ymax", box))
      val codegen = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!codegen.contains("Found 0 WholeStageCodegen"), codegen.take(300))
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("GeomFilterRule injects a pushable bbox guard before the geometry UDF") {
    GraftExtensions.install(spark)
    // geometry table with bbox columns, written to parquet so pushdown
    // is observable in the scan
    val dir = Files.createTempDirectory("graft_geo_parquet").toString
    val geoms = spark.range(2000).select(
      col("id"),
      concat(lit("POINT ("), (col("id") % 100).cast("double").cast("string"),
        lit(" "), (col("id") % 50).cast("double").cast("string"), lit(")")).as("geometry"))
    GeoFunctions.withBboxColumns(geoms).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(GeoFunctions.stIntersectsBbox(col("geometry"), Geometry.BBox(10, 10, 20, 20)))

    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("xmax") && optimized.contains(">= 10.0"),
      s"rule did not fire; optimized plan:\n$optimized")
    // the guard's comparisons reach the parquet scan as pushed filters
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters") &&
      (formatted.contains("GreaterThanOrEqual(xmax,10.0") || formatted.contains("LessThanOrEqual(xmin,20.0")),
      s"no pushed bbox filters:\n$formatted")
    // and the result is identical to the unguarded UDF filter
    val plain = spark.read.parquet(dir)
      .filter(GeoFunctions.stIntersectsBbox(col("geometry"), Geometry.BBox(10, 10, 20, 20)))
      .count()
    assert(df.count() == plain)
    assert(df.count() > 0)
  }

  test("bbox_intersects is callable from SQL after install") {
    GraftExtensions.install(spark)
    parts.createOrReplaceTempView("parts_bbox")
    val n = spark.sql(
      s"SELECT count(*) FROM parts_bbox WHERE bbox_intersects(xmin, ymin, xmax, ymax, 10.0D, 500.0D, 40.0D, 1500.0D)")
      .as[Long].head()
    val expected = parts.filter(
      GeoFunctions.bboxIntersects($"xmin", $"ymin", $"xmax", $"ymax", box)).count()
    assert(n == expected)
  }
}
