package graft.sources.v2

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.GeoJsonSource

class RestDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private val svc = "src/test/resources/geodata/rest_stub"

  private def restDf = spark.read.format("graft-rest").option("path", svc).load()

  test("reads all layers/pages with the normalized schema") {
    val df = restDf
    assert(df.columns.toSeq == Seq("layer_id", "feature_id", "properties",
      "geom_type", "geometry", "srid", "xmin", "ymin", "xmax", "ymax"))
    assert(df.count() == 5) // 4 in layer-0 (2 pages) + 1 in layer-1
    assert(df.select("layer_id").distinct().as[Int].collect().sorted.toSeq == Seq(0, 1))
    // content parity with the JSON-reader path
    val viaJson = GeoJsonSource.read(spark, s"$svc/layer-0/page-*.json")
    assert(df.filter($"layer_id" === 0).select("geometry").as[String].collect().sorted.toSeq ==
      viaJson.select("geometry").as[String].collect().sorted.toSeq)
  }

  test("filter pushdown: bbox and layer filters reach the scan; residuals stay") {
    val df = restDf.filter(
      $"layer_id" === 0 && $"xmin" >= 17.9 && $"xmax" <= 18.2 &&
        $"properties".getItem("category") === "A")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("PushedFilters=[") && scanDesc.contains("GreaterThanOrEqual(xmin,17.9"),
      s"bbox filter not pushed:\n$scanDesc")
    // properties['category'] is NOT pushable → must not appear in PushedFilters
    assert(!scanDesc.substring(scanDesc.indexOf("PushedFilters=[")).takeWhile(_ != ']').contains("category"))
    // ids 1 and 3 are category A inside the bbox
    assert(df.select($"properties".getItem("id")).as[String].collect().sorted.toSeq == Seq("1", "3"))
  }

  test("column pruning reaches the scan") {
    val df = restDf.select("feature_id", "geom_type")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("ReadSchema=[feature_id,geom_type]"), s"not pruned:\n$scanDesc")
    assert(df.count() == 5)
  }

  test("limit pushdown short-circuits page reading") {
    val df = restDf.limit(2)
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("limit=2"), s"limit not pushed:\n$scanDesc")
    assert(df.count() == 2)
  }

  test("each page is its own partition (pagination → parallel read)") {
    assert(restDf.rdd.getNumPartitions == 3) // 2 pages + 1 page
  }
}
