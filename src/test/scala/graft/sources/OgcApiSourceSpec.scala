package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.geo.Geometry

class OgcApiSourceSpec extends SparkSpec {
  import spark.implicits._

  private val svc = "src/test/resources/geodata/ogc_stub"

  test("collection discovery reads ids + storageCrs") {
    val cols = OgcApiSource.discoverCollections(svc)
    assert(cols.map(_.id) == Seq("lakes", "roads"))
    assert(cols.head.storageCrs.exists(_.contains("EPSG/0/3006")))
  }

  test("next-link chain terminates and orders pages") {
    assert(OgcApiSource.pageChain(s"$svc/collections/lakes") ==
      Seq(s"$svc/collections/lakes/items-1.json", s"$svc/collections/lakes/items-2.json"))
    assert(OgcApiSource.pageChain(s"$svc/collections/roads") ==
      Seq(s"$svc/collections/roads/items-1.json"))
  }

  test("determineSrid: storageCrs parse, WGS84 sniff, override") {
    val projected = Seq((500000.0, 6500000.0))
    val geographic = Seq((18.06, 59.33))
    assert(OgcApiSource.determineSrid(Some("EPSG/0/3006"), projected) == 3006)
    // declared projected but coordinates look geographic → sniffed to 4326
    assert(OgcApiSource.determineSrid(Some("EPSG/0/3006"), geographic) == 4326)
    assert(OgcApiSource.determineSrid(None, geographic) == 4326)
    assert(OgcApiSource.determineSrid(Some("EPSG/0/3006"), geographic, Some(3010)) == 3010)
  }

  test("readCollection unions the page chain with lineage + bbox filter") {
    val all = OgcApiSource.readCollection(spark, svc, "lakes")
    assert(all.count() == 3)
    assert(all.select("collection_id").distinct().as[String].head() == "lakes")
    val clipped = OgcApiSource.readCollection(spark, svc, "lakes",
      bbox = Some(Geometry.BBox(17.8, 59.2, 18.3, 59.5)))
    assert(clipped.count() == 2) // Lake C at 25,65 excluded
  }

  test("readService unions selected collections") {
    assert(OgcApiSource.readService(spark, svc).count() == 4)
    assert(OgcApiSource.readService(spark, svc, Seq("roads")).count() == 1)
  }
}
