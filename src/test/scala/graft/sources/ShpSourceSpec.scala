package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShpSourceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "src/test/resources/shapedata"
  private def bytes(f: String) = Files.readAllBytes(Paths.get(s"$dir/$f"))

  test("shp decoder: polygons, ring-winding multipolygon, null shape") {
    val geoms = Shapefile.geometries(bytes("districts.shp"))
    assert(geoms.length == 22)
    assert(geoms.head._1 == 1 && geoms.head._2.get.kind == "Polygon")
    // record 21: CW outer + CCW hole + second CW outer → MultiPolygon
    assert(geoms(20)._2.get.kind == "MultiPolygon")
    assert(geoms(21)._2.isEmpty) // null shape
  }

  test("shp decoder: PointZ drops Z/M, multipart polyline") {
    val pz = Shapefile.geometries(bytes("sensors.shp"))
    assert(pz.length == 15 && pz.forall(_._2.get.kind == "Point"))
    val lines = Shapefile.geometries(bytes("routes.shp"))
    assert(lines.map(_._2.get.kind) == Seq("LineString", "MultiLineString"))
  }

  test("dbf decoder: typed fields, trimming, deleted-record placeholder") {
    val (names, rows) = Shapefile.attributes(bytes("districts.dbf"))
    assert(names == Seq("NAME", "ZONE", "AREA_M2", "ACTIVE"))
    assert(rows.length == 22)
    assert(rows.head == Seq("district_000", "URBAN", "6400", "T"))
    val (_, srows) = Shapefile.attributes(bytes("sensors.dbf"))
    assert(srows(4).isEmpty && srows(5) == Seq("sensor_05", "105"))
  }

  test("prj sniff: last AUTHORITY wins; WGS84 name fallback; unknown → 0") {
    assert(Shapefile.sridOf(new String(bytes("districts.prj"), "ISO-8859-1")) == 3006)
    assert(Shapefile.sridOf(new String(bytes("sensors.prj"), "ISO-8859-1")) == 4326)
    assert(Shapefile.sridOf("""PROJCS["Local_Grid"]""") == 0)
  }

  test("read one shapefile: normalized schema, WKT, srid, properties") {
    val df = ShpSource.read(spark, s"$dir/districts.shp")
    assert(df.columns.toSet == Set("_file", "feature_id", "properties",
      "geom_type", "geometry", "srid", "xmin", "ymin", "xmax", "ymax"))
    assert(df.count() == 22)
    val row = df.filter(col("feature_id") === 1).head()
    assert(row.getAs[String]("geom_type") == "Polygon")
    assert(row.getAs[Int]("srid") == 3006)
    assert(row.getAs[Map[String, String]]("properties")("NAME") == "district_000")
    assert(row.getAs[Double]("xmax") == 400080.0)
    val nullRow = df.filter(col("feature_id") === 22).head()
    assert(nullRow.getAs[String]("geometry") == null)
  }

  test("read a directory ingests every shapefile, missing .dbf/.prj ok") {
    val df = ShpSource.read(spark, dir)
    assert(df.count() == 22 + 15 + 2)
    assert(df.select("geom_type").distinct().as[String].collect().toSet ==
      Set("Polygon", "MultiPolygon", "Point", "LineString", "MultiLineString", null))
    // routes.shp has no .dbf and no .prj: empty properties, srid 0
    val r = df.filter(col("_file").endsWith("routes.shp")).head()
    assert(r.getAs[Int]("srid") == 0 &&
      r.getAs[Map[String, String]]("properties").isEmpty)
  }
}
