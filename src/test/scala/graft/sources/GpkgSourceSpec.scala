package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.geo.Wkb

class GpkgSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = "src/test/resources/sample.gpkg"
  private lazy val db  = new Sqlite.Db(Files.readAllBytes(Paths.get(fixture)))

  test("sqlite walker: sqlite_master, multi-page B-tree, rowid alias") {
    val names = db.tables.map(_.name)
    assert(names.contains("parks") && names.contains("stations") &&
      names.contains("gpkg_geometry_columns"))
    val (cols, rows) = db.readTable("parks")
    assert(cols == Seq("fid", "name", "category", "area_m2", "protected", "notes", "geom"))
    assert(rows.size == 120)
    // rowid-alias INTEGER PRIMARY KEY backfilled from the rowid
    assert(rows.map { case (rowid, v) => v.head.asInstanceOf[Long] == rowid }.forall(identity))
    // typed decode: REAL and INTEGER survive as Double/Long
    val first = rows.head._2
    assert(first(3).isInstanceOf[Double] && first(4).isInstanceOf[Long])
  }

  test("sqlite walker: payload overflow chain reconstructs long text") {
    val (_, rows) = db.readTable("parks")
    val long = rows.find(_._2(1) == "park_017").get._2(5).asInstanceOf[String]
    assert(long.length == "boundary revision pending ".length * 200)
    assert(long.startsWith("boundary revision pending "))
  }

  test("gpkg blob → WKB → geometry with srid") {
    val (_, rows) = db.readTable("stations")
    val blob = rows.head._2.last.asInstanceOf[Array[Byte]]
    val Some((g, srid)) = Wkb.fromGpkgBlob(blob)
    assert(g.kind == "Point" && srid == 3006)
  }

  test("layer discovery from gpkg_geometry_columns") {
    assert(GpkgSource.layers(db).map(l => (l._1, l._3)).toSet ==
      Set(("parks", "POLYGON"), ("stations", "POINT")))
  }

  test("read one layer: normalized schema, WKT geometry, bbox columns") {
    val df = GpkgSource.read(spark, fixture, Some("parks"))
    assert(df.count() == 120)
    assert(df.columns.toSet == Set("_file", "feature_id", "properties",
      "geom_type", "geometry", "srid", "xmin", "ymin", "xmax", "ymax"))
    val row = df.filter(col("feature_id") === 1).head()
    assert(row.getAs[String]("geom_type") == "Polygon")
    assert(row.getAs[String]("geometry").startsWith("POLYGON ((400000 6500000"))
    assert(row.getAs[Int]("srid") == 3006)
    assert(row.getAs[Map[String, String]]("properties")("name") == "park_000")
    assert(row.getAs[Double]("xmax") == 400080.0)
  }

  test("read all layers unions every registered feature table") {
    val df = GpkgSource.read(spark, fixture)
    assert(df.count() == 160)
    assert(df.select("geom_type").distinct().as[String].collect().toSet ==
      Set("Polygon", "Point"))
  }
}
