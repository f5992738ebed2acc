package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import graft.geo.{Wkb, Geometry}
import graft.geo.GeoFunctions

/** GeoPackage feature-table reader (S9/K2 — reference
  * gpkg_loader.py:24-115): staged .gpkg → normalized feature rows with
  * the SAME output schema as GeoJsonSource, so everything downstream
  * (staging, clip, reproject, publish) is format-agnostic:
  *
  *   _file string, feature_id long, properties map<string,string>,
  *   geom_type string, geometry string(WKT), srid int, xmin..ymax double.
  *
  * No JDBC driver exists in this environment, so the reader walks the
  * SQLite file format directly ([[Sqlite]]) and decodes GPKG geometry
  * blobs ([[Wkb]]).
  *
  * Scale model: `binaryFile` source distributes one task per staged
  * file; each task parses its file locally (staged GPKGs are bounded
  * download artifacts, exactly the reference's model). Wildcard paths
  * ingest a whole staging directory in parallel.
  */
object GpkgSource {

  final case class Feature(
      _file: String,
      feature_id: Long,
      properties: Map[String, String],
      geom_type: String,
      geometry: String,
      srid: Int)

  /** Feature tables registered in gpkg_geometry_columns:
    * (table, geometry column, declared type, srs_id).
    */
  def layers(db: Sqlite.Db): Seq[(String, String, String, Int)] = {
    val (names, rows) = db.readTable("gpkg_geometry_columns")
    val idx = names.map(_.toLowerCase).zipWithIndex.toMap
    rows.map { case (_, v) =>
      (String.valueOf(v(idx("table_name"))),
        String.valueOf(v(idx("column_name"))),
        String.valueOf(v(idx("geometry_type_name"))),
        v(idx("srs_id")).asInstanceOf[Long].toInt)
    }
  }

  /** Parse every feature of one layer out of raw .gpkg bytes. */
  def featuresOf(file: String, bytes: Array[Byte], table: String): Iterator[Feature] = {
    val db = new Sqlite.Db(bytes)
    val layer = layers(db).find(_._1.equalsIgnoreCase(table))
      .getOrElse(throw new NoSuchElementException(s"no GPKG layer '$table'"))
    val (names, rows) = db.readTable(table)
    val geomIdx = names.indexWhere(_.equalsIgnoreCase(layer._2))
    rows.iterator.map { case (rowid, vals) =>
      val geom = vals(geomIdx) match {
        case b: Array[Byte] => Wkb.fromGpkgBlob(b)
        case _              => None
      }
      val props = names.zip(vals).zipWithIndex.collect {
        case ((n, v), i) if i != geomIdx && v != null =>
          n -> (v match {
            case b: Array[Byte] => b.map("%02x".format(_)).mkString
            case other          => String.valueOf(other)
          })
      }.toMap
      Feature(
        _file = file,
        feature_id = rowid,
        properties = props,
        geom_type = geom.map(_._1.kind).orNull,
        geometry = geom.map(g => Geometry.toWkt(g._1)).orNull,
        srid = geom.map(_._2).getOrElse(layer._4))
    }
  }

  /** Read one layer (or every registered layer when `table` is None)
    * from each .gpkg under `path` into the normalized feature schema.
    */
  def read(spark: SparkSession, path: String, table: Option[String] = None): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    implicit val enc = Encoders.product[Feature]
    val feats = bin.as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (file, bytes) =>
        val db = new Sqlite.Db(bytes)
        val tables = table.map(Seq(_)).getOrElse(layers(db).map(_._1))
        tables.iterator.flatMap(t => featuresOf(file, bytes, t))
      }
    GeoFunctions.withBboxColumns(feats.toDF())
  }
}
