package graft.geo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame-layer spatial operators (SURVEY §2.4 G1–G6).
  *
  * Scale design: every geometry row carries precomputed bbox columns
  * (xmin/ymin/xmax/ymax). The hot filter path — "does this feature touch
  * the AOI?" — is then a pure Catalyst conjunction over four doubles:
  * codegen'd, pushed into the parquet scan, prunes row groups via min/max
  * stats. The WKT-level UDFs (exact clip, transform) only run on rows
  * that survive the bbox prefilter, and the AOI itself is a literal
  * (broadcast-by-construction — one polygon, no join; geoprocess.py:63-76).
  */
object GeoFunctions {

  import Geometry._

  /** Envelope-intersects as a pure Column predicate over bbox columns
    * (G3; the REST `esriSpatialRelIntersects` semantics, rest_api.py:202-207).
    */
  def bboxIntersects(
      xmin: Column, ymin: Column, xmax: Column, ymax: Column,
      b: BBox): Column =
    !(xmax < b.xmin || xmin > b.xmax || ymax < b.ymin || ymin > b.ymax)

  // --- UDFs over WKT (exact geometry work after the bbox prefilter) ---

  // the name matters: graft.plans.GeomFilterRule recognizes this UDF in
  // filter conditions and injects the scan-pushable bbox-column guard.
  private val intersectsUdf = udf { (wkt: String, bxmin: Double, bymin: Double, bxmax: Double, bymax: Double) =>
    Geometry.fromWkt(wkt).exists(g => Geometry.intersectsBBox(g, BBox(bxmin, bymin, bxmax, bymax)))
  }.withName("st_intersects_bbox")

  private val clipUdf = udf { (wkt: String, bxmin: Double, bymin: Double, bxmax: Double, bymax: Double) =>
    Geometry.fromWkt(wkt)
      .flatMap(g => Geometry.clip(g, BBox(bxmin, bymin, bxmax, bymax)))
      .map(Geometry.toWkt)
      .orNull
  }

  // one PreparedClipAoi per distinct AOI WKT per executor JVM: the AOI
  // is a literal, so without this every row would re-parse and (for
  // concave boundaries) re-run the O(n²) ear clipping. A non-areal /
  // unparseable AOI throws — every row would otherwise silently clip
  // to nothing, and EtlPipeline.geoprocess would commit an EMPTY table
  // as "done" (total data loss reported as success).
  private val preparedAois =
    new java.util.concurrent.ConcurrentHashMap[String, Geometry.PreparedClipAoi]()

  private val clipPolyUdf = udf { (wkt: String, aoiWkt: String) =>
    val prep = preparedAois.computeIfAbsent(aoiWkt,
      w => Geometry.fromWkt(w).flatMap(Geometry.prepareClipAoi).getOrElse(
        throw new IllegalArgumentException(
          s"stClipPolygon: AOI must be POLYGON or MULTIPOLYGON WKT, got: " +
            s"${String.valueOf(w).take(80)}")))
    Option(wkt).flatMap(Geometry.fromWkt) match {
      case Some(g) => Geometry.clipToAoi(g, prep).map(Geometry.toWkt).orNull
      case _       => null
    }
  }

  private val transformUdf = udf { (wkt: String, from: Int, to: Int) =>
    Geometry.fromWkt(wkt).map(g => Geometry.toWkt(Geometry.transform(g, from, to))).orNull
  }

  private val geojsonToWktUdf = udf { (json: String) =>
    Geometry.fromGeoJson(json).map(Geometry.toWkt).orNull
  }

  private val geojsonTypeUdf = udf { (json: String) =>
    Geometry.fromGeoJson(json).map(_.kind).orNull
  }

  private val bboxStructUdf = udf { (wkt: String) =>
    Geometry.fromWkt(wkt).map { g =>
      val b = Geometry.bbox(g)
      (b.xmin, b.ymin, b.xmax, b.ymax)
    }
  }

  def stIntersectsBbox(geomWkt: Column, b: BBox): Column =
    intersectsUdf(geomWkt, lit(b.xmin), lit(b.ymin), lit(b.xmax), lit(b.ymax))

  def stClipBbox(geomWkt: Column, b: BBox): Column =
    clipUdf(geomWkt, lit(b.xmin), lit(b.ymin), lit(b.xmax), lit(b.ymax))

  /** Exact polygon-AOI clip (true G1): geometry ∩ the AOI polygon, as
    * WKT; null when nothing remains. The AOI rides as a LITERAL — one
    * polygon for the whole pipeline, broadcast by construction.
    */
  def stClipPolygon(geomWkt: Column, aoiWkt: String): Column =
    clipPolyUdf(geomWkt, lit(aoiWkt))

  private val areaUdf = udf { (wkt: String) =>
    Option(wkt).flatMap(Geometry.fromWkt).map(Geometry.area).getOrElse(0.0)
  }

  /** Planar area of a WKT geometry (0 for points and lines;
    * null/unparseable → 0). Exact shoelace arithmetic, interior rings
    * (holes) subtracted — holed polygon WKT is measured correctly, not
    * exterior-only.
    */
  def stArea(geomWkt: Column): Column = areaUdf(geomWkt)

  def stTransform(geomWkt: Column, fromSrid: Column, toSrid: Column): Column =
    transformUdf(geomWkt, fromSrid, toSrid)

  def geojsonToWkt(geojson: Column): Column = geojsonToWktUdf(geojson)
  def geojsonType(geojson: Column): Column  = geojsonTypeUdf(geojson)

  /** Add xmin/ymin/xmax/ymax columns from a WKT geometry column. Done once
    * at staging time so downstream spatial predicates are UDF-free.
    */
  def withBboxColumns(df: DataFrame, geomCol: String = "geometry"): DataFrame =
    df.withColumn("_bb", bboxStructUdf(col(geomCol)))
      .withColumn("xmin", col("_bb._1"))
      .withColumn("ymin", col("_bb._2"))
      .withColumn("xmax", col("_bb._3"))
      .withColumn("ymax", col("_bb._4"))
      .drop("_bb")

  /** G1+G2 combined, the reference's geoprocess step
    * (geoprocess.py:13-98 + pipeline.py:408-460): bbox prefilter
    * (Catalyst-only, scan-pushable) → exact clip (UDF on survivors) →
    * reproject → bbox columns refreshed in the target CRS.
    */
  def clipProject(
      df: DataFrame,
      aoi: BBox,
      targetSrid: Int,
      geomCol: String = "geometry",
      sridCol: String = "srid"): DataFrame =
    clipThenProject(df, aoi, stClipBbox(col(geomCol), aoi),
      targetSrid, geomCol, sridCol)

  // the shared geoprocess tail: envelope prefilter (Catalyst-only,
  // scan-pushable) → exact clip kernel on survivors → reproject → bbox
  // columns refreshed in the target CRS. The bbox and polygon paths
  // differ ONLY in the kernel Column.
  private def clipThenProject(
      df: DataFrame,
      envelope: BBox,
      clipKernel: Column,
      targetSrid: Int,
      geomCol: String,
      sridCol: String): DataFrame = {
    val pre = df.filter(
      bboxIntersects(col("xmin"), col("ymin"), col("xmax"), col("ymax"), envelope))
    val clipped = pre
      .withColumn(geomCol, clipKernel)
      .filter(col(geomCol).isNotNull)
    val projected = clipped
      .withColumn(geomCol, stTransform(col(geomCol), col(sridCol), lit(targetSrid)))
      .withColumn(sridCol, lit(targetSrid))
    withBboxColumns(projected.drop("xmin", "ymin", "xmax", "ymax"), geomCol)
  }

  /** [[clipProject]] with a POLYGON AOI — the reference's actual
    * geoprocess semantics (PairwiseClip against the municipality
    * boundary, geoprocess.py:63-98): the AOI's ENVELOPE drives the
    * scan-pushable bbox prefilter (Catalyst-only, row-group pruning),
    * then the exact polygon clip runs on the survivors, then reproject.
    * Same plan shape as [[clipProject]] — only the exact kernel widens
    * from rectangle to polygon.
    *
    * @param arealSubjects whether the layer may contain polygons.
    *   The polygon-clip kernel rejects holed AOI parts, so with the
    *   default (true — any real layer may carry polygons) a holed AOI
    *   is rejected HERE, at plan time, instead of throwing per row
    *   mid-job. Pass false only for a points/lines-only layer, where
    *   interior rings are honored exactly.
    */
  def clipProjectAoi(
      df: DataFrame,
      aoiWkt: String,
      targetSrid: Int,
      geomCol: String = "geometry",
      sridCol: String = "srid",
      arealSubjects: Boolean = true): DataFrame = {
    // fail at PLAN time, not per row: an AOI that is valid WKT but not
    // areal (e.g. a LINESTRING) would otherwise null every geometry
    // and commit an empty table as a successful geoprocess
    val aoiGeom = Geometry.fromWkt(aoiWkt)
      .getOrElse(throw new IllegalArgumentException(
        s"clipProjectAoi: AOI is not valid WKT: ${aoiWkt.take(80)}"))
    val prep = Geometry.prepareClipAoi(aoiGeom)
      .getOrElse(throw new IllegalArgumentException(
        s"clipProjectAoi: AOI must be a non-degenerate POLYGON or " +
          s"MULTIPOLYGON, got ${aoiGeom.kind}: ${aoiWkt.take(80)}"))
    // a holed municipality boundary is common real data; surfacing the
    // kernel's per-row rejection here keeps the "fail before any task
    // runs" contract for the default (possibly-areal) layer
    require(!arealSubjects || prep.parts.forall(_._2.isEmpty),
      "clipProjectAoi: AOI has interior rings (holes); the polygon-clip " +
        "kernel rejects holed parts for areal subjects. Dissolve the AOI " +
        "to hole-free parts, or pass arealSubjects=false for a " +
        "points/lines-only layer (holes are honored exactly there): " +
        aoiWkt.take(80))
    clipThenProject(df, Geometry.bbox(aoiGeom),
      stClipPolygon(col(geomCol), aoiWkt), targetSrid, geomCol, sridCol)
  }

  /** G4: geometry-type detection over a sample (geojson_loader.py:20-99) —
    * distinct types on a limited sample, mixed → POLYGON with the
    * reference default.
    */
  def detectGeometryType(df: DataFrame, geomTypeCol: String = "geom_type", sample: Int = 10): String = {
    val types = df.select(geomTypeCol).filter(col(geomTypeCol).isNotNull)
      .limit(sample).distinct().collect().map(_.getString(0)).toSeq
    types match {
      case Seq()    => "POLYGON"
      case Seq(one) => Geometry.arcgisType(one)
      case many =>
        val arc = many.map(Geometry.arcgisType).distinct
        if (arc.length == 1) arc.head else "POLYGON"
    }
  }
}
