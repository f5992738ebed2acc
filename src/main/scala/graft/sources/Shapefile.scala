package graft.sources

import graft.geo.Geometry._

/** ESRI shapefile decoder (S9/K3 — reference
  * shapefile_loader.py:56-219): the three-file format is public (ESRI
  * Shapefile Technical Description, July 1998) — a .shp geometry file,
  * a .dbf (dBase III) attribute table in record order, and an optional
  * .prj WKT CRS. The reference shells out to ArcPy to copy these; here
  * the bytes are parsed directly so staged shapefiles flow through the
  * same normalized feature schema as GeoJSON/GPKG.
  *
  * 2-D like the rest of the geo kernel: Z/M ordinates (shape types
  * 11-28) are read past and dropped; measures are trailing in each
  * record so skipping is free.
  */
object Shapefile {

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def f64(b: Array[Byte], o: Int): Double = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    java.lang.Double.longBitsToDouble(v)
  }

  /** Shoelace signed area ×2; shapefile outer rings wind clockwise
    * (negative), holes counter-clockwise (positive).
    */
  private def signedArea2(ring: Seq[Pt]): Double = {
    var a = 0.0
    var i = 0
    while (i < ring.length - 1) {
      a += ring(i)._1 * ring(i + 1)._2 - ring(i + 1)._1 * ring(i)._2
      i += 1
    }
    a
  }

  /** Shapefile polygons are a flat ring list; CW rings open a new
    * polygon, CCW rings are holes of the one before them.
    */
  private def groupRings(rings: Seq[Seq[Pt]]): Geom = {
    val polys = rings.foldLeft(Vector.empty[Vector[Seq[Pt]]]) { (acc, r) =>
      if (signedArea2(r) < 0 || acc.isEmpty) acc :+ Vector(r)
      else acc.init :+ (acc.last :+ r)
    }
    if (polys.length == 1) Polygon(polys.head) else MultiPolygon(polys)
  }

  /** Decode every record of a .shp file → (record number, geometry).
    * Record numbers are 1-based and index the .dbf rows in order.
    */
  def geometries(shp: Array[Byte]): Seq[(Int, Option[Geom])] = {
    require(shp.length >= 100 && be32(shp, 0) == 9994,
      "not a shapefile: bad magic (expected file code 9994)")
    val fileLen = be32(shp, 24) * 2 // header counts 16-bit words
    val out = Vector.newBuilder[(Int, Option[Geom])]
    var off = 100
    while (off + 8 <= math.min(fileLen, shp.length)) {
      val recNum = be32(shp, off)
      val content = off + 8
      val contentLen = be32(shp, off + 4) * 2
      val shapeType = le32(shp, content)

      def pts(o: Int, n: Int): IndexedSeq[Pt] =
        (0 until n).map(i => (f64(shp, o + 16 * i), f64(shp, o + 16 * i + 8)))

      // parts/points structure shared by polyline(3) and polygon(5):
      // bbox(32) numParts(4) numPoints(4) parts[] points[]
      def parted(): Seq[Seq[Pt]] = {
        val nParts  = le32(shp, content + 36)
        val nPoints = le32(shp, content + 40)
        val partsAt = content + 44
        val ptsAt   = partsAt + 4 * nParts
        val starts  = (0 until nParts).map(i => le32(shp, partsAt + 4 * i))
        val bounds  = starts :+ nPoints
        (0 until nParts).map(i =>
          pts(ptsAt + 16 * bounds(i), bounds(i + 1) - bounds(i)))
      }

      val geom: Option[Geom] = shapeType match {
        case 0              => None
        case 1 | 11 | 21    => Some(Point((f64(shp, content + 4), f64(shp, content + 12))))
        case 8 | 18 | 28    =>
          val n = le32(shp, content + 36)
          Some(MultiPoint(pts(content + 40, n)))
        case 3 | 13 | 23 =>
          val parts = parted()
          Some(if (parts.length == 1) LineString(parts.head) else MultiLineString(parts))
        case 5 | 15 | 25    => Some(groupRings(parted()))
        case t => throw new IllegalArgumentException(s"unsupported shape type $t")
      }
      out += ((recNum, geom))
      off = content + contentLen
    }
    out.result()
  }

  /** Decode a .dbf (dBase III) attribute table → (field names, one
    * string row per record). Values are kept as trimmed strings — the
    * normalized feature schema carries properties as
    * map<string,string>, same as the GeoJSON/GPKG readers. Deleted
    * records stay as empty placeholder rows: .shp record numbers index
    * the .dbf positionally, so dropping them would shift every later
    * attribute row onto the wrong geometry.
    */
  def attributes(dbf: Array[Byte]): (Seq[String], Seq[Seq[String]]) = {
    val nRecords   = le32(dbf, 4)
    val headerSize = le16(dbf, 8)
    val recordSize = le16(dbf, 10)
    // 32-byte field descriptors from offset 32 until the 0x0D terminator
    val fields = Iterator.from(0)
      .map(i => 32 + 32 * i)
      .takeWhile(o => o + 32 <= headerSize && dbf(o) != 0x0d)
      .map { o =>
        val name = new String(dbf.slice(o, o + 11).takeWhile(_ != 0), "ISO-8859-1")
        val len  = dbf(o + 16) & 0xff
        (name, len)
      }
      .toVector
    val rows = (0 until nRecords).map { r =>
      val base = headerSize + r * recordSize
      if (base + recordSize > dbf.length || dbf(base) == '*') Seq.empty[String]
      else {
        var o = base + 1
        fields.map { case (_, len) =>
          val v = new String(dbf, o, len, "ISO-8859-1").trim
          o += len
          v
        }
      }
    }
    (fields.map(_._1), rows)
  }

  private val EpsgRe = """"EPSG"\s*,\s*"?(\d+)""".r

  /** Sniff the EPSG code out of a .prj WKT: the LAST AUTHORITY clause
    * names the whole CRS (earlier ones belong to the datum/spheroid);
    * ESRI-style .prj files often omit AUTHORITY entirely, so fall back
    * on the WGS84 name, else 0 = unknown.
    */
  def sridOf(prj: String): Int =
    EpsgRe.findAllMatchIn(prj).toSeq.lastOption.map(_.group(1).toInt).getOrElse {
      if (prj.contains("WGS_1984") || prj.contains("WGS 84")) 4326 else 0
    }
}
