package graft.geo

import graft.geo.Geometry._

/** WKB (ISO well-known binary) decoder for the six 2-D geometry kinds,
  * plus the GeoPackage geometry-blob envelope around it (GPKG spec §2.1.3:
  * "GP" magic, flags, srs_id, optional envelope, then standard WKB).
  * Z/M ordinates are read and dropped (2.5D sources are common in staged
  * GPKG files; the engine's geometry kernel is 2-D like the reference's
  * processing, reference gpkg_loader.py copies XY features).
  */
object Wkb {

  private final class Cursor(b: Array[Byte], var off: Int) {
    var little: Boolean = true
    def u8(): Int = { val v = b(off) & 0xff; off += 1; v }
    def u32(): Long = {
      val v =
        if (little)
          (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
            ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
        else
          ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
            ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
      off += 4
      v
    }
    def f64(): Double = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val idx = if (little) off + 7 - i else off + i
        v = (v << 8) | (b(idx) & 0xffL)
        i += 1
      }
      off += 8
      java.lang.Double.longBitsToDouble(v)
    }
  }

  /** Decode one WKB geometry starting at `off`. */
  def fromWkb(bytes: Array[Byte], off: Int = 0): Option[Geom] =
    try Some(geom(new Cursor(bytes, off)))
    catch { case _: Exception => None }

  private def geom(c: Cursor): Geom = {
    c.little = c.u8() == 1
    val raw = c.u32()
    // ISO WKB: +1000 Z, +2000 M, +3000 ZM; EWKB: flag bits 0x80000000/0x40000000
    val extraOrds =
      (if ((raw & 0x80000000L) != 0 || (raw % 10000) / 1000 == 1 || (raw % 10000) / 1000 == 3) 1 else 0) +
        (if ((raw & 0x40000000L) != 0 || (raw % 10000) / 1000 >= 2) 1 else 0)
    val kind = (raw & 0x0fffffffL) % 1000

    def pt(): Pt = {
      val x = c.f64(); val y = c.f64()
      var i = 0
      while (i < extraOrds) { c.f64(); i += 1 }
      (x, y)
    }
    def ring(): Seq[Pt]      = Seq.fill(c.u32().toInt)(pt())
    def rings(): Seq[Seq[Pt]] = Seq.fill(c.u32().toInt)(ring())

    kind match {
      case 1 => Point(pt())
      case 2 => LineString(ring())
      case 3 => Polygon(rings())
      case 4 => MultiPoint(Seq.fill(c.u32().toInt) { c.little = c.u8() == 1; c.u32(); pt() })
      case 5 => MultiLineString(Seq.fill(c.u32().toInt) { c.little = c.u8() == 1; c.u32(); ring() })
      case 6 => MultiPolygon(Seq.fill(c.u32().toInt) { c.little = c.u8() == 1; c.u32(); rings() })
      case k => throw new IllegalArgumentException(s"unsupported WKB type $k")
    }
  }

  /** GeoPackage geometry blob → (geom, srid). Layout: magic "GP",
    * version, flags (bit0 header byte order, bits1-3 envelope kind,
    * bit5 empty-geometry), int32 srs_id, envelope doubles, WKB.
    */
  def fromGpkgBlob(blob: Array[Byte]): Option[(Geom, Int)] = {
    if (blob == null || blob.length < 8 || blob(0) != 'G' || blob(1) != 'P') return None
    val flags  = blob(3) & 0xff
    if ((flags & 0x20) != 0) return None // empty-geometry flag
    val little = (flags & 1) == 1
    val srid =
      if (little)
        (blob(4) & 0xff) | ((blob(5) & 0xff) << 8) | ((blob(6) & 0xff) << 16) | ((blob(7) & 0xff) << 24)
      else
        ((blob(4) & 0xff) << 24) | ((blob(5) & 0xff) << 16) | ((blob(6) & 0xff) << 8) | (blob(7) & 0xff)
    val envBytes = ((flags >> 1) & 7) match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case _ => return None // invalid envelope indicator
    }
    fromWkb(blob, 8 + envBytes).map(g => (g, srid))
  }
}
