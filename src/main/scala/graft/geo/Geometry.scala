package graft.geo

/** Minimal planar geometry model: WKT/GeoJSON codec, bbox, point-in-polygon,
  * Sutherland–Hodgman rectangle clip, and an affine CRS transform registry.
  *
  * The reference's geoprocessing (etl/handlers/geoprocess.py:13-98) clips
  * staged feature classes to one AOI polygon and reprojects between SWEREF99
  * zones — planar math is sufficient for parity (SURVEY §7.4). Pure Scala,
  * no Spark imports: GeoFunctions wraps these for the DataFrame layer.
  *
  * Geometry kinds mirror the reference's supported set
  * (etl/loaders/geojson_loader.py:59-66): Point, MultiPoint, LineString,
  * MultiLineString, Polygon, MultiPolygon.
  */
object Geometry {

  type Pt = (Double, Double)

  sealed trait Geom {
    def kind: String
    def points: Seq[Pt]
  }
  final case class Point(p: Pt) extends Geom {
    def kind = "Point"; def points = Seq(p)
  }
  final case class MultiPoint(ps: Seq[Pt]) extends Geom {
    def kind = "MultiPoint"; def points = ps
  }
  final case class LineString(ps: Seq[Pt]) extends Geom {
    def kind = "LineString"; def points = ps
  }
  final case class MultiLineString(lines: Seq[Seq[Pt]]) extends Geom {
    def kind = "MultiLineString"; def points = lines.flatten
  }
  /** rings.head = exterior; rest = holes (holes ignored by clip — the
    * reference's arcpy clip handles them, our parity tests don't use them).
    */
  final case class Polygon(rings: Seq[Seq[Pt]]) extends Geom {
    def kind = "Polygon"; def points = rings.flatten
  }
  final case class MultiPolygon(polys: Seq[Seq[Seq[Pt]]]) extends Geom {
    def kind = "MultiPolygon"; def points = polys.flatten.flatten
  }

  final case class BBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
    def intersects(o: BBox): Boolean =
      !(xmax < o.xmin || xmin > o.xmax || ymax < o.ymin || ymin > o.ymax)
    def contains(p: Pt): Boolean =
      p._1 >= xmin && p._1 <= xmax && p._2 >= ymin && p._2 <= ymax
  }

  def bbox(g: Geom): BBox = {
    val ps = g.points
    BBox(ps.map(_._1).min, ps.map(_._2).min, ps.map(_._1).max, ps.map(_._2).max)
  }

  // -------------------------------------------------------------------------
  // WKT codec
  // -------------------------------------------------------------------------

  private def fmt(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def ptWkt(p: Pt) = s"${fmt(p._1)} ${fmt(p._2)}"
  private def ringWkt(ps: Seq[Pt]) = ps.map(ptWkt).mkString("(", ", ", ")")

  def toWkt(g: Geom): String = g match {
    case Point(p)            => s"POINT (${ptWkt(p)})"
    case MultiPoint(ps)      => s"MULTIPOINT ${ringWkt(ps)}"
    case LineString(ps)      => s"LINESTRING ${ringWkt(ps)}"
    case MultiLineString(ls) => s"MULTILINESTRING ${ls.map(ringWkt).mkString("(", ", ", ")")}"
    case Polygon(rs)         => s"POLYGON ${rs.map(ringWkt).mkString("(", ", ", ")")}"
    case MultiPolygon(ps) =>
      s"MULTIPOLYGON ${ps.map(rs => rs.map(ringWkt).mkString("(", ", ", ")")).mkString("(", ", ", ")")}"
  }

  /** Parse WKT for the six supported kinds. Returns None on malformed
    * input (null-safe Column behavior upstream).
    */
  def fromWkt(wkt: String): Option[Geom] = {
    if (wkt == null) return None
    val s = wkt.trim
    val open = s.indexOf('(')
    if (open < 0) return None
    val kind = s.substring(0, open).trim.toUpperCase
    val body = s.substring(open)
    def parsePt(t: String): Option[Pt] = {
      val parts = t.trim.split("\\s+")
      if (parts.length < 2) None
      else
        try Some((parts(0).toDouble, parts(1).toDouble))
        catch { case _: NumberFormatException => None }
    }
    // split top-level comma-separated groups inside one set of parens
    def groups(t: String): Option[Seq[String]] = {
      val inner = t.trim
      if (!inner.startsWith("(") || !inner.endsWith(")")) return None
      val content = inner.substring(1, inner.length - 1)
      val out     = Seq.newBuilder[String]
      var depth   = 0
      val cur     = new StringBuilder
      for (c <- content) c match {
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case c => cur.append(c)
      }
      out += cur.toString
      Some(out.result().map(_.trim))
    }
    def ring(t: String): Option[Seq[Pt]] =
      groups(t).flatMap { gs =>
        val pts = gs.map(parsePt)
        if (pts.forall(_.isDefined)) Some(pts.flatten) else None
      }
    try kind match {
      case "POINT" => groups(body).flatMap(g => parsePt(g.head)).map(Point.apply)
      case "MULTIPOINT" =>
        // accepts both MULTIPOINT (1 2, 3 4) and MULTIPOINT ((1 2), (3 4))
        groups(body).flatMap { gs =>
          val pts = gs.map(g => if (g.startsWith("(")) groups(g).flatMap(x => parsePt(x.head)) else parsePt(g))
          if (pts.forall(_.isDefined)) Some(MultiPoint(pts.flatten)) else None
        }
      case "LINESTRING" => ring(body).map(LineString.apply)
      case "MULTILINESTRING" =>
        groups(body).flatMap { gs =>
          val ls = gs.map(ring)
          if (ls.forall(_.isDefined)) Some(MultiLineString(ls.flatten)) else None
        }
      case "POLYGON" =>
        groups(body).flatMap { gs =>
          val rs = gs.map(ring)
          if (rs.forall(_.isDefined)) Some(Polygon(rs.flatten)) else None
        }
      case "MULTIPOLYGON" =>
        groups(body).flatMap { gs =>
          val ps = gs.map(g => groups(g).flatMap { rs =>
            val rr = rs.map(ring)
            if (rr.forall(_.isDefined)) Some(rr.flatten) else None
          })
          if (ps.forall(_.isDefined)) Some(MultiPolygon(ps.flatten)) else None
        }
      case _ => None
    } catch { case _: Exception => None }
  }

  // -------------------------------------------------------------------------
  // GeoJSON geometry codec (reference rows carry GeoJSON dicts)
  // -------------------------------------------------------------------------

  /** GeoJSON geometry JSON → Geom. Tolerant hand parser over the nested
    * coordinate arrays (schema varies per kind, so Spark's json schema
    * inference can't type it — we keep geometry as a raw JSON string
    * column and convert here).
    */
  def fromGeoJson(json: String): Option[Geom] = {
    if (json == null) return None
    val typeRe = "\"type\"\\s*:\\s*\"(\\w+)\"".r
    val coordsIdx = json.indexOf("\"coordinates\"")
    if (coordsIdx < 0) return None
    val kind = typeRe.findFirstMatchIn(json).map(_.group(1)).getOrElse(return None)
    val colon = json.indexOf(':', coordsIdx + "\"coordinates\"".length - 1)
    val start = json.indexOf('[', colon)
    if (start < 0) return None
    var depth = 0; var end = start
    var i = start
    while (i < json.length && (depth > 0 || i == start)) {
      json(i) match {
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) end = i
        case _   =>
      }
      i += 1
    }
    val coords = json.substring(start, end + 1)

    sealed trait Nest
    case class Num(v: Double)       extends Nest
    case class Arr(items: Seq[Nest]) extends Nest
    def parseNest(s: String, pos: Int): (Nest, Int) = {
      var i = pos
      while (s(i).isWhitespace) i += 1
      if (s(i) == '[') {
        i += 1
        val items = Seq.newBuilder[Nest]
        var done  = false
        while (!done) {
          while (i < s.length && (s(i).isWhitespace || s(i) == ',')) i += 1
          if (s(i) == ']') { done = true; i += 1 }
          else { val (n, ni) = parseNest(s, i); items += n; i = ni }
        }
        (Arr(items.result()), i)
      } else {
        val st = i
        while (i < s.length && "+-0123456789.eE".indexOf(s(i)) >= 0) i += 1
        (Num(s.substring(st, i).toDouble), i)
      }
    }
    def asPt(n: Nest): Pt = n match {
      case Arr(Seq(Num(x), Num(y), _*)) => (x, y)
      case _                            => throw new IllegalArgumentException("bad point")
    }
    def asRing(n: Nest): Seq[Pt] = n match {
      case Arr(items) => items.map(asPt)
      case _          => throw new IllegalArgumentException("bad ring")
    }
    try {
      val (nest, _) = parseNest(coords, 0)
      kind match {
        case "Point"           => Some(Point(asPt(nest)))
        case "MultiPoint"      => Some(MultiPoint(asRing(nest)))
        case "LineString"      => Some(LineString(asRing(nest)))
        case "MultiLineString" => nest match {
          case Arr(ls) => Some(MultiLineString(ls.map(asRing)))
          case _       => None
        }
        case "Polygon" => nest match {
          case Arr(rs) => Some(Polygon(rs.map(asRing)))
          case _       => None
        }
        case "MultiPolygon" => nest match {
          case Arr(ps) => Some(MultiPolygon(ps.map {
            case Arr(rs) => rs.map(asRing)
            case _       => throw new IllegalArgumentException("bad poly")
          }))
          case _ => None
        }
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  /** GeoJSON type → ArcGIS geometry type (geojson_loader.py:59-66);
    * mixed sets collapse to POLYGON with the reference's default
    * (geojson_loader.py:78-90).
    */
  def arcgisType(geojsonType: String): String = geojsonType match {
    case "Point"                             => "POINT"
    case "MultiPoint"                        => "MULTIPOINT"
    case "LineString" | "MultiLineString"    => "POLYLINE"
    case "Polygon" | "MultiPolygon"          => "POLYGON"
    case _                                   => "POLYGON"
  }

  // -------------------------------------------------------------------------
  // Predicates & clip
  // -------------------------------------------------------------------------

  /** Ray-casting point-in-polygon over the exterior ring (even-odd rule);
    * boundary points count as inside for axis-aligned edges.
    */
  def pointInRing(p: Pt, ring: Seq[Pt]): Boolean = {
    val (x, y) = p
    var inside = false
    var j      = ring.length - 1
    var i      = 0
    while (i < ring.length) {
      val (xi, yi) = ring(i)
      val (xj, yj) = ring(j)
      if (((yi > y) != (yj > y)) && (x < (xj - xi) * (y - yi) / (yj - yi) + xi))
        inside = !inside
      j = i
      i += 1
    }
    inside
  }

  def pointInPolygon(p: Pt, poly: Polygon): Boolean =
    poly.rings.nonEmpty && pointInRing(p, poly.rings.head) &&
      !poly.rings.tail.exists(h => pointInRing(p, h))

  /** Does the geometry intersect the rectangle? Exact for points; bbox +
    * vertex test for lines/polygons (sufficient for the parity fixtures;
    * a full segment-intersection test is the round-2 refinement).
    */
  def intersectsBBox(g: Geom, b: BBox): Boolean = g match {
    case Point(p)       => b.contains(p)
    case MultiPoint(ps) => ps.exists(b.contains)
    case other =>
      val gb = bbox(other)
      gb.intersects(b)
  }

  /** Sutherland–Hodgman clip of a ring against a rectangle. */
  def clipRing(ring: Seq[Pt], b: BBox): Seq[Pt] = {
    type Edge = (Pt => Boolean, (Pt, Pt) => Pt)
    def inter(a: Pt, c: Pt, t: Double): Pt =
      (a._1 + (c._1 - a._1) * t, a._2 + (c._2 - a._2) * t)
    val edges: Seq[Edge] = Seq(
      (p => p._1 >= b.xmin, (a, c) => inter(a, c, (b.xmin - a._1) / (c._1 - a._1))),
      (p => p._1 <= b.xmax, (a, c) => inter(a, c, (b.xmax - a._1) / (c._1 - a._1))),
      (p => p._2 >= b.ymin, (a, c) => inter(a, c, (b.ymin - a._2) / (c._2 - a._2))),
      (p => p._2 <= b.ymax, (a, c) => inter(a, c, (b.ymax - a._2) / (c._2 - a._2)))
    )
    edges.foldLeft(ring) { case (poly, (inside, cross)) =>
      if (poly.isEmpty) poly
      else {
        val out = Seq.newBuilder[Pt]
        for (i <- poly.indices) {
          val cur  = poly(i)
          val prev = poly((i + poly.length - 1) % poly.length)
          (inside(prev), inside(cur)) match {
            case (true, true)   => out += cur
            case (true, false)  => out += cross(prev, cur)
            case (false, true)  => out += cross(prev, cur); out += cur
            case (false, false) =>
          }
        }
        out.result()
      }
    }
  }

  /** Clip a segment list (polyline) to the rectangle: splits into the
    * sub-segments inside (Cohen–Sutherland-style parametric clip).
    */
  def clipLine(ps: Seq[Pt], b: BBox): Seq[Seq[Pt]] = {
    def clipSeg(a: Pt, c: Pt): Option[(Pt, Pt)] = {
      var (t0, t1) = (0.0, 1.0)
      val (dx, dy) = (c._1 - a._1, c._2 - a._2)
      def upd(p: Double, q: Double): Boolean = {
        if (p == 0.0) q >= 0
        else {
          val r = q / p
          if (p < 0) { if (r > t1) return false; if (r > t0) t0 = r }
          else { if (r < t0) return false; if (r < t1) t1 = r }
          true
        }
      }
      if (upd(-dx, a._1 - b.xmin) && upd(dx, b.xmax - a._1) &&
        upd(-dy, a._2 - b.ymin) && upd(dy, b.ymax - a._2))
        Some(((a._1 + t0 * dx, a._2 + t0 * dy), (a._1 + t1 * dx, a._2 + t1 * dy)))
      else None
    }
    if (ps.length < 2) return Seq.empty
    val segs = ps.sliding(2).flatMap { case Seq(a, c) => clipSeg(a, c) }.toSeq
    // stitch consecutive segments that share an endpoint
    segs.foldLeft(Seq.empty[Seq[Pt]]) { (acc, seg) =>
      acc.lastOption match {
        case Some(run) if run.last == seg._1 => acc.init :+ (run :+ seg._2)
        case _                               => acc :+ Seq(seg._1, seg._2)
      }
    }
  }

  /** Rectangle clip of any geometry; None when nothing remains.
    * Mirrors PairwiseClip-with-rect-AOI semantics (geoprocess.py:63-98).
    */
  def clip(g: Geom, b: BBox): Option[Geom] = g match {
    case Point(p)       => if (b.contains(p)) Some(Point(p)) else None
    case MultiPoint(ps) =>
      val in = ps.filter(b.contains)
      if (in.isEmpty) None else Some(MultiPoint(in))
    case LineString(ps) =>
      clipLine(ps, b) match {
        case Seq()    => None
        case Seq(one) => Some(LineString(one))
        case many     => Some(MultiLineString(many))
      }
    case MultiLineString(ls) =>
      val out = ls.flatMap(clipLine(_, b))
      if (out.isEmpty) None else Some(MultiLineString(out))
    case Polygon(rings) =>
      val ext = clipRing(rings.head, b)
      if (ext.length < 3) None else Some(Polygon(Seq(closeRing(ext))))
    case MultiPolygon(polys) =>
      val out = polys.flatMap { rs =>
        val ext = clipRing(rs.head, b)
        if (ext.length < 3) None else Some(Seq(closeRing(ext)))
      }
      if (out.isEmpty) None else Some(MultiPolygon(out))
  }

  private def closeRing(ps: Seq[Pt]): Seq[Pt] =
    if (ps.nonEmpty && ps.head != ps.last) ps :+ ps.head else ps

  // -------------------------------------------------------------------------
  // Polygon-AOI clip (true G1 intersection; geoprocess.py:63-98 clips to a
  // municipality POLYGON, not its envelope — the bbox clip above is the
  // prefilter shape, this is the exact one)
  // -------------------------------------------------------------------------

  /** Shoelace signed area of a ring (positive = counter-clockwise).
    * Accepts open or closed rings.
    */
  def signedArea(ring: Seq[Pt]): Double = {
    val r = openRing(ring)
    if (r.length < 3) 0.0
    else {
      var s = 0.0
      var i = 0
      while (i < r.length) {
        val (x1, y1) = r(i)
        val (x2, y2) = r((i + 1) % r.length)
        s += x1 * y2 - x2 * y1
        i += 1
      }
      s / 2
    }
  }

  /** Planar area of a geometry: exterior rings minus interior rings
    * (holes), 0 for points and lines. Exact shoelace arithmetic on
    * every ring — holed input WKT no longer overstates (the hole's
    * |signedArea| is subtracted), and clip outputs (hole-free by
    * construction) are unchanged.
    */
  def area(g: Geom): Double = {
    // clamped per polygon: an INVALID input whose holes overlap or
    // exceed the shell would otherwise go negative, and 0 is the
    // documented floor for degenerate geometry (a mis-nested
    // MultiPolygon part must not drag down its siblings' sum either)
    def poly(rings: Seq[Seq[Pt]]): Double =
      math.max(0.0, math.abs(signedArea(rings.head)) -
        rings.tail.map(r => math.abs(signedArea(r))).sum)
    g match {
      case Polygon(rings)      => poly(rings)
      case MultiPolygon(polys) => polys.map(poly).sum
      case _                   => 0.0
    }
  }

  private def openRing(ps: Seq[Pt]): Seq[Pt] =
    if (ps.length > 1 && ps.head == ps.last) ps.init else ps

  // CCW, open, degenerate-vertex-free view of an AOI ring
  private def normalizeAoi(aoi: Seq[Pt]): Seq[Pt] = {
    val open = openRing(aoi).distinct
    if (signedArea(open) < 0) open.reverse else open
  }

  private def cross(o: Pt, a: Pt, b: Pt): Double =
    (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)

  /** Is the ring convex? (collinear runs allowed; open or closed) */
  def isConvexRing(ring: Seq[Pt]): Boolean = {
    val r = openRing(ring)
    if (r.length < 3) return false
    var sign = 0
    var i    = 0
    while (i < r.length) {
      val c = cross(r(i), r((i + 1) % r.length), r((i + 2) % r.length))
      if (c != 0.0) {
        val s = if (c > 0) 1 else -1
        if (sign == 0) sign = s
        else if (sign != s) return false
      }
      i += 1
    }
    sign != 0
  }

  /** Sutherland–Hodgman clip of a subject ring against a CONVEX AOI
    * ring (any orientation, open or closed): one half-plane pass per
    * AOI edge, exactly the [[clipRing]] recurrence with the four
    * rectangle edges generalized to the AOI's k edges.
    */
  def clipRingToConvex(subject: Seq[Pt], aoi: Seq[Pt]): Seq[Pt] = {
    val a = normalizeAoi(aoi)
    if (a.length < 3) return Seq.empty
    a.indices.foldLeft(openRing(subject)) { (poly, i) =>
      if (poly.isEmpty) poly
      else {
        val e1 = a(i)
        val e2 = a((i + 1) % a.length)
        def f(p: Pt): Double = cross(e1, e2, p) // >= 0 ⇔ inside (CCW aoi)
        val out = Seq.newBuilder[Pt]
        for (j <- poly.indices) {
          val cur  = poly(j)
          val prev = poly((j + poly.length - 1) % poly.length)
          val (fp, fc) = (f(prev), f(cur))
          def hit: Pt = {
            val t = fp / (fp - fc)
            (prev._1 + (cur._1 - prev._1) * t, prev._2 + (cur._2 - prev._2) * t)
          }
          (fp >= 0, fc >= 0) match {
            case (true, true)   => out += cur
            case (true, false)  => out += hit
            case (false, true)  => out += hit; out += cur
            case (false, false) =>
          }
        }
        out.result()
      }
    }
  }

  /** Clip a polyline to an ARBITRARY simple AOI ring: each segment is
    * split at every AOI-edge crossing and the pieces whose midpoint
    * lies inside the AOI survive — exact for concave AOIs (no convex
    * decomposition, no duplicated boundary pieces), the line analog of
    * [[clipLine]]'s parametric rectangle clip.
    */
  def clipLineToPolygon(ps: Seq[Pt], aoi: Seq[Pt]): Seq[Seq[Pt]] =
    clipLineToRings(ps, normalizeAoi(aoi), Seq.empty)

  /** [[clipLineToPolygon]] with AOI HOLES: segments are additionally
    * cut at hole-edge crossings and a piece survives only when its
    * midpoint is inside the exterior AND outside every hole — the
    * pointInPolygon semantics applied to line pieces. Rings must
    * already be normalized (CCW, open).
    */
  private def clipLineToRings(
      ps: Seq[Pt], ext: Seq[Pt], holes: Seq[Seq[Pt]]): Seq[Seq[Pt]] = {
    if (ext.length < 3 || ps.length < 2) return Seq.empty
    val rings = ext +: holes
    def segPieces(p0: Pt, p1: Pt): Seq[(Pt, Pt)] = {
      val (dx, dy) = (p1._1 - p0._1, p1._2 - p0._2)
      // segment-vs-edge crossing params on the SUBJECT segment
      val ts = Seq.newBuilder[Double]
      ts += 0.0; ts += 1.0
      rings.foreach { a =>
        var i = 0
        while (i < a.length) {
          val e1 = a(i)
          val e2 = a((i + 1) % a.length)
          val (ex, ey) = (e2._1 - e1._1, e2._2 - e1._2)
          val den = dx * ey - dy * ex
          if (den != 0.0) {
            val t = ((e1._1 - p0._1) * ey - (e1._2 - p0._2) * ex) / den
            val u = ((e1._1 - p0._1) * dy - (e1._2 - p0._2) * dx) / den
            if (t > 0 && t < 1 && u >= 0 && u <= 1) ts += t
          }
          i += 1
        }
      }
      val cuts = ts.result().distinct.sorted
      def at(t: Double): Pt = (p0._1 + dx * t, p0._2 + dy * t)
      cuts.sliding(2).collect {
        case Seq(t0, t1) if t1 > t0 && {
          val mid = at((t0 + t1) / 2)
          pointInRing(mid, ext) && !holes.exists(pointInRing(mid, _))
        } => (at(t0), at(t1))
      }.toSeq
    }
    val segs = ps.sliding(2).flatMap { case Seq(x, y) => segPieces(x, y) }.toSeq
    segs.foldLeft(Seq.empty[Seq[Pt]]) { (acc, seg) =>
      acc.lastOption match {
        case Some(run) if run.last == seg._1 => acc.init :+ (run :+ seg._2)
        case _                               => acc :+ Seq(seg._1, seg._2)
      }
    }
  }

  /** Ear-clipping triangulation of a SIMPLE ring (no holes, either
    * orientation): the public textbook algorithm (SURVEY §7.4 sanctions
    * Sutherland–Hodgman-class geometry) that turns a concave AOI into
    * convex pieces for [[clipToPolygon]]. O(n²), driver/executor-local
    * over AOI rings which are single literals — never data-sized.
    */
  def triangulate(ring: Seq[Pt]): Seq[(Pt, Pt, Pt)] = {
    val out = Seq.newBuilder[(Pt, Pt, Pt)]
    var r   = normalizeAoi(ring).toVector
    def inTri(p: Pt, a: Pt, b: Pt, c: Pt): Boolean = {
      val d1 = cross(a, b, p); val d2 = cross(b, c, p); val d3 = cross(c, a, p)
      (d1 >= 0 && d2 >= 0 && d3 >= 0) || (d1 <= 0 && d2 <= 0 && d3 <= 0)
    }
    var guard = r.length * r.length + 8
    while (r.length > 3 && guard > 0) {
      guard -= 1
      val n = r.length
      val ear = (0 until n).find { i =>
        val (p, c, nx) = (r((i + n - 1) % n), r(i), r((i + 1) % n))
        cross(p, c, nx) > 0 && // convex corner of the CCW ring
          !r.exists(v => v != p && v != c && v != nx && inTri(v, p, c, nx))
      }
      ear match {
        case Some(i) =>
          val (p, c, nx) = (r((i + n - 1) % n), r(i), r((i + 1) % n))
          if (cross(p, c, nx) != 0) out += ((p, c, nx))
          r = r.patch(i, Nil, 1)
        case None => // degenerate remainder (collinear spikes): drop a flat vertex
          val i = (0 until n).find { i =>
            cross(r((i + n - 1) % n), r(i), r((i + 1) % n)) == 0
          }.getOrElse(0)
          r = r.patch(i, Nil, 1)
      }
    }
    if (r.length == 3 && cross(r(0), r(1), r(2)) != 0) out += ((r(0), r(1), r(2)))
    out.result()
  }

  /** Dissolve a piece set (open or closed rings) by merging pairs that
    * share a FULL edge — the inverse of the triangulation cut, so the
    * per-triangle clip pieces of one connected region stitch back into
    * one ring. Pieces sharing ≥2 edges or only a pinch vertex are left
    * separate (merging them could produce a non-simple ring); collinear
    * seam vertices are dropped from merged rings. Area-preserving by
    * construction; ClipPropertySpec pins it.
    */
  def dissolvePieces(rings: Seq[Seq[Pt]]): Seq[Seq[Pt]] = {
    // CCW open rings: a shared edge then appears as (a,b) in one ring
    // and (b,a) in the other
    var pieces = rings.map(r => normalizeAoi(r)).filter(_.length >= 3).toVector
    def dropCollinear(r: Seq[Pt]): Seq[Pt] = {
      val out = r.indices.collect {
        case i if cross(r((i + r.length - 1) % r.length), r(i),
          r((i + 1) % r.length)) != 0.0 || r((i + r.length - 1) % r.length) ==
          r((i + 1) % r.length) => r(i)
      }
      out.distinct
    }
    var merged = true
    while (merged && pieces.length > 1) {
      merged = false
      val found = (for {
        i <- pieces.indices.iterator
        j <- (i + 1 until pieces.length).iterator
        ri = pieces(i); rj = pieces(j)
        shared = ri.indices.flatMap { p =>
          val (a, b) = (ri(p), ri((p + 1) % ri.length))
          rj.indices.collect {
            case q if rj(q) == b && rj((q + 1) % rj.length) == a => (p, q)
          }
        }
        if shared.length == 1 // exactly one shared edge → simple splice
      } yield (i, j, shared.head)).take(1).toSeq
      found.foreach { case (i, j, (p, q)) =>
        val (ri, rj) = (pieces(i), pieces(j))
        // splice: ri up to a (index p), then rj from the vertex after a
        // (q+2) all the way around to b (index q), then ri from b (p+1)
        val spliced = ri.take(p + 1) ++
          (1 until rj.length - 1).map(k => rj((q + 1 + k) % rj.length)) ++
          ri.drop(p + 1)
        val clean = dropCollinear(spliced)
        if (clean.length >= 3 && math.abs(signedArea(clean) -
          (signedArea(ri) + signedArea(rj))) < 1e-9 * (1 + math.abs(
            signedArea(ri) + signedArea(rj)))) {
          pieces = pieces.patch(j, Nil, 1).patch(i, Seq(clean), 1)
          merged = true
        }
      }
    }
    pieces
  }

  /** TRUE polygon-AOI clip (G1's PairwiseClip semantics): geometry ∩ a
    * SIMPLE polygon AOI. Convex AOIs run one Sutherland–Hodgman pass;
    * concave AOIs are ear-clipped into triangles, polygon subjects are
    * clipped per triangle, and the pieces are DISSOLVED back along the
    * triangulation's internal edges ([[dissolvePieces]]) — one ring per
    * connected component in the common case; pieces whose merge could
    * produce a non-simple ring stay separate as MultiPolygon parts
    * (same area/coverage either way — the documented topology trade).
    * Points classify by even-odd containment; polylines split exactly
    * at boundary crossings ([[clipLineToPolygon]]). Subject holes follow
    * the [[clip]] scope (exterior rings only). None when nothing remains.
    */
  def clipToPolygon(g: Geom, aoi: Seq[Pt]): Option[Geom] =
    prepareAoi(aoi).flatMap(clipToPolygon(g, _))

  /** AOI preprocessing hoisted out of the per-row path: normalization,
    * convexity, and (for concave rings) the O(n²) ear-clipping run ONCE
    * per AOI — the clip UDF serves millions of rows against one literal
    * municipality boundary, and a thousand-vertex concave AOI must not
    * be re-triangulated per feature. None for degenerate (<3 distinct
    * vertex) rings.
    */
  final case class PreparedAoi private[Geometry] (
      ring: Seq[Pt],
      convex: Boolean,
      triangles: Seq[(Pt, Pt, Pt)])

  def prepareAoi(aoi: Seq[Pt]): Option[PreparedAoi] = {
    val a = normalizeAoi(aoi)
    // a zero-area ring (≥3 distinct but collinear vertices) is as
    // degenerate as a 2-vertex one: isConvexRing is false, triangulate
    // yields nothing, and every row would clip to null — the silent
    // total-data-loss mode the throw-on-bad-AOI guard exists to stop.
    // None here makes stClipPolygon/clipProjectAoi raise at config time.
    if (a.length < 3 || signedArea(a) == 0.0) None
    else {
      val convex = isConvexRing(a)
      Some(PreparedAoi(a, convex,
        if (convex) Seq.empty else triangulate(a)))
    }
  }

  /** Fully-prepared clip AOI for the UDF hot path: one or more
    * (exterior, holes) parts — POLYGON or MULTIPOLYGON boundaries, with
    * interior rings honored. Holes are normalized open rings.
    */
  final case class PreparedClipAoi private[Geometry] (
      parts: Seq[(PreparedAoi, Seq[Seq[Pt]])])

  /** Prepare any AREAL WKT geometry as a clip AOI. None for points,
    * lines, and degenerate rings — callers must treat that as a
    * configuration ERROR, never as "clip everything away".
    */
  def prepareClipAoi(g: Geom): Option[PreparedClipAoi] = {
    def part(rings: Seq[Seq[Pt]]): Option[(PreparedAoi, Seq[Seq[Pt]])] =
      prepareAoi(rings.head).map { p =>
        (p, rings.tail.map(normalizeAoi).filter(_.length >= 3))
      }
    val parts = g match {
      case Polygon(rings)      => part(rings).toSeq
      case MultiPolygon(polys) => polys.flatMap(part)
      case _                   => Seq.empty
    }
    if (parts.isEmpty) None else Some(PreparedClipAoi(parts))
  }

  /** Clip against a multi-part, possibly-holed AOI ([[prepareClipAoi]]):
    * points classify by full even-odd containment (inside the exterior,
    * outside every hole, of ANY part); polylines cut at exterior AND
    * hole edges; AREAL subjects clip per part through the hole-FREE
    * [[clipToPolygon]] kernel — a holed part under an areal subject is
    * rejected loudly (polygon-minus-hole differencing is out of scope;
    * dissolve the AOI or pass hole-free parts) rather than silently
    * clipping as if the hole were filled. MultiPolygon parts are
    * disjoint by WKT contract, so per-part outputs concatenate.
    */
  def clipToAoi(g: Geom, prep: PreparedClipAoi): Option[Geom] = {
    def inAoi(p: Pt): Boolean = prep.parts.exists { case (e, hs) =>
      pointInRing(p, e.ring) && !hs.exists(pointInRing(p, _))
    }
    def lines(ps: Seq[Pt]): Seq[Seq[Pt]] =
      prep.parts.flatMap { case (e, hs) => clipLineToRings(ps, e.ring, hs) }
    def areal(rings: Seq[Seq[Pt]]): Seq[Seq[Pt]] =
      prep.parts.flatMap { case (e, hs) =>
        require(hs.isEmpty,
          "polygon clip against a holed AOI part is not supported for " +
            "areal subjects: dissolve the AOI or pass hole-free parts " +
            "(points and lines honor holes exactly)")
        clipToPolygon(Polygon(rings), e) match {
          case Some(Polygon(rs))      => Seq(rs.head)
          case Some(MultiPolygon(ps)) => ps.map(_.head)
          case _                      => Seq.empty
        }
      }
    g match {
      case Point(p)       => if (inAoi(p)) Some(Point(p)) else None
      case MultiPoint(ps) =>
        val in = ps.filter(inAoi)
        if (in.isEmpty) None else Some(MultiPoint(in))
      case LineString(ps) =>
        lines(ps) match {
          case Seq()    => None
          case Seq(one) => Some(LineString(one))
          case many     => Some(MultiLineString(many))
        }
      case MultiLineString(ls) =>
        val out = ls.flatMap(lines)
        if (out.isEmpty) None else Some(MultiLineString(out))
      case Polygon(rings) =>
        areal(rings) match {
          case Seq()    => None
          case Seq(one) => Some(Polygon(Seq(closeRing(one))))
          case many     => Some(MultiPolygon(many.map(r => Seq(closeRing(r)))))
        }
      case MultiPolygon(polys) =>
        val out = polys.flatMap(rs => areal(rs)).map(r => Seq(closeRing(r)))
        if (out.isEmpty) None else Some(MultiPolygon(out))
    }
  }

  /** [[clipToPolygon]] against a [[prepareAoi]] result (the hot-path
    * form the clip UDF uses).
    */
  def clipToPolygon(g: Geom, prep: PreparedAoi): Option[Geom] = {
    val a = prep.ring
    def clipExt(ring: Seq[Pt]): Seq[Seq[Pt]] =
      if (prep.convex) {
        val r = clipRingToConvex(ring, a)
        if (math.abs(signedArea(r)) > 0 && r.length >= 3) Seq(r) else Seq.empty
      } else dissolvePieces(prep.triangles.flatMap { case (t1, t2, t3) =>
        val r = clipRingToConvex(ring, Seq(t1, t2, t3))
        if (math.abs(signedArea(r)) > 0 && r.length >= 3) Some(r) else None
      })
    g match {
      case Point(p)       => if (pointInRing(p, a)) Some(Point(p)) else None
      case MultiPoint(ps) =>
        val in = ps.filter(pointInRing(_, a))
        if (in.isEmpty) None else Some(MultiPoint(in))
      case LineString(ps) =>
        clipLineToPolygon(ps, a) match {
          case Seq()    => None
          case Seq(one) => Some(LineString(one))
          case many     => Some(MultiLineString(many))
        }
      case MultiLineString(ls) =>
        val out = ls.flatMap(clipLineToPolygon(_, a))
        if (out.isEmpty) None else Some(MultiLineString(out))
      case Polygon(rings) =>
        clipExt(rings.head) match {
          case Seq()    => None
          case Seq(one) => Some(Polygon(Seq(closeRing(one))))
          case many     => Some(MultiPolygon(many.map(r => Seq(closeRing(r)))))
        }
      case MultiPolygon(polys) =>
        val out = polys.flatMap(rs => clipExt(rs.head)).map(r => Seq(closeRing(r)))
        if (out.isEmpty) None else Some(MultiPolygon(out))
    }
  }

  // -------------------------------------------------------------------------
  // CRS transform (planar affine registry)
  // -------------------------------------------------------------------------

  /** Affine transform (scale, offsets) between EPSG codes. The SWEREF99
    * zone pairs used by the reference (3006↔3010) differ mainly by a
    * false-easting shift at parity-test precision; identity for unknown
    * pairs, registry extensible for tests.
    */
  final case class Affine(sx: Double, sy: Double, dx: Double, dy: Double) {
    def apply(p: Pt): Pt = (p._1 * sx + dx, p._2 * sy + dy)
  }

  private val transforms = scala.collection.concurrent.TrieMap[(Int, Int), Affine]()

  def registerTransform(from: Int, to: Int, a: Affine): Unit = {
    transforms.put((from, to), a)
    transforms.put((to, from), Affine(1 / a.sx, 1 / a.sy, -a.dx / a.sx, -a.dy / a.sy))
  }

  // SWEREF99 TM (3006) → SWEREF99 12 00 (3010): approximated as a
  // central-meridian false-easting shift for the parity fixtures.
  registerTransform(3006, 3010, Affine(1, 1, -150000.0, 0.0))

  def transform(g: Geom, from: Int, to: Int): Geom = {
    if (from == to) return g
    val a = transforms.getOrElse((from, to), Affine(1, 1, 0, 0))
    def m(ps: Seq[Pt]) = ps.map(a.apply)
    g match {
      case Point(p)            => Point(a(p))
      case MultiPoint(ps)      => MultiPoint(m(ps))
      case LineString(ps)      => LineString(m(ps))
      case MultiLineString(ls) => MultiLineString(ls.map(m))
      case Polygon(rs)         => Polygon(rs.map(m))
      case MultiPolygon(ps)    => MultiPolygon(ps.map(_.map(m)))
    }
  }

  /** WGS84 coordinate-range sniff (ogc_api.py:621-656): |x|≤180 ∧ |y|≤90
    * over a sample ⇒ geographic coordinates mislabeled as projected.
    */
  def looksLikeWgs84(sample: Seq[Pt]): Boolean =
    sample.nonEmpty && sample.forall(p => math.abs(p._1) <= 180 && math.abs(p._2) <= 90)
}
