package graft.geo

import org.scalatest.funsuite.AnyFunSuite

import Geometry._

class GeometrySpec extends AnyFunSuite {

  test("WKT round-trip for all six kinds") {
    val cases = Seq(
      Point((18.0649, 59.3293)),
      MultiPoint(Seq((1.0, 2.0), (3.0, 4.0))),
      LineString(Seq((0.0, 0.0), (5.0, 5.0), (10.0, 0.0))),
      MultiLineString(Seq(Seq((0.0, 0.0), (1.0, 1.0)), Seq((2.0, 2.0), (3.0, 3.0)))),
      Polygon(Seq(Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)))),
      MultiPolygon(Seq(
        Seq(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0))),
        Seq(Seq((5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 5.0)))))
    )
    for (g <- cases) {
      val wkt = toWkt(g)
      assert(fromWkt(wkt).contains(g), s"round-trip failed for $wkt")
    }
  }

  test("fromWkt rejects malformed input instead of throwing") {
    assert(fromWkt(null).isEmpty)
    assert(fromWkt("").isEmpty)
    assert(fromWkt("POINT").isEmpty)
    assert(fromWkt("POINT (abc def)").isEmpty)
    assert(fromWkt("TRIANGLE ((0 0, 1 1))").isEmpty)
  }

  test("GeoJSON geometry → Geom for nested kinds") {
    assert(fromGeoJson("""{"type":"Point","coordinates":[18.0649,59.3293]}""")
      .contains(Point((18.0649, 59.3293))))
    assert(fromGeoJson("""{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}""")
      .contains(Polygon(Seq(Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0))))))
    assert(fromGeoJson("""{"type":"MultiPolygon","coordinates":[[[[0,0],[1,0],[1,1],[0,0]]],[[[5,5],[6,5],[6,6],[5,5]]]]}""")
      .exists(_.kind == "MultiPolygon"))
    assert(fromGeoJson("""{"coordinates":[1,2]}""").isEmpty)
    assert(fromGeoJson("not json").isEmpty)
  }

  test("arcgisType mapping matches geojson_loader.py:59-66") {
    assert(arcgisType("Point") == "POINT")
    assert(arcgisType("MultiPoint") == "MULTIPOINT")
    assert(arcgisType("LineString") == "POLYLINE")
    assert(arcgisType("MultiLineString") == "POLYLINE")
    assert(arcgisType("Polygon") == "POLYGON")
    assert(arcgisType("MultiPolygon") == "POLYGON")
    assert(arcgisType("Weird") == "POLYGON")
  }

  test("point-in-polygon: inside, outside, hole") {
    val square = Polygon(Seq(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0))))
    assert(pointInPolygon((5.0, 5.0), square))
    assert(!pointInPolygon((15.0, 5.0), square))
    val withHole = Polygon(square.rings :+ Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)))
    assert(!pointInPolygon((5.0, 5.0), withHole))
    assert(pointInPolygon((2.0, 2.0), withHole))
  }

  test("clip: point and multipoint") {
    val b = BBox(0, 0, 10, 10)
    assert(clip(Point((5.0, 5.0)), b).contains(Point((5.0, 5.0))))
    assert(clip(Point((15.0, 5.0)), b).isEmpty)
    assert(clip(MultiPoint(Seq((5.0, 5.0), (15.0, 5.0))), b).contains(MultiPoint(Seq((5.0, 5.0)))))
  }

  test("clip: line crossing the box is cut at the boundary") {
    val b = BBox(0, 0, 10, 10)
    val Some(LineString(ps)) = clip(LineString(Seq((-5.0, 5.0), (15.0, 5.0))), b)
    assert(ps == Seq((0.0, 5.0), (10.0, 5.0)))
    // line fully outside
    assert(clip(LineString(Seq((20.0, 20.0), (30.0, 30.0))), b).isEmpty)
    // line exiting and re-entering → MultiLineString
    val reenter = clip(LineString(Seq((5.0, 5.0), (15.0, 5.0), (15.0, 8.0), (5.0, 8.0))), b)
    assert(reenter.exists(_.kind == "MultiLineString"))
  }

  test("clip: polygon clipped to the AOI rectangle (Sutherland–Hodgman)") {
    val b = BBox(0, 0, 10, 10)
    // square half-overlapping the box → clipped to 5..10 strip
    val Some(Polygon(Seq(ring))) =
      clip(Polygon(Seq(Seq((5.0, 5.0), (15.0, 5.0), (15.0, 8.0), (5.0, 8.0), (5.0, 5.0)))), b)
    val bb = bbox(Polygon(Seq(ring)))
    assert(bb == BBox(5.0, 5.0, 10.0, 8.0))
    assert(ring.head == ring.last) // closed
    // polygon fully inside is unchanged (modulo ring closure)
    val inner = Polygon(Seq(Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 1.0))))
    assert(clip(inner, b).map(bbox) == Some(bbox(inner)))
    // polygon fully outside vanishes
    assert(clip(Polygon(Seq(Seq((20.0, 20.0), (30.0, 20.0), (30.0, 30.0), (20.0, 20.0)))), b).isEmpty)
  }

  test("transform: registered affine pair and its inverse") {
    val p = Point((500000.0, 6500000.0))
    val t = transform(p, 3006, 3010).asInstanceOf[Point]
    assert(t.p == (350000.0, 6500000.0))
    val back = transform(t, 3010, 3006).asInstanceOf[Point]
    assert(math.abs(back.p._1 - p.p._1) < 1e-6)
    // unknown pair = identity
    assert(transform(p, 3006, 9999) == p)
    assert(transform(p, 3006, 3006) == p)
  }

  test("WGS84 range sniff (ogc_api.py:621-656)") {
    assert(looksLikeWgs84(Seq((18.06, 59.33), (-120.0, 45.0))))
    assert(!looksLikeWgs84(Seq((500000.0, 6500000.0))))
    assert(!looksLikeWgs84(Seq.empty))
  }

  // ---- true polygon-AOI clip (G1 exact semantics) ----

  private val square4 = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0))
  // concave L: the unit squares [0,4]x[0,2] ∪ [0,2]x[2,4], area 12
  private val lShape =
    Seq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0))

  test("signedArea / isConvexRing / triangulate basics") {
    assert(signedArea(square4) == 16.0)
    assert(signedArea(square4.reverse) == -16.0)
    assert(isConvexRing(square4) && !isConvexRing(lShape))
    val tris = triangulate(lShape)
    assert(tris.nonEmpty)
    val total = tris.map { case (a, b, c) =>
      math.abs(signedArea(Seq(a, b, c)))
    }.sum
    assert(math.abs(total - 12.0) < 1e-9,
      s"triangulation must cover the L-shape exactly, got area $total")
    // orientation-independent
    assert(math.abs(triangulate(lShape.reverse).map { case (a, b, c) =>
      math.abs(signedArea(Seq(a, b, c))) }.sum - 12.0) < 1e-9)
  }

  test("clipToPolygon: rectangle AOI reproduces the bbox clip exactly") {
    val b    = BBox(0, 0, 10, 10)
    val rect = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val subjects: Seq[Geom] = Seq(
      Point((5.0, 5.0)), Point((11.0, 5.0)),
      MultiPoint(Seq((1.0, 1.0), (12.0, 1.0))),
      LineString(Seq((-5.0, 5.0), (15.0, 5.0))),
      Polygon(Seq(Seq((5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0), (5.0, 5.0)))))
    subjects.foreach { g =>
      val viaBox  = clip(g, b)
      val viaPoly = clipToPolygon(g, rect)
      (viaBox, viaPoly) match {
        case (None, None) =>
        case (Some(x), Some(y)) =>
          assert(math.abs(area(x) - area(y)) < 1e-9, s"area mismatch for $g")
          // ring starting vertex may rotate between the two pipelines —
          // compare the vertex SETS (same ring up to rotation)
          def verts(g: Geom): Set[(Double, Double)] = g match {
            case Point(p)            => Set(p)
            case MultiPoint(ps)      => ps.toSet
            case LineString(ps)      => ps.toSet
            case MultiLineString(ls) => ls.flatten.toSet
            case Polygon(rs)         => rs.head.toSet
            case MultiPolygon(ps)    => ps.flatMap(_.head).toSet
          }
          assert(verts(x) == verts(y), s"vertex mismatch for $g: ${toWkt(x)} vs ${toWkt(y)}")
        case other => fail(s"bbox/polygon clip disagree on $g: $other")
      }
    }
  }

  test("clipToPolygon: convex triangle AOI (one Sutherland–Hodgman pass)") {
    val tri = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))
    // the 10-square ∩ triangle = the triangle itself, area 50
    val sq = Polygon(Seq(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0))))
    val out = clipToPolygon(sq, tri).get
    assert(math.abs(area(out) - 50.0) < 1e-9)
    // a square fully inside survives unchanged in area
    val inner = Polygon(Seq(Seq((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0))))
    assert(math.abs(area(clipToPolygon(inner, tri).get) - 4.0) < 1e-9)
    // a square fully outside vanishes
    val outer = Polygon(Seq(Seq((9.0, 9.0), (11.0, 9.0), (11.0, 11.0), (9.0, 11.0), (9.0, 9.0))))
    assert(clipToPolygon(outer, tri).isEmpty)
  }

  test("clipToPolygon: CONCAVE AOI — exact area via triangulated pieces") {
    // square ∩ L-shape = the L-shape, area 12, delivered as pieces
    val sq  = Polygon(Seq(square4))
    val out = clipToPolygon(sq, lShape).get
    assert(math.abs(area(out) - 12.0) < 1e-9, s"got area ${area(out)}")
    // the notch [2,4]x[2,4] must be EXCLUDED (a bbox clip would keep it)
    val notch = Polygon(Seq(Seq((2.5, 2.5), (3.5, 2.5), (3.5, 3.5), (2.5, 3.5), (2.5, 2.5))))
    assert(clipToPolygon(notch, lShape).isEmpty,
      "geometry in the concave notch must clip away entirely")
    // partial overlap with the notch: only the inside-the-L half survives
    val straddle = Polygon(Seq(Seq((1.0, 2.5), (3.0, 2.5), (3.0, 3.5), (1.0, 3.5), (1.0, 2.5))))
    assert(math.abs(area(clipToPolygon(straddle, lShape).get) - 1.0) < 1e-9)
    // the triangle pieces DISSOLVE along the internal cut edges: the
    // square ∩ L is one connected region, so one ring comes back, and
    // its vertex set is exactly the L's corners
    clipToPolygon(sq, lShape).get match {
      case Polygon(rings) =>
        assert(rings.head.toSet == lShape.toSet,
          s"dissolved ring must be the L-shape, got ${rings.head}")
      case other => fail(s"expected one dissolved polygon, got $other")
    }
  }

  test("dissolvePieces: splices full-edge neighbors, preserves area, skips ambiguity") {
    // two unit squares sharing an edge → one 2×1 rectangle
    val a = Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))
    val b = Seq((1.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0))
    val m = dissolvePieces(Seq(a, b))
    assert(m.length == 1 && math.abs(signedArea(m.head)) == 2.0)
    assert(m.head.toSet == Set((0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (0.0, 1.0)),
      s"collinear seam vertices must drop, got ${m.head}")
    // disjoint pieces stay separate
    val c = Seq((5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0))
    assert(dissolvePieces(Seq(a, c)).length == 2)
    // pinch-vertex-only neighbors stay separate (no shared edge)
    val d = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0))
    assert(dissolvePieces(Seq(a, d)).length == 2)
  }

  test("clipToPolygon: lines and points against a concave AOI") {
    // along y=3 the L-shape spans x ∈ [0,2] only
    val line = LineString(Seq((-1.0, 3.0), (5.0, 3.0)))
    clipToPolygon(line, lShape) match {
      case Some(LineString(ps)) =>
        assert(ps.head == ((0.0, 3.0)) && ps.last == ((2.0, 3.0)), s"got $ps")
      case other => fail(s"expected one piece, got $other")
    }
    // along y=1 it spans x ∈ [0,4]
    clipToPolygon(LineString(Seq((-1.0, 1.0), (5.0, 1.0))), lShape) match {
      case Some(LineString(ps)) =>
        assert(ps.head == ((0.0, 1.0)) && ps.last == ((4.0, 1.0)), s"got $ps")
      case other => fail(s"expected one piece, got $other")
    }
    // a diagonal exiting and re-entering around the notch yields 2 pieces
    val diag = LineString(Seq((1.0, 3.0), (3.0, 3.0), (3.0, 1.0)))
    clipToPolygon(diag, lShape) match {
      case Some(MultiLineString(ls)) => assert(ls.length == 2, s"got $ls")
      case other                     => fail(s"expected two pieces, got $other")
    }
    assert(clipToPolygon(Point((1.0, 1.0)), lShape).nonEmpty)
    assert(clipToPolygon(Point((3.0, 3.0)), lShape).isEmpty) // in the notch
    clipToPolygon(MultiPoint(Seq((1.0, 1.0), (3.0, 3.0))), lShape) match {
      case Some(MultiPoint(ps)) => assert(ps == Seq((1.0, 1.0)))
      case other                => fail(s"got $other")
    }
  }

  test("clipToPolygon: idempotent on its own output (pieces already inside)") {
    val sq  = Polygon(Seq(square4))
    val out = clipToPolygon(sq, lShape).get
    val again = clipToPolygon(out, lShape).get
    assert(math.abs(area(again) - area(out)) < 1e-9)
  }

  test("clipToAoi: MULTIPOLYGON AOIs clip against every part") {
    // two disjoint unit squares
    val aoi = prepareClipAoi(MultiPolygon(Seq(
      Seq(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0))),
      Seq(Seq((5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0), (5.0, 5.0)))))).get
    assert(clipToAoi(Point((0.5, 0.5)), aoi).nonEmpty)
    assert(clipToAoi(Point((5.5, 5.5)), aoi).nonEmpty)
    assert(clipToAoi(Point((3.0, 3.0)), aoi).isEmpty)
    // a big square overlapping both parts clips to area 1 + 1
    val big = Polygon(Seq(Seq((-1.0, -1.0), (7.0, -1.0), (7.0, 7.0), (-1.0, 7.0), (-1.0, -1.0))))
    assert(math.abs(area(clipToAoi(big, aoi).get) - 2.0) < 1e-9)
    // a line through both parts yields one piece per part
    clipToAoi(LineString(Seq((-1.0, 0.5), (7.0, 0.5))), aoi) match {
      case Some(LineString(ps)) =>
        assert(ps.head == ((0.0, 0.5)) && ps.last == ((1.0, 0.5)))
      case other => fail(s"got $other") // second part is at y=5.5, not hit
    }
    // non-areal WKT prepares to None — the UDF turns that into a LOUD
    // error instead of clipping every row to nothing
    assert(prepareClipAoi(LineString(Seq((0.0, 0.0), (1.0, 1.0)))).isEmpty)
    assert(prepareClipAoi(Point((0.0, 0.0))).isEmpty)
  }

  test("clipToAoi: AOI HOLES honored for points/lines, rejected for areal subjects") {
    // 10-square with a [4,6]² hole
    val holed = prepareClipAoi(Polygon(Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)),
      Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0))))).get
    assert(clipToAoi(Point((1.0, 1.0)), holed).nonEmpty)
    assert(clipToAoi(Point((5.0, 5.0)), holed).isEmpty,
      "a point inside the AOI's hole must clip away")
    // a line across the hole loses its middle: [0,4] and [6,10] survive
    clipToAoi(LineString(Seq((-1.0, 5.0), (11.0, 5.0))), holed) match {
      case Some(MultiLineString(Seq(a, b))) =>
        assert(a.head == ((0.0, 5.0)) && a.last == ((4.0, 5.0)), s"got $a")
        assert(b.head == ((6.0, 5.0)) && b.last == ((10.0, 5.0)), s"got $b")
      case other => fail(s"expected two pieces around the hole, got $other")
    }
    // areal subjects against a holed part: loud error, never
    // silently-filled-hole output
    val sq = Polygon(Seq(Seq((4.5, 4.5), (5.5, 4.5), (5.5, 5.5), (4.5, 5.5), (4.5, 4.5))))
    intercept[IllegalArgumentException] { clipToAoi(sq, holed) }
  }

  test("prepareAoi rejects zero-area (collinear) rings") {
    // ≥3 distinct but collinear vertices: isConvexRing is false and
    // triangulation yields nothing — accepting this ring would clip
    // every row to null (silent total data loss reported as success)
    assert(prepareAoi(Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (0.0, 0.0))).isEmpty)
    assert(prepareClipAoi(Polygon(Seq(
      Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (0.0, 0.0))))).isEmpty)
    // a real ring still prepares
    assert(prepareAoi(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0))).nonEmpty)
  }

  test("area subtracts interior rings (holes)") {
    val holed = Polygon(Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)),
      Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0))))
    assert(math.abs(area(holed) - 96.0) < 1e-9, s"got ${area(holed)}")
    val mp = MultiPolygon(Seq(
      holed.rings,
      Seq(Seq((20.0, 0.0), (21.0, 0.0), (21.0, 1.0), (20.0, 0.0)))))
    assert(math.abs(area(mp) - 96.5) < 1e-9, s"got ${area(mp)}")
  }

  test("area clamps INVALID hole-exceeds-shell input to the 0 floor") {
    // a hole larger than its shell (invalid WKT a caller may still
    // feed us): 0 is the documented floor for degenerate geometry,
    // never a negative area
    val inverted = Polygon(Seq(
      Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)),
      Seq((-5.0, -5.0), (5.0, -5.0), (5.0, 5.0), (-5.0, 5.0), (-5.0, -5.0))))
    assert(area(inverted) == 0.0, s"got ${area(inverted)}")
    // the clamp is PER POLYGON: a mis-nested MultiPolygon part must
    // not drag its valid siblings' sum below their true area
    val mixed = MultiPolygon(Seq(
      inverted.rings,
      Seq(Seq((10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0), (10.0, 10.0)))))
    assert(math.abs(area(mixed) - 4.0) < 1e-9, s"got ${area(mixed)}")
  }
}
