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
}
