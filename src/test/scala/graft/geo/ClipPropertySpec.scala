package graft.geo

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import Geometry._

/** Property harness for the polygon-AOI clip: random STAR-SHAPED AOIs
  * (sorted angles, varying radii — always simple, usually concave) and
  * random axis rectangles, cross-validated against the INDEPENDENT
  * rectangle kernel: because intersection commutes,
  *
  *   area(rectPoly ∩AOI star)  ==  area(clipRing(star, BBox(rect)))
  *
  * the left side exercising prepareAoi → ear clipping → per-triangle
  * Sutherland–Hodgman, the right side the four-half-plane [[clipRing]]
  * path that predates it. Plus the algebraic invariants: the clip never
  * exceeds either operand's area, and re-clipping its own output is a
  * fixpoint.
  */
class ClipPropertySpec extends AnyFunSuite {

  private val EPS = 1e-6

  private def run(prop: Prop, n: Int = 200): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(r.passed, r.status.toString)
  }

  // star polygon: k sorted angles, per-vertex radius in [1, 5] — simple
  // by construction, concave whenever radii differ enough
  private val starGen: Gen[Seq[Pt]] = for {
    k     <- Gen.choose(4, 12)
    seeds <- Gen.listOfN(k, Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(1.0, 5.0)))
  } yield {
    val angles = seeds.map(_._1).zipWithIndex
      .map { case (u, i) => (i + u * 0.9) * 2 * math.Pi / k }
    angles.zip(seeds.map(_._2)).map { case (a, r) =>
      (r * math.cos(a), r * math.sin(a))
    }
  }

  private val rectGen: Gen[(BBox, Seq[Pt])] = for {
    x0 <- Gen.choose(-4.0, 2.0)
    y0 <- Gen.choose(-4.0, 2.0)
    w  <- Gen.choose(0.5, 6.0)
    h  <- Gen.choose(0.5, 6.0)
  } yield (BBox(x0, y0, x0 + w, y0 + h),
    Seq((x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)))

  test("rect ∩ star: triangulated polygon clip equals the rectangle kernel") {
    run(Prop.forAll(starGen, rectGen) { case (star, (bbox, rectRing)) =>
      val viaPoly = clipToPolygon(Polygon(Seq(rectRing :+ rectRing.head)), star)
        .map(area).getOrElse(0.0)
      val viaRect = math.abs(signedArea(clipRing(star, bbox)))
      math.abs(viaPoly - viaRect) < EPS
    })
  }

  test("clip area never exceeds either operand; re-clip is a fixpoint") {
    run(Prop.forAll(starGen, rectGen) { case (star, (_, rectRing)) =>
      val subject = Polygon(Seq(rectRing :+ rectRing.head))
      val out     = clipToPolygon(subject, star)
      val a       = out.map(area).getOrElse(0.0)
      val bounded = a <= area(subject) + EPS &&
        a <= math.abs(signedArea(star)) + EPS
      val fix = out.forall(g =>
        math.abs(clipToPolygon(g, star).map(area).getOrElse(0.0) - a) < EPS)
      bounded && fix
    })
  }

  test("convex AOI: direct Sutherland–Hodgman equals the sum of triangle clips") {
    val convexGen: Gen[Seq[Pt]] = for {
      k <- Gen.choose(3, 10)
      r <- Gen.choose(1.0, 5.0)
      u <- Gen.listOfN(k, Gen.choose(0.0, 1.0))
    } yield u.zipWithIndex.map { case (du, i) =>
      val a = (i + du * 0.9) * 2 * math.Pi / k
      (r * math.cos(a), r * math.sin(a))
    }
    run(Prop.forAll(convexGen, rectGen) { case (aoi, (_, rectRing)) =>
      val direct = math.abs(signedArea(clipRingToConvex(rectRing, aoi)))
      val viaTris = triangulate(aoi).map { case (t1, t2, t3) =>
        math.abs(signedArea(clipRingToConvex(rectRing, Seq(t1, t2, t3))))
      }.sum
      math.abs(direct - viaTris) < EPS
    })
  }
}
