package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash
import graft.geo.Geometry
import graft.geo.Geometry._
import graft.streaming.SessionStream

/** Property-based checks over the pure (Spark-free) kernels: randomized
  * inputs catch the edge geometry/fold cases example tables miss, and
  * scalacheck shrinks any failure to a minimal counterexample.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$name failed: $res")
  }

  private val coord: Gen[Double] = Gen.chooseNum(-1e6, 1e6)
  private val pt: Gen[Pt] = Gen.zip(coord, coord)
  private val ring: Gen[Seq[Pt]] = Gen.chooseNum(3, 12).flatMap(Gen.listOfN(_, pt))

  test("WKT round-trips every geometry kind at full double precision") {
    val geom: Gen[Geom] = Gen.oneOf(
      pt.map(Point.apply),
      Gen.nonEmptyListOf(pt).map(ps => MultiPoint(ps)),
      Gen.chooseNum(2, 12).flatMap(Gen.listOfN(_, pt)).map(ps => LineString(ps)),
      Gen.nonEmptyListOf(Gen.chooseNum(2, 8).flatMap(Gen.listOfN(_, pt)))
        .map(ls => MultiLineString(ls)),
      Gen.nonEmptyListOf(ring).map(rs => Polygon(rs)),
      Gen.nonEmptyListOf(Gen.nonEmptyListOf(ring)).map(ps => MultiPolygon(ps)))
    check("wkt-roundtrip", Prop.forAll(geom) { g =>
      Geometry.fromWkt(Geometry.toWkt(g)).contains(g)
    })
  }

  test("clipRing: clipped points lie in the box; inside rings unchanged; disjoint rings vanish") {
    val boxGen = Gen.zip(coord, coord, Gen.chooseNum(1.0, 1e5), Gen.chooseNum(1.0, 1e5))
      .map { case (x, y, w, h) => BBox(x, y, x + w, y + h) }
    val eps = 1e-6
    check("clip-within", Prop.forAll(Gen.zip(ring, boxGen)) { case (r, b) =>
      Geometry.clipRing(r, b).forall(p =>
        p._1 >= b.xmin - eps && p._1 <= b.xmax + eps &&
        p._2 >= b.ymin - eps && p._2 <= b.ymax + eps)
    })
    check("clip-inside-identity", Prop.forAll(ring) { r =>
      val b = Geometry.bbox(Polygon(Seq(r)))
      val box = BBox(b.xmin - 1, b.ymin - 1, b.xmax + 1, b.ymax + 1)
      Geometry.clipRing(r, box) == r
    })
    check("clip-disjoint-empty", Prop.forAll(ring) { r =>
      val b = Geometry.bbox(Polygon(Seq(r)))
      // a box strictly to the right of everything
      Geometry.clipRing(r, BBox(b.xmax + 10, b.ymin, b.xmax + 20, b.ymax)).isEmpty
    })
  }

  test("pointInPolygon: centroid of a convex polygon is in; far points are out") {
    // convex polygon: distinct angles on a circle, sorted
    val convex: Gen[(Seq[Pt], Pt, Double, Pt)] = for {
      cx <- coord; cy <- coord
      radius <- Gen.chooseNum(1.0, 1e4)
      n <- Gen.chooseNum(3, 16)
      angles <- Gen.listOfN(n, Gen.chooseNum(0.0, 2 * math.Pi - 0.01))
        .map(_.distinct.sorted).suchThat(_.size >= 3)
    } yield {
      val ringPts = angles.map(a => (cx + radius * math.cos(a), cy + radius * math.sin(a)))
      val centroid = (ringPts.map(_._1).sum / ringPts.size, ringPts.map(_._2).sum / ringPts.size)
      (ringPts, (cx, cy), radius, centroid)
    }
    check("pip-convex", Prop.forAll(convex) { case (r, (cx, cy), radius, centroid) =>
      Geometry.pointInRing(centroid, r) &&
        !Geometry.pointInRing((cx + 3 * radius, cy), r)
    })
  }

  test("session fold: conservation, permutation invariance, split composition, gap law") {
    val gap = 100L
    val times = Gen.nonEmptyListOf(Gen.chooseNum(0L, 5000L))
    check("conservation", Prop.forAll(times) { ts =>
      val (closed, open) = SessionStream.advance(None, 1L, ts, gap)
      closed.map(_.n_events).sum + open.map(_.n_events).sum == ts.size.toLong
    })
    check("permutation-invariance", Prop.forAll(times) { ts =>
      SessionStream.advance(None, 1L, ts, gap) ==
        SessionStream.advance(None, 1L, scala.util.Random.shuffle(ts), gap)
    })
    // folding a sorted stream in two batches equals folding it at once —
    // the invariant the watermark guarantees for the streaming pipeline
    check("split-composition", Prop.forAll(Gen.zip(times, Gen.chooseNum(0, 100))) {
      case (ts, cut) =>
        val sorted = ts.sorted
        val k = (cut * sorted.size) / 101
        val whole = SessionStream.advance(None, 1L, sorted, gap)
        val (c1, o1) = SessionStream.advance(None, 1L, sorted.take(k), gap)
        val (c2, o2) = SessionStream.advance(o1, 1L, sorted.drop(k), gap)
        whole == ((c1 ++ c2, o2))
    })
    check("gap-law", Prop.forAll(times) { ts =>
      val (closed, open) = SessionStream.advance(None, 1L, ts, gap)
      val all = closed ++ open.toSeq
      all.forall(s => s.start_us <= s.end_us && s.n_events >= 1) &&
        all.sliding(2).forall {
          case Seq(a, b) => b.start_us - a.end_us > gap
          case _         => true
        }
    })
  }

  test("affine hash family: deterministic, bounded, odd multipliers") {
    val seedGen = Gen.chooseNum(Long.MinValue, Long.MaxValue).suchThat(_ != 0L)
    check("affine-constants", Prop.forAll(Gen.zip(seedGen, Gen.chooseNum(1, 128))) {
      case (seed, n) =>
        val cs = PortableHash.affineConstants(seed, n)
        cs == PortableHash.affineConstants(seed, n) &&
          cs.forall { case (a, b) =>
            a % 2 == 1 && a > 0 && a < (1L << 28) && b >= 0 && b <= PortableHash.Mask40
          }
    }, n = 100)
  }

  test("bloom kernel: no false negatives for any key set, any filter geometry") {
    import graft.plans.BloomHash
    val geom = for {
      words <- Gen.oneOf(1, 2, 8, 64) // 64..4096 bits
      k     <- Gen.chooseNum(1, 8)
      keys  <- Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    } yield (words, k, keys)
    check("bloom-one-sided", Prop.forAll(geom) { case (words, k, keys) =>
      val bits = new Array[Long](words)
      keys.foreach(BloomHash.set(bits, _, k))
      keys.forall(BloomHash.mightContain(bits, _, k))
    })
    // merge = OR: the union filter accepts everything either side set
    check("bloom-merge-union", Prop.forAll(geom) { case (words, k, keys) =>
      val (l, r) = keys.splitAt(keys.length / 2)
      val a = new Array[Long](words); val b = new Array[Long](words)
      l.foreach(BloomHash.set(a, _, k)); r.foreach(BloomHash.set(b, _, k))
      val merged = a.zip(b).map { case (x, y) => x | y }
      keys.forall(BloomHash.mightContain(merged, _, k))
    })
  }

  test("z-order kernel: bijective on its domain and order-preserving per axis") {
    import graft.plans.ZOrderKernel
    val bits = 12
    val inDomain = Gen.chooseNum(0L, (1L << bits) - 1)
    // bijectivity: deinterleave by reading back alternate bits
    def unzip(z: Long): (Long, Long) = {
      var a = 0L; var b = 0L
      (0 until bits).foreach { i =>
        a |= ((z >>> (2 * i)) & 1L) << i
        b |= ((z >>> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    check("z-bijective", Prop.forAll(Gen.zip(inDomain, inDomain)) { case (x, y) =>
      unzip(ZOrderKernel.interleave(x, y, bits)) == ((x, y))
    })
    // fixing one axis, z is strictly monotone in the other — the
    // property that makes min/max stats tight per dimension
    check("z-monotone-per-axis", Prop.forAll(
      Gen.zip(inDomain, inDomain, inDomain)) { case (x1, x2, y) =>
      (x1 == x2) || {
        val (lo, hi) = if (x1 < x2) (x1, x2) else (x2, x1)
        ZOrderKernel.interleave(lo, y, bits) < ZOrderKernel.interleave(hi, y, bits)
      }
    })
  }

  test("fuzz: RepetitionStatsExpr.compute equals the joined-string reference") {
    import org.apache.spark.unsafe.types.UTF8String
    // plain-Scala mirror of the composed semantics the DuckDB oracle
    // runs: lower (UTF8String, locale-free), trim 0x20 only, Java
    // regex \s+ split with limit -1, n-grams as space-JOINED strings —
    // deliberately independent of the kernel's packed-id trick
    def ref(s: String): Seq[Long] = {
      val lowered = UTF8String.fromString(s).toLowerCase.toString
      val trimmed = lowered.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      if (trimmed.isEmpty) return Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L)
      val toks = trimmed.split("\\s+", -1).toSeq
      val n  = toks.length
      def grams(k: Int): Seq[String] =
        if (n < k) Nil else toks.sliding(k).map(_.mkString(" ")).toSeq
      val g2 = grams(2); val g3 = grams(3)
      Seq(n.toLong, toks.distinct.size.toLong,
        toks.groupBy(identity).values.map(_.size).max.toLong,
        math.max(n - 1, 0).toLong, g2.distinct.size.toLong,
        math.max(n - 2, 0).toLong, g3.distinct.size.toLong)
    }
    // alphabet biased to repetition + whitespace/case/multibyte edges;
    // tiny word pool makes duplicate grams likely
    val frag = Gen.frequency(
      6 -> Gen.oneOf("a", "b", "ab", "spam", "go", "stop", "The", "THE"),
      3 -> Gen.oneOf(" ", "  ", "\t", "\n", "\r", "\f", ""),
      2 -> Gen.alphaNumStr.map(_.take(5)),
      1 -> Gen.oneOf("é", "Ü", "日本", "🙂", ""),
      1 -> Gen.oneOf(" lead", "trail ", "   "))
    val strGen = Gen.listOf(frag).map(_.mkString(" "))
    check("repetition-kernel-vs-reference", Prop.forAll(strGen) { raw =>
      // UTF8String round-trip: the kernel domain is UTF-8-representable
      // strings, and this defuses ScalaCheck's char-level shrinker
      // (which can fabricate lone surrogates) — the PiiMaskSpec lesson
      val s = UTF8String.fromString(raw).toString
      val row = graft.plans.RepetitionStatsExpr.compute(UTF8String.fromString(s))
      (0 until 7).map(row.getLong) == ref(s)
    }, n = 2000)
  }
}
