package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The portable hash family's whole contract is cross-engine parity:
  * these cases pin the exact integer values so any drift from the
  * DuckDB mirror (('0x'||substr(md5(x),1,N))::UBIGINT) is caught here,
  * not in the driver gate.
  */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  test("md5Hex60/32 parse the md5 hex prefix to the DuckDB-verified values") {
    val out = Seq("1", "25", "the quick").toDF("s")
      .select(PortableHash.md5Hex60(col("s")).as("h60"),
        PortableHash.md5Hex32(col("s")).as("h32"))
      .as[(Long, Long)].collect()
    // DuckDB: SELECT ('0x'||substr(md5('1'),1,15))::UBIGINT  = 886263699231969848
    assert(out(0)._1 == 886263699231969848L)
    // DuckDB: SELECT ('0x'||substr(md5('25'),1,15))::UBIGINT = 640239712717731171
    assert(out(1)._1 == 640239712717731171L)
    // 32-bit prefix of md5('1') = 0xc4ca4238
    assert(out(0)._2 == 0xc4ca4238L)
    assert(out.forall { case (h60, h32) => h60 >= 0 && h60 < (1L << 60) && h32 >= 0 && h32 < (1L << 32) })
  }

  test("affine family: deterministic, overflow-safe widths, independent ranking") {
    val ab  = PortableHash.affineConstants(7L, 64)
    val ab2 = PortableHash.affineConstants(7L, 64)
    assert(ab == ab2)
    assert(ab.forall { case (a, b) =>
      a > 0 && a % 2 == 1 && a < (1L << 28) && b >= 0 && b < (1L << 40)
    })
    // worst-case product stays below 2^63 (DuckDB raises on overflow)
    val maxH = (1L << 32) - 1
    assert(ab.forall { case (a, b) => a * maxH + b > 0 })
    // members rank values differently (the 40-bit mask breaks the
    // monotonicity a plain a*h+b would keep)
    val hs = Seq(17L, 123456789L, 4000000000L, 99999L)
    val rankings = ab.take(8).map(c =>
      hs.sortBy(h => (h * c._1 + c._2) & PortableHash.Mask40))
    assert(rankings.distinct.size > 1)
  }

  test("affine Column matches the Scala formula") {
    val ab = PortableHash.affineConstants(7L, 4)
    val hs = Seq(0L, 1L, 4294967295L)
    val got = hs.toDF("h")
      .select(PortableHash.affine(col("h"), ab(2)).as("v")).as[Long].collect()
    val want = hs.map(h => (h * ab(2)._1 + ab(2)._2) & PortableHash.Mask40)
    assert(got.toSeq == want)
  }
}
