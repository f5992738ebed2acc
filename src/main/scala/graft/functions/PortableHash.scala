package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine reproducible hashing for the sketch/LSH operators.
  *
  * xxhash64 is the fast default inside the engine, but it exists only in
  * Spark — so any operator whose *result* must be verifiable by an
  * external SQL oracle (DuckDB) derives its hashes from md5 instead:
  * both engines implement RFC-1321 md5 of the UTF-8 bytes bit-identically,
  * and a fixed-width hex prefix parses to the same integer everywhere.
  *
  * To keep one (expensive) md5 call per value while still driving K
  * independent hash functions (MinHash), the family is the classic
  * universal-hash construction h_i(x) = (a_i·h(x) + b_i) mod 2^m
  * (Carter–Wegman; standard MinHash practice). Bit widths are chosen so
  * every intermediate fits in a signed 64-bit integer WITHOUT wrap-around,
  * because DuckDB raises on BIGINT overflow while the JVM wraps silently:
  *   base hash  h  < 2^32   (8 hex chars)
  *   multiplier a  < 2^28   (odd)
  *   offset     b  < 2^40
  *   a·h + b       < 2^60   — safe in both engines
  *   output masked to 40 bits (drops the high, mostly-monotonic bits;
  *   a plain 60-bit value would rank almost like h itself and collapse
  *   the MinHash family to one function).
  */
object PortableHash {

  /** 2^40 − 1: the affine family's output mask. */
  final val Mask40 = (1L << 40) - 1

  /** First 15 hex chars (60 bits) of md5 as a non-negative long.
    * DuckDB mirror: `('0x' || substr(md5(x),1,15))::UBIGINT::BIGINT`.
    */
  def md5Hex60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** First 8 hex chars (32 bits) of md5 as a non-negative long.
    * DuckDB mirror: `('0x' || substr(md5(x),1,8))::UBIGINT::BIGINT`.
    */
  def md5Hex32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  def md5Hex60Sql(expr: String): String =
    s"('0x' || substr(md5($expr),1,15))::UBIGINT::BIGINT"

  def md5Hex32Sql(expr: String): String =
    s"('0x' || substr(md5($expr),1,8))::UBIGINT::BIGINT"

  /** Deterministic affine-family constants (aᵢ odd < 2^28, bᵢ < 2^40) —
    * pure function of (seed, n), same xorshift as
    * [[VectorFunctions.seededPlanes]] so no java.util.Random state.
    */
  def affineConstants(seed: Long, n: Int): Seq[(Long, Long)] = {
    var s = seed
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    Seq.fill(n) {
      val a = (next() & (Mask40 >> 12)) | 1L // 28 bits, odd
      val b = next() & Mask40                // 40 bits
      (a, b)
    }
  }

  /** The i-th family member applied to a pre-computed 32-bit base hash
    * column. Pure integer Column arithmetic (codegen'd).
    */
  def affine(h: Column, ab: (Long, Long)): Column =
    (h * lit(ab._1) + lit(ab._2)).bitwiseAND(lit(Mask40))

  /** DuckDB mirror of [[affine]]. */
  def affineSql(hExpr: String, ab: (Long, Long)): String =
    s"(($hExpr * ${ab._1} + ${ab._2}) & $Mask40)"
}
