package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** HyperLogLog distinct-count sketch as a TypedImperativeAggregate
  * (public algorithm: Flajolet et al., "HyperLogLog: the analysis of a
  * near-optimal cardinality estimation algorithm") — the constant-space
  * counterpart of [[KmvDistinct]]: m = 2^p one-byte registers vs KMV's
  * 8k bytes, the classic 100 TB cardinality workhorse.
  *
  * Oracle-exact by construction: input is a PRE-HASHED non-negative
  * 60-bit long (e.g. [[graft.functions.PortableHash.md5Hex60]]); bucket
  * = top p bits, rho = leading-zero rank of the remaining w = 60−p
  * bits. The register sum is kept as the EXACT integer
  * Σ_b 2^(w − M_b) (each term a power of two ≤ 2^w, ≤ m terms → fits a
  * long), so it is partition-order-independent; the only floating-point
  * step is one literal-for-literal multiply chain and a division, which
  * every IEEE engine reproduces bit-for-bit. Raw HLL estimator (no
  * low-range LinearCounting correction — that needs ln(), whose libm
  * bits differ across engines; callers below ~2.5·m distincts should
  * use exact counting or KMV).
  *
  * Merge = elementwise register max: associative, commutative,
  * idempotent — safe under any shuffle, retry, or partial-aggregation
  * plan.
  */
case class HllDistinct(
    child: Expression,
    p: Int = 6,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(p >= 4 && p <= 12, s"p must be in [4,12], got $p")
  private val m = 1 << p
  private val w = 60 - p // width of the rank field

  override def dataType: DataType = LongType
  override def nullable: Boolean  = false
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(regs: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h      = v.asInstanceOf[Long]
      val bucket = (h >>> w).toInt & (m - 1)
      val rest   = h & ((1L << w) - 1)
      // rho capped at w (not the textbook w+1 for rest==0): a register
      // holding w+1 would make eval's 1L << (w - reg) a NEGATIVE shift,
      // which Java masks to <<63 (corrupting the exact integer sum) while
      // the oracle's engine behaves differently. Probability 2^-54 per
      // value, but the cap keeps the cross-engine invariant unconditional;
      // the oracle CASE mirrors it.
      val rho    =
        if (rest == 0) w
        else w - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rho > regs(bucket)) regs(bucket) = rho.toByte
    }
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(regs: Array[Byte]): Any = {
    // exact integer register sum: Σ 2^(w − M_b); empty bucket → 2^w
    var s = 0L
    var i = 0
    while (i < m) { s += 1L << (w - regs(i)); i += 1 }
    // alpha_64 = 0.709 (Flajolet et al. §4); the float chain below is
    // mirrored literal-for-literal (same association) in the oracle SQL
    java.lang.Long.valueOf(math.floor(
      HllDistinct.alpha(m) * (m.toLong * m).toDouble *
        (1L << w).toDouble / s.toDouble).toLong)
  }

  override def serialize(regs: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + m)
    bb.putInt(p); bb.put(regs); bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt
    val regs = new Array[Byte](m)
    bb.get(regs)
    regs
  }

  override def withNewMutableAggBufferOffset(o: Int): HllDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
}

object HllDistinct {
  /** Flajolet bias-correction constant (exact published values for
    * m ≤ 64; the asymptotic formula above that).
    */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Column builder over a pre-hashed non-negative 60-bit long column
    * (see [[graft.functions.PortableHash.md5Hex60]]).
    */
  def hllDistinct(c: Column, p: Int = 6): Column =
    GraftColumnBridge.column(
      HllDistinct(GraftColumnBridge.expression(c), p).toAggregateExpression())

  /** The mirrored DuckDB estimator over the same pre-hashed column
    * `hvExpr`, for oracle SQL: identical bucket/rho integer arithmetic,
    * the same exact-integer register sum, and the same literal float
    * chain. `keyCols` become the GROUP BY.
    */
  def oracleSql(hvExpr: String, fromClause: String, keyCols: Seq[String], p: Int = 6): String = {
    val m    = 1 << p
    val w    = 60 - p
    val keys = keyCols.mkString(", ")
    val pow2w = 1L << w
    s"""WITH hll_b AS (SELECT $keys, $hvExpr // $pow2w AS bucket, $hvExpr % $pow2w AS rest
       | $fromClause),
       | hll_r AS (SELECT $keys, bucket,
       |   MAX(CASE WHEN rest = 0 THEN $w
       |       ELSE $w - length(format('{:b}', rest)) + 1 END) AS mr
       |   FROM hll_b GROUP BY $keys, bucket),
       | hll_s AS (SELECT $keys,
       |   CAST(SUM(1::BIGINT << ($w - mr)) AS BIGINT)
       |     + ($m - COUNT(*)) * ${pow2w}::BIGINT AS s
       |   FROM hll_r GROUP BY $keys)
       |SELECT $keys, CAST(FLOOR(${alpha(m)}::DOUBLE * ${m.toLong * m}::DOUBLE * ${pow2w}::DOUBLE
       |  / CAST(s AS DOUBLE)) AS BIGINT) AS hll_est FROM hll_s""".stripMargin
  }
}
