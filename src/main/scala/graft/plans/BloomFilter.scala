package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared double-hashing scheme for the Bloom runtime filter — the
  * build aggregate and the probe expression MUST agree bit-for-bit, so
  * both call these static mixers (also directly callable from generated
  * Java). splitmix64 finalizer (public domain, Steele et al., "Fast
  * splittable pseudorandom number generators"); k probe positions via
  * Kirsch–Mitzenmacher double hashing h1 + i·h2.
  */
object BloomHash {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def h1(v: Long): Long = mix(v)
  // forced odd so the probe stride never collapses to 0
  def h2(v: Long): Long = mix(v ^ 0xC2B2AE3D27D4EB4FL) | 1L

  /** Set the k probe bits of `v` in `bits` (numBits = bits.length·64,
    * a power of two — index is a mask, not a mod). */
  def set(bits: Array[Long], v: Long, k: Int): Unit = {
    val mask = bits.length * 64 - 1
    val a = h1(v); val b = h2(v)
    var i = 0
    while (i < k) {
      val idx = ((a + i * b) & mask).toInt
      bits(idx >>> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  /** Membership test with the same probe sequence as [[set]]. */
  def mightContain(bits: Array[Long], v: Long, k: Int): Boolean = {
    val mask = bits.length * 64 - 1
    val a = h1(v); val b = h2(v)
    var i = 0
    while (i < k) {
      val idx = ((a + i * b) & mask).toInt
      if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Bloom-filter BUILD as a TypedImperativeAggregate over a bigint key
  * column: each partition sets bits locally, merge is a bitwise OR —
  * commutative/associative/idempotent, so partial (map-side) combine
  * applies and the result is identical under any partitioning. Output
  * is the bitset as `array<bigint>` (numBits/8 bytes — a few KiB for
  * typical runtime-filter sizes, the same payload Spark's own
  * InjectRuntimeFilter ships).
  *
  * `numBits` must be a power of two (probe index is a mask).
  */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    k: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && Integer.bitCount(numBits) == 1,
    s"numBits must be a power of two >= 64, got $numBits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean  = false
  override def prettyName: String = "bloom_build"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomHash.set(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb  = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

object BloomBuildAgg {
  def apply(c: Column, numBits: Int, k: Int): Column =
    GraftColumnBridge.column(
      BloomBuildAgg(GraftColumnBridge.expression(c), numBits, k).toAggregateExpression())
}

/** Bloom-filter PROBE: `might_contain(key)` against a driver-collected
  * bitset embedded in the expression (referenced object in generated
  * code, broadcast to executors with the task closure — the filter is
  * KiB-scale by construction). One-sided: false ⇒ definitely absent
  * (safe to drop pre-shuffle), true ⇒ candidate (a later exact join
  * removes false positives). Codegen'd, so the probe runs inside the
  * scan stage's WholeStageCodegen and prunes BEFORE any exchange.
  */
case class BloomMightContain(child: Expression, bits: Array[Long], k: Int)
  extends UnaryExpression {

  require(bits.nonEmpty && Integer.bitCount(bits.length * 64) == 1,
    "bitset length must make numBits a power of two")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key column, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Boolean.valueOf(BloomHash.mightContain(bits, v.asInstanceOf[Long], k))

  // plan dumps must be run-stable: print the bitset's size and content
  // digest, not the array's JVM identity hash
  override def stringArgs: Iterator[Any] = Iterator(
    child, s"bits[${bits.length * 64}]#${java.lang.Long.toHexString(
      bits.foldLeft(1125899906842597L)((a, b) => 31 * a + b))}", k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.BloomHash.mightContain($bitsRef, $v, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(c: Column, bits: Array[Long], k: Int): Column =
    GraftColumnBridge.column(BloomMightContain(GraftColumnBridge.expression(c), bits, k))
}
