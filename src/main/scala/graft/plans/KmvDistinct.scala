package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** K-Minimum-Values distinct-count sketch as a TypedImperativeAggregate
  * (the engine-level custom-aggregate surface; public algorithm:
  * Bar-Yossef et al., "Counting distinct elements in a data stream").
  *
  * Keeps the k smallest xxhash64 values of the input; estimate is
  * (k−1)/R with R the k-th minimum normalized to (0,1]. Exact below k
  * distinct values. Merge is a deterministic set-union of minima, so the
  * estimate is IDENTICAL under any partitioning — the property that
  * makes sketch aggregation safe on a 1000-executor shuffle (and
  * assertable in tests). Buffer is 8k bytes; partial aggregation
  * (map-side combine) applies like any built-in agg.
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    preHashedBits: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(
      if (preHashedBits > 0) v.asInstanceOf[Long]
      else XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = { a.mergeIn(b); a }

  override def eval(buf: KmvBuffer): Any = java.lang.Long.valueOf(
    if (preHashedBits > 0) buf.estimateInDomain(preHashedBits) else buf.estimate)

  override def serialize(buf: KmvBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

/** Sorted bounded set of the k smallest hashes (deduplicated). */
final class KmvBuffer(val k: Int) {
  // TreeSet of Long with unsigned ordering (hashes span the full range)
  private val mins = new java.util.TreeSet[java.lang.Long]((a, b) =>
    java.lang.Long.compareUnsigned(a, b))

  def add(h: Long): Unit = {
    if (mins.size < k) { mins.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, mins.last()) < 0) {
      if (mins.add(h)) mins.pollLast()
      ()
    }
  }

  def mergeIn(o: KmvBuffer): Unit = o.mins.forEach(h => add(h))

  def size: Int = mins.size

  def estimate: Long =
    if (mins.size < k) mins.size.toLong
    else {
      // R = kth minimum as fraction of the unsigned 64-bit space:
      // unsigned(x) = x + 2^64 when x < 0, else x
      val kth = mins.last().longValue()
      val d   = kth.toDouble / 1.8446744073709552e19
      val r   = math.max(if (kth < 0) d + 1.0 else d, 1e-18)
      math.round((k - 1).toDouble / r)
    }

  /** Estimate over pre-hashed non-negative values drawn from [0, 2^bits):
    * floor((k−1)/R), R = kth/2^bits. Every operation (long→double cast,
    * two IEEE divisions, floor) is bit-reproducible in external SQL
    * engines — the oracle-checkable variant (the default 64-bit path
    * keeps its historical round()).
    */
  def estimateInDomain(bits: Int): Long =
    if (mins.size < k) mins.size.toLong
    else {
      val kth = mins.last().longValue()
      val r   = kth.toDouble / math.pow(2.0, bits)
      math.floor((k - 1).toDouble / r).toLong
    }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + mins.size * 8)
    bb.putInt(k); bb.putInt(mins.size)
    mins.forEach(h => { bb.putLong(h); () })
    bb.array()
  }
}

object KmvBuffer {
  def fromBytes(bytes: Array[Byte]): KmvBuffer = {
    val bb  = ByteBuffer.wrap(bytes)
    val k   = bb.getInt
    val n   = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  /** Column builder: `kmv_distinct(col, k)`. */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    GraftColumnBridge.column(
      KmvDistinct(GraftColumnBridge.expression(c), k).toAggregateExpression())

  /** KMV over an already-hashed non-negative long column drawn from
    * [0, 2^bits) — the caller picks a hash both engines can compute
    * (e.g. [[graft.functions.PortableHash.md5Hex60]]) so the whole
    * sketch, including the estimate, is oracle-checkable bit-for-bit.
    */
  def kmvDistinctPreHashed(c: Column, k: Int, bits: Int): Column =
    GraftColumnBridge.column(
      KmvDistinct(GraftColumnBridge.expression(c), k, preHashedBits = bits)
        .toAggregateExpression())
}
