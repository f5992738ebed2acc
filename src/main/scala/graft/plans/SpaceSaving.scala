package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a TypedImperativeAggregate
  * (public algorithm: Metwally/Agrawal/El Abbadi, "Efficient computation
  * of frequent and top-k elements in data streams"; merge per
  * Agarwal et al., "Mergeable summaries").
  *
  * Tracks at most k (item, count, err) entries; a new item evicts the
  * current minimum and inherits its count as the overestimate bound.
  * Guarantees: est ≥ true ≥ est − err, and EVERY item whose true
  * frequency exceeds N/k is present in the summary — so the summary is
  * a provable candidate SUPERSET for any support threshold > N/k, and
  * an exact recount of the candidates yields the exact frequent set
  * (the pattern [[graft.operators.Dedup]] uses for LSH: sketch to
  * candidates, exact pass to verify).
  *
  * Scale shape (100 TB): partial aggregation shrinks every map task's
  * stream to ≤ k rows of state, the merge is associative/commutative,
  * and the shuffle carries one k-entry summary per partition instead of
  * one row per distinct item — heavy-hitter words over a trillion-token
  * corpus cost k·numPartitions rows of traffic, not |vocab|.
  *
  * The buffer (and hence eval) depends on arrival order when eviction
  * occurs; queries wanting a deterministic, oracle-checkable result
  * must recount candidates exactly (see q56) — the superset guarantee
  * is order-independent even though the summary itself is not.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SsBuffer] with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean  = false
  override def prettyName: String = "space_saving_topk"

  override def createAggregationBuffer(): SsBuffer = new SsBuffer(k)

  override def update(buf: SsBuffer, input: InternalRow): SsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: SsBuffer, b: SsBuffer): SsBuffer = { a.mergeIn(b); a }

  /** Entries sorted (est desc, err asc, item asc) — deterministic for a
    * given buffer state.
    */
  override def eval(buf: SsBuffer): Any = {
    val rows = buf.entries
      .sortBy { case (item, c, e) => (-c, e, item) }
      .map { case (item, c, e) =>
        InternalRow(UTF8String.fromString(item), c, e) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: SsBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): SsBuffer = SsBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}

/** Bounded (item → (count, err)) map with min-eviction. */
final class SsBuffer(val k: Int) {
  private val m = mutable.HashMap.empty[String, (Long, Long)]

  def add(item: String, by: Long = 1L, err0: Long = 0L): Unit = m.get(item) match {
    case Some((c, e)) => m.update(item, (c + by, e + err0))
    case None if m.size < k => m.update(item, (by, err0))
    case None =>
      // evict the minimum-count entry; ties → lexicographically LARGEST
      // item. One explicit rule, shared with mergeIn's trim (which keeps
      // the lexicographically smallest items on count ties), so replay
      // and merge are reproducible under the same ordering.
      val (minItem, (minC, _)) =
        m.minBy { case (it, (c, _)) => (c, it) }(
          Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
      m.remove(minItem)
      m.update(item, (minC + by, minC + err0))
  }

  /** Agarwal-style merge: union with count/err sums, then trim back to
    * the k largest counts (keeps the ε = 1/k overestimate bound).
    */
  def mergeIn(o: SsBuffer): Unit = {
    o.m.foreach { case (item, (c, e)) =>
      m.get(item) match {
        case Some((c0, e0)) => m.update(item, (c0 + c, e0 + e))
        case None           => m.update(item, (c, e))
      }
    }
    if (m.size > k) {
      val keep = m.toSeq.sortBy { case (it, (c, _)) => (-c, it) }.take(k)
      m.clear()
      keep.foreach { case (it, ce) => m.update(it, ce) }
    }
  }

  def entries: Seq[(String, Long, Long)] =
    m.toSeq.map { case (it, (c, e)) => (it, c, e) }

  def toBytes: Array[Byte] = {
    val items = m.toSeq
    val payload = items.map { case (it, _) =>
      it.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(8 + payload.map(_.length + 20).sum)
    bb.putInt(k); bb.putInt(items.size)
    items.zip(payload).foreach { case ((_, (c, e)), bytes) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c); bb.putLong(e) }
    bb.array()
  }
}

object SsBuffer {
  def fromBytes(bytes: Array[Byte]): SsBuffer = {
    val bb  = ByteBuffer.wrap(bytes)
    val k   = bb.getInt
    val n   = bb.getInt
    val buf = new SsBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b   = new Array[Byte](len)
      bb.get(b)
      buf.add(new String(b, StandardCharsets.UTF_8), bb.getLong, bb.getLong)
      i += 1
    }
    buf
  }

  /** Column builder: `space_saving_topk(col, k)` over a string column. */
  def spaceSavingTopK(c: Column, k: Int = 64): Column =
    GraftColumnBridge.column(
      SpaceSavingTopK(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
