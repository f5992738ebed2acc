package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing fingerprints (Schleimer/Wilkerson/Aiken, "Winnowing:
  * local algorithms for document fingerprinting") — text → distinct
  * window minima of the char-k-gram Rabin–Karp rolling hashes, plus the
  * global minimum hash, in ONE native pass per row.
  *
  * The `functions._` composition ([[graft.functions.TextFunctions]]
  * charCodes → hashesFromCodes → winnowFromHashes) is already staged to
  * avoid the O(n³) re-evaluation trap, but still builds three arrays per
  * row through higher-order-function lambda plumbing; this expression is
  * the hand-written inner loop that shape wants (same fusion move as
  * [[SimHash64Expr]]): one codepoint scan, one O(n) rolling-hash pass
  * (exact long arithmetic — codes < 256, k ≤ 8, base 131 keep every
  * value < 2^61, identical to the composed sum-of-powers), one O(n·w)
  * minima sweep with first-occurrence dedup (array_distinct order).
  * Results are asserted equal to the composed form in the spec, so the
  * DuckDB oracle mirror of the composed form stays valid.
  *
  * Output: struct(fps array&lt;long&gt;, min_hash long) — min_hash is null
  * exactly when the text is shorter than k codepoints (no k-gram), the
  * array_min(empty)=null semantics of the composed variant.
  */
case class WinnowFpExpr(child: Expression, k: Int, window: Int)
  extends UnaryExpression {

  require(k >= 1 && window >= 1, s"k and window must be >= 1, got k=$k window=$window")

  override def dataType: DataType = WinnowFpExpr.outType
  override def prettyName: String = "winnow_fp"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string column")
    }

  override def nullSafeEval(v: Any): Any =
    WinnowFpExpr.compute(v.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.WinnowFpExpr.compute($a, $k, $window);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WinnowFpExpr {

  val outType: StructType = StructType(Seq(
    StructField("fps", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("min_hash", LongType, nullable = true)))

  private val EmptyFps = new GenericArrayData(Array.empty[Long])

  /** The fused per-row kernel (static so generated code can call it). */
  def compute(s: UTF8String, k: Int, window: Int): InternalRow = {
    val str = s.toString
    // codepoint scan — matches the composed substr(i,1)/ascii walk,
    // which counts characters (codepoints), not UTF-16 units
    val n = str.codePointCount(0, str.length)
    val nH = n - (k - 1)
    if (nH <= 0) return new GenericInternalRow(Array[Any](EmptyFps, null))
    val codes = new Array[Long](n)
    var ci  = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      codes(ci) = (cp % 256).toLong
      ci += 1
      off += Character.charCount(cp)
    }
    // O(n) rolling Rabin–Karp: hash(i) = Σ_j codes(i+j)·131^(k-1-j);
    // exact long arithmetic, so rolling == the composed power sum
    var topPow = 1L
    var i = 0
    while (i < k - 1) { topPow *= 131L; i += 1 }
    val hashes = new Array[Long](nH)
    var h = 0L
    i = 0
    while (i < k) { h = h * 131L + codes(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nH) {
      h = (h - codes(i - 1) * topPow) * 131L + codes(i + k - 1)
      hashes(i) = h
      i += 1
    }
    var minH = hashes(0)
    i = 1
    while (i < nH) { if (hashes(i) < minH) minH = hashes(i); i += 1 }
    val nW = nH - (window - 1)
    if (nW <= 0)
      return new GenericInternalRow(Array[Any](EmptyFps, java.lang.Long.valueOf(minH)))
    // distinct window minima in first-occurrence order (array_distinct)
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var p = 0
    while (p < nW) {
      var m = hashes(p)
      var j = 1
      while (j < window) { if (hashes(p + j) < m) m = hashes(p + j); j += 1 }
      seen.add(java.lang.Long.valueOf(m))
      p += 1
    }
    val out = new Array[Long](seen.size)
    val it  = seen.iterator
    var oi  = 0
    while (it.hasNext) { out(oi) = it.next(); oi += 1 }
    new GenericInternalRow(Array[Any](new GenericArrayData(out), java.lang.Long.valueOf(minH)))
  }

  /** struct(fps, min_hash) column — stage with withColumn when consuming
    * both fields.
    */
  def apply(text: Column, k: Int = 8, window: Int = 4): Column =
    GraftColumnBridge.column(WinnowFpExpr(GraftColumnBridge.expression(text), k, window))

  /** Just the fingerprint array (for explode-style consumers). */
  def fps(text: Column, k: Int = 8, window: Int = 4): Column =
    apply(text, k, window).getField("fps")
}
