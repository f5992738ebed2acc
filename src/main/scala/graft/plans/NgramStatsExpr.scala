package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document word-n-gram statistics: total occurrences,
  * maximum multiplicity, distinct count — one native pass per row.
  *
  * This exists because the n-gram repetition signals are PER-DOCUMENT
  * facts computed from tokens that already sit in the document's own
  * row: the original [[graft.operators.Repetition.signals]] plan
  * (explode → groupBy(doc, gram) → per-doc rollup) shuffled every gram
  * of the corpus only to regroup what was row-local to begin with —
  * the top scaler in the sf1.0 report (8.7×, ~6 s) for work a map pass
  * does in one. Same fusion family as [[RepetitionStatsExpr]], which
  * fuses the fixed 1/2/3-gram profile; this one parameterizes n for
  * the `signals(docs, n)` API.
  *
  * Gram identity: tokens intern to dense ids; for n ≤ 3 with < 2^21
  * distinct tokens a gram keys as the packed-id long (exact — tokens
  * cannot contain the joiner space, so id-tuple identity ≡
  * joined-string identity); wider docs or larger n key as the id CSV
  * string — same semantics, still one pass. Tokenization matches
  * `split(trim(lower(text)), "\\s+")` exactly (see
  * [[RepetitionStatsExpr]]).
  *
  * Output: struct(n_grams, top_gram, d_grams) non-null longs; all
  * zero when the doc has fewer than n tokens (callers that must drop
  * such docs filter on [[graft.functions.TextFunctions.hasShingles]],
  * as the composed form did).
  */
case class NgramStatsExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = NgramStatsExpr.outType
  override def prettyName: String = "ngram_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string column")
    }

  override def nullSafeEval(v: Any): Any =
    NgramStatsExpr.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.NgramStatsExpr.compute($a, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NgramStatsExpr {

  val outType: StructType = StructType(
    Seq("n_grams", "top_gram", "d_grams")
      .map(StructField(_, LongType, nullable = false)))

  private val Zero = new GenericInternalRow(Array[Any](0L, 0L, 0L))

  /** The fused per-row kernel (static so generated code can call it).
    * NOTE no blank-text shortcut: `split(trim(""), "\\s+")` is `[""]`
    * — one EMPTY token — and the composed form counts its 1-gram, so
    * the kernel must too (the differential spec pins this).
    */
  def compute(s: UTF8String, k: Int): InternalRow = {
    val trimmed = s.toLowerCase.trim
    val toks = trimmed.toString.split("\\s+", -1)
    val n = toks.length
    val nG = n - (k - 1)
    if (nG <= 0) return Zero
    val idOf = new java.util.HashMap[String, Integer](Math.max(16, n * 2))
    val ids  = new Array[Int](n)
    var i = 0
    while (i < n) {
      var id = idOf.get(toks(i))
      if (id == null) {
        id = Integer.valueOf(idOf.size)
        idOf.put(toks(i), id)
      }
      ids(i) = id.intValue()
      i += 1
    }
    var top = 0
    var distinct = 0
    if (k <= 3 && idOf.size < (1 << 21)) {
      val counts = new java.util.HashMap[java.lang.Long, Integer](nG * 2)
      i = 0
      while (i < nG) {
        var key = 0L
        var j = 0
        while (j < k) { key = (key << 21) | ids(i + j); j += 1 }
        val boxed = java.lang.Long.valueOf(key)
        val c0 = counts.get(boxed)
        val c = if (c0 == null) 1 else c0.intValue() + 1
        counts.put(boxed, Integer.valueOf(c))
        if (c > top) top = c
        i += 1
      }
      distinct = counts.size
    } else {
      val counts = new java.util.HashMap[String, Integer](nG * 2)
      val sb = new java.lang.StringBuilder
      i = 0
      while (i < nG) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(',')
          sb.append(ids(i + j))
          j += 1
        }
        val key = sb.toString
        val c0 = counts.get(key)
        val c = if (c0 == null) 1 else c0.intValue() + 1
        counts.put(key, Integer.valueOf(c))
        if (c > top) top = c
        i += 1
      }
      distinct = counts.size
    }
    new GenericInternalRow(Array[Any](nG.toLong, top.toLong, distinct.toLong))
  }

  /** struct(n_grams, top_gram, d_grams) column — stage with withColumn
    * and consume several fields so CollapseProject keeps the kernel
    * evaluated once per row.
    */
  def apply(text: Column, n: Int): Column =
    GraftColumnBridge.column(NgramStatsExpr(GraftColumnBridge.expression(text), n))
}
