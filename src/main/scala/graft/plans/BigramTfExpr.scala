package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document bigram term frequencies: a PRE-STAGED token array
  * (see [[graft.functions.TextFunctions.loweredTokens]]) → the DISTINCT
  * adjacent pairs with their in-document counts, in one native pass.
  *
  * The composed form this replaces —
  * `transform(sequence(0, size-2), i -> struct(tk[i], tk[i+1]))` →
  * `explode` → `groupBy(doc_id, prev, cur).count()` — pays twice: the
  * pair generation runs through interpreted higher-order-function
  * lambda plumbing (the q54/q89 lesson: HOFs never reach codegen), and
  * the per-document count is a full hash-aggregate keyed on
  * (doc_id, prev, cur) over one row per bigram OCCURRENCE. This
  * expression is the hand-written loop that shape wants (same fusion
  * move as [[WinnowFpExpr]]): one array walk, one open-addressed count
  * map per row, so the explode that follows emits one row per DISTINCT
  * per-doc bigram with its tf already attached — the doc-keyed
  * aggregation exchange disappears from the plan entirely, and rows
  * first shuffle on token keys (corpus rollup), never on doc keys.
  *
  * Output order is first-occurrence (deterministic), entries
  * struct(prev, cur, tf). Arrays with fewer than two elements yield an
  * empty array — the `size >= 2` pre-filter in callers keeps such rows
  * out anyway. Null elements cannot occur: `split` never produces them.
  */
case class BigramTfExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BigramTfExpr.outType
  override def prettyName: String = "bigram_tf"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> column")
    }

  override def nullSafeEval(v: Any): Any =
    BigramTfExpr.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.BigramTfExpr.compute($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BigramTfExpr {

  val outType: ArrayType = ArrayType(StructType(Seq(
    StructField("prev", StringType, nullable = false),
    StructField("cur", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** The fused per-row kernel (static so generated code can call it).
    * LinkedHashMap keeps first-occurrence order, so the output is a
    * deterministic function of the token array.
    */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return Empty
    val counts = new java.util.LinkedHashMap[(UTF8String, UTF8String), Array[Long]]()
    var prev = arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = arr.getUTF8String(i)
      val key = (prev, cur)
      val slot = counts.get(key)
      // UnsafeArrayData strings point into a reused buffer — the copy
      // happens once per DISTINCT pair, at first sight, never per
      // occurrence (probe tuples compare by byte equality, so raw
      // references are fine for lookup).
      if (slot == null) counts.put((prev.clone(), cur.clone()), Array(1L))
      else slot(0) += 1L
      prev = cur
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](e.getKey._1, e.getKey._2, e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(out)
  }
}
