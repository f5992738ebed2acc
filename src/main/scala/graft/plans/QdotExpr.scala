package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact integer dot product over two `array<long>` (quantized-vector)
  * columns — the inner loop of every PORTABLE similarity path (brute
  * ANN q22-mirror, LSH buckets q25/q47, IVF assignment q51, int8
  * serving q68, media ANN q37).
  *
  * The `aggregate(zip_with(a, b, _*_), 0L, _+_)` composition this
  * replaces materializes a boxed intermediate array and walks it
  * through interpreted lambda plumbing per row — measured at sf1.0
  * (20k vectors × 64 dims) that HOF overhead put q68 at 9.1 s and the
  * IVF assignment at 5.0 s. This expression emits one fused primitive
  * loop (same shape as [[CosineSimExpr]]).
  *
  * Semantics match the composed form on every input the engine
  * produces: equal-dim null-free long arrays, index-order summation,
  * silent wrap on overflow (callers bound |qᵢ| so products stay far
  * below 2^63 — see the overflow guards at the call sites). Mismatched
  * lengths use the shorter prefix.
  */
case class QdotExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> columns")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $dot = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $dot += $a.getLong($i) * $b.getLong($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object QdotExpr {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(QdotExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
