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
  * Semantics match the composed form EXACTLY, not just on the engine's
  * equal-dim null-free domain: index-order summation with silent wrap
  * on overflow (callers bound |qᵢ| so products stay far below 2^63 —
  * see the overflow guards at the call sites), and NULL for mismatched
  * lengths or any null element (`zip_with` pads the shorter side with
  * null, a null product poisons the aggregate) — so swapping the
  * implementations can never silently change a result.
  */
case class QdotExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot"
  // null even on non-null inputs (ragged lengths / null elements)
  override def nullable: Boolean = true

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
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val bad = ctx.freshName("bad")
      s"""
        int $n = $a.numElements();
        long $dot = 0L;
        boolean $bad = ($n != $b.numElements());
        for (int $i = 0; !$bad && $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
          $dot += $a.getLong($i) * $b.getLong($i);
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
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
