package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit-interleave kernel shared by the expression's interpreted and
  * generated paths (Morton / Z-order curve — public technique, Morton
  * 1966; the layout idiom behind multi-dimensional data skipping in
  * every modern lakehouse).
  */
object ZOrderKernel {
  /** Interleave the low `bits` bits of a and b: a's bit i → 2i,
    * b's bit i → 2i+1. Inputs are masked to `bits` first — see
    * [[ZValueExpr]] for why out-of-range wraps instead of failing.
    */
  def interleave(a: Long, b: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val x = a & mask; val y = b & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** Z-value (Morton curve) of two bigint columns — the multi-dimension
  * clustering key: sorting a table by `z(a, b)` makes row groups tight
  * in BOTH dimensions, so parquet min/max stats prune scans filtered on
  * either or both columns (the data-skipping layout a single-column
  * sort can only give one dimension).
  *
  * Contract: values are expected in `[0, 2^bits)`. Out-of-range values
  * WRAP (low bits kept) rather than error: the z-value is a layout key,
  * never a result — wrapping can only degrade clustering locality for
  * the offending rows, while an error would kill a 100 TB ingest for
  * one outlier. Size `bits` to the column domain (≤ 31 per dimension,
  * z fits a long).
  */
case class ZValueExpr(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint columns, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(
      ZOrderKernel.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.ZOrderKernel.interleave($a, $b, $bits);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZValueExpr {
  def apply(a: Column, b: Column, bits: Int): Column =
    GraftColumnBridge.column(ZValueExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), bits))
}
