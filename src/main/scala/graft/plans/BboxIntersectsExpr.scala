package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Native Catalyst expression for envelope-intersects over four double
  * columns against a constant query box (SURVEY §4 custom work #1).
  *
  * `bbox_intersects(xmin, ymin, xmax, ymax)` ⟺
  * `!(xmax < qxmin || xmin > qxmax || ymax < qymin || ymin > qymax)`
  *
  * Why an Expression and not the equivalent Column formula: one fused
  * branch-free comparison in generated code (vs a 4-node Or/LessThan
  * tree), and a single named node the optimizer rule can recognize.
  * Null-intolerant: any null input → null (filter-equivalent to false).
  */
case class BboxIntersectsExpr(
    xmin: Expression, ymin: Expression, xmax: Expression, ymax: Expression,
    qxmin: Double, qymin: Double, qxmax: Double, qymax: Double)
  extends Expression {

  override def children: Seq[Expression] = Seq(xmin, ymin, xmax, ymax)
  override def dataType: DataType        = BooleanType
  override def nullable: Boolean         = children.exists(_.nullable)
  override def prettyName: String        = "bbox_intersects"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires four DOUBLE columns")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val x0 = xmin.eval(input); val y0 = ymin.eval(input)
    val x1 = xmax.eval(input); val y1 = ymax.eval(input)
    if (x0 == null || y0 == null || x1 == null || y1 == null) null
    else {
      val bx0 = x0.asInstanceOf[Double]; val by0 = y0.asInstanceOf[Double]
      val bx1 = x1.asInstanceOf[Double]; val by1 = y1.asInstanceOf[Double]
      java.lang.Boolean.valueOf(
        !(bx1 < qxmin || bx0 > qxmax || by1 < qymin || by0 > qymax))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cx0 = xmin.genCode(ctx); val cy0 = ymin.genCode(ctx)
    val cx1 = xmax.genCode(ctx); val cy1 = ymax.genCode(ctx)
    val anyNull =
      Seq(cx0, cy0, cx1, cy1).map(c => s"${c.isNull}").mkString(" || ")
    ev.copy(code =
      code"""
        ${cx0.code}
        ${cy0.code}
        ${cx1.code}
        ${cy1.code}
        boolean ${ev.isNull} = ($anyNull);
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = !(${cx1.value} < ${qxmin}D || ${cx0.value} > ${qxmax}D ||
                          ${cy1.value} < ${qymin}D || ${cy0.value} > ${qymax}D);
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(xmin = newChildren(0), ymin = newChildren(1), xmax = newChildren(2), ymax = newChildren(3))
}

object BboxIntersectsExpr {
  /** Column-facing constructor. */
  def apply(xmin: Column, ymin: Column, xmax: Column, ymax: Column,
      b: graft.geo.Geometry.BBox): Column =
    GraftColumnBridge.column(BboxIntersectsExpr(
      GraftColumnBridge.expression(xmin), GraftColumnBridge.expression(ymin),
      GraftColumnBridge.expression(xmax), GraftColumnBridge.expression(ymax),
      b.xmin, b.ymin, b.xmax, b.ymax))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BboxIntersectsExpr].getName, "bbox_intersects")
}
