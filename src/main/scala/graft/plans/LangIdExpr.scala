package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused stopword-profile language ID —
  * [[graft.functions.TextFunctions.langId]] in ONE pass per row
  * instead of five `\b(stopword|...)\b` regex walks (one per language
  * profile). All five profiles tally against the same word-run scan
  * ([[TextKernels.wordRunHits]], the `\b`-faithful model shared with
  * [[QualityScoreExpr]]); the winner decision — 'und' on zero hits,
  * ties broken by priority en > de > fr > es > sv — happens inside the
  * kernel so the whole function stays a single expression evaluated
  * once per row (a struct of counts would re-evaluate per field
  * reference). The differential spec + fuzz hold kernel ≡ composed, so
  * the q18 oracle stays valid unchanged.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string column")
    }

  override def nullSafeEval(v: Any): Any =
    LangIdExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.LangIdExpr.compute($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LangIdExpr {

  import graft.functions.TextFunctions._

  private val Profiles: Array[java.util.HashSet[String]] = Array(
    TextKernels.toSet(StopwordsEn), TextKernels.toSet(StopwordsDe),
    TextKernels.toSet(StopwordsFr), TextKernels.toSet(StopwordsEs),
    TextKernels.toSet(StopwordsSv))

  private val MaxLen =
    (StopwordsEn ++ StopwordsDe ++ StopwordsFr ++ StopwordsEs ++ StopwordsSv)
      .map(_.length).max

  private val Und = UTF8String.fromString("und")
  private val Langs = Array("en", "de", "fr", "es", "sv").map(UTF8String.fromString)

  /** The fused per-row kernel (static so generated code can call it). */
  def compute(s: UTF8String): UTF8String = {
    val h = TextKernels.wordRunHits(s.toLowerCase.toString, Profiles, MaxLen)
    val Array(en, de, fr, es, sv) = h
    // exactly the composed when-chain: und on zero, >= ties to priority
    if (en == 0L && de == 0L && fr == 0L && es == 0L && sv == 0L) Und
    else if (en >= de && en >= fr && en >= es && en >= sv) Langs(0)
    else if (de >= fr && de >= es && de >= sv) Langs(1)
    else if (fr >= es && fr >= sv) Langs(2)
    else if (es >= sv) Langs(3)
    else Langs(4)
  }

  def apply(text: Column): Column =
    GraftColumnBridge.column(LangIdExpr(GraftColumnBridge.expression(text)))
}
