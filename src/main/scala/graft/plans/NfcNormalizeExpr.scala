package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a codegen'd
  * expression — Spark ships no `normalize` function, and a pretraining
  * text-cleanup pass needs one: the same visible text arrives from the
  * web both composed ("é" U+00E9) and decomposed ("e" + U+0301), and
  * every downstream exact operator (fingerprint dedup, token counts,
  * gram sets) silently treats them as different documents until the
  * corpus is normalized to one form.
  *
  * NFC (not NFKC) on purpose: canonical composition is lossless — it
  * never conflates distinct characters (NFKC folds "①"→"1", "ﬁ"→"fi"
  * — a policy decision a pipeline should opt into separately).
  *
  * Implementation: `java.text.Normalizer` (ICU-equivalent for NFC;
  * both implement the Unicode canonical composition algorithm, so the
  * DuckDB oracle's `nfc_normalize` reproduces it byte-for-byte —
  * proven by the q104 hash gate). Already-normalized text (the common
  * case — `Normalizer.isNormalized` is a cheap scan) returns the input
  * UTF8String unchanged, no allocation.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string column")
    }

  override def nullSafeEval(v: Any): Any =
    NfcNormalizeExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.NfcNormalizeExpr.compute($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NfcNormalizeExpr {

  /** The per-row kernel (static so generated code can call it). */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(text: Column): Column =
    GraftColumnBridge.column(NfcNormalizeExpr(GraftColumnBridge.expression(text)))
}
