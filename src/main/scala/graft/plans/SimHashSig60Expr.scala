package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused portable 60-bit SimHash (Charikar) — the md5-family twin of
  * [[SimHash64Expr]], matching
  * [[graft.operators.Dedup.simhashSignatures60]] bit-for-bit.
  *
  * The composed form explodes the word array (row blow-up = vocabulary
  * per doc), computes `md5Hex60` per word, then shuffles 60 per-bit
  * vote partial sums per doc through a groupBy. This expression runs
  * the identical arithmetic — md5 of the UTF-8 word bytes, first 15
  * hex chars as a 60-bit base hash, ±1 vote per bit, sign → bit — as
  * one loop inside the projection: no explode, no aggregate, no
  * shuffle; the signature is born finished in the (distributed) scan
  * stage. Spec-asserted equal to the composed form, so the q24 DuckDB
  * oracle mirror stays valid.
  *
  * Null for an empty (or null) word array — the same "document
  * disappears" semantics the composed form gets from explode producing
  * no rows; callers pre-filter with a cheap `size(...) > 0` predicate
  * (NOT a post-filter on the signature, which Catalyst would push below
  * the Project and evaluate this expression twice).
  */
case class SimHashSig60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = true
  override def prettyName: String = "simhash_sig60"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> column")
    }

  override def nullSafeEval(v: Any): Any =
    SimHashSig60Expr.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
        java.lang.Long ${ev.value}Boxed = graft.plans.SimHashSig60Expr.compute($a);
        ${ev.isNull} = ${ev.value}Boxed == null;
        ${ev.value} = ${ev.isNull} ? -1L : ${ev.value}Boxed.longValue();
      """)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHashSig60Expr {

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** The fused per-row kernel (static so generated code can call it).
    * Null when no non-null word exists (mirrors explode's drop).
    */
  def compute(arr: ArrayData): java.lang.Long = {
    val n  = arr.numElements()
    val md = mdLocal.get()
    var votes: Array[Int] = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 15 hex chars of the digest = bytes 0..6 plus the high
        // nibble of byte 7 — identical to conv(substring(md5(x),1,15),16,10)
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
        if (votes == null) votes = new Array[Int](60)
        var j = 0
        while (j < 60) {
          votes(j) += (((h >>> j) & 1L) * 2L - 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    if (votes == null) null
    else {
      var sig = 0L
      var j = 0
      while (j < 60) { if (votes(j) > 0) sig |= 1L << j; j += 1 }
      java.lang.Long.valueOf(sig)
    }
  }

  def apply(words: Column): Column =
    GraftColumnBridge.column(SimHashSig60Expr(GraftColumnBridge.expression(words)))
}
