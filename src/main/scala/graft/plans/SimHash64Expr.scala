package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a word array in one fused pass (Charikar,
  * "Similarity estimation techniques from rounding algorithms").
  *
  * The functions._ composition ([[graft.operators.Dedup.simhash64]])
  * nests `xxhash64(w)` under each of 64 per-bit vote expressions, so
  * every word is hashed 64 times and the votes flow through
  * higher-order-function lambda plumbing; this expression hashes each
  * word ONCE and splits its bits into a local vote array — the shape a
  * hand-written inner loop would have. Same xxhash64 seed (42) as
  * Spark's `xxhash64` function, so results are identical to the
  * composed variant (asserted in the spec).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> column")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr   = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var j = 0
        while (j < 64) {
          votes(j) += (((h >>> j) & 1L) * 2L - 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= 1L << j; j += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val s = ctx.freshName("s"); val sig = ctx.freshName("sig")
      s"""
        int[] $votes = new int[64];
        for (int $i = 0; $i < $a.numElements(); $i++) {
          if (!$a.isNullAt($i)) {
            UTF8String $s = $a.getUTF8String($i);
            long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
            for (int $j = 0; $j < 64; $j++) {
              $votes[$j] += (int) ((($h >>> $j) & 1L) * 2L - 1L);
            }
          }
        }
        long $sig = 0L;
        for (int $j = 0; $j < 64; $j++) {
          if ($votes[$j] > 0) $sig |= 1L << $j;
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64Expr {
  def apply(words: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(words)))
}
