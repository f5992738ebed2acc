package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused post-NFC cleanup — the
  * `trim(regexp_replace(regexp_replace(s, ControlCharPattern, ""), "\s+", " "))`
  * tail of [[graft.functions.TextFunctions.normalizeText]] as ONE byte
  * scan with one output allocation, replacing two full regex walks and
  * their two intermediate strings per row (the sf10 point put q104's
  * per-char cost among the worst scalers, and the regex tail is most
  * of it once NFC short-circuits on already-normalized text).
  *
  * Replicated semantics, exactly, in pass order:
  *  1. strip `[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]` (note \t \n \r survive
  *     — they are whitespace, not stripped controls); a stripped
  *     control therefore JOINS the whitespace runs around it, which the
  *     fused scan reproduces by skipping controls without breaking the
  *     pending-whitespace state;
  *  2. collapse Java-`\s` runs to a single 0x20 (after step 1 the class
  *     on the wire is {space, \t, \n, \r} — \x0B and \f were stripped);
  *  3. `trim` strips 0x20 only, but post-collapse every edge run IS a
  *     single 0x20, so dropping leading/trailing pending whitespace is
  *     exact.
  * All classified bytes are ASCII; bytes ≥ 0x80 pass through verbatim,
  * so the byte scan is UTF-8-safe without decoding.
  *
  * The differential spec (CleanWsSpec) holds the kernel to the composed
  * regex chain on pinned edges, a fuzz and the corpus, so the q104
  * oracle (DuckDB `nfc_normalize` + the same two RE2 regexes + trim)
  * stays valid unchanged.
  */
case class CleanWsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "clean_ws"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string column")
    }

  override def nullSafeEval(v: Any): Any =
    CleanWsExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.CleanWsExpr.compute($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CleanWsExpr {

  def apply(text: Column): Column =
    GraftColumnBridge.column(CleanWsExpr(GraftColumnBridge.expression(text)))

  private def isStrippedControl(b: Int): Boolean =
    (b <= 0x08) || b == 0x0B || b == 0x0C || (b >= 0x0E && b <= 0x1F) || b == 0x7F

  private def isWsAfterStrip(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'

  /** The per-row kernel (static so generated code can call it). Returns
    * the input unchanged (no allocation) when it is already clean.
    */
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    // fast path: scan for anything to do (controls, non-space ws,
    // ws runs, edge spaces) before allocating
    var i = 0
    var dirty = n > 0 && (s.getByte(0) == ' ' || s.getByte(n - 1) == ' ')
    var prevSpace = false
    while (i < n && !dirty) {
      val b = s.getByte(i) & 0xFF
      if (isStrippedControl(b) || b == '\t' || b == '\n' || b == '\r' ||
        (b == ' ' && prevSpace)) dirty = true
      prevSpace = b == ' '
      i += 1
    }
    if (!dirty) return s

    val out = new Array[Byte](n)
    var w = 0
    var pendingWs = false
    i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      if (isStrippedControl(b)) () // dropped; ws-run state unaffected
      else if (isWsAfterStrip(b)) pendingWs = true
      else {
        if (pendingWs && w > 0) { out(w) = ' '; w += 1 } // leading run trims away
        out(w) = b.toByte; w += 1
        pendingWs = false
      }
      i += 1
    } // trailing pendingWs trims away
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, w))
  }
}
