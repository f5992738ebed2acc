package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused BPE-ish token count — `regexp_count(text, BpePattern)`
  * ([[graft.functions.TextFunctions.BpePattern]]) as ONE branch-run
  * scan per row instead of a five-way regex alternation re-tried at
  * every position. q54 pairs this count with the winnow fingerprint
  * kernel, and the sf10 scale point showed the regex walk, not the
  * fingerprinting, carrying a large share of the per-char cost.
  *
  * Replicated semantics — Java regex, leftmost-first alternation over
  *   `'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+`
  * — exactly:
  *  - at each match start, an apostrophe followed by one of the seven
  *    contraction suffixes wins (branch 1); an apostrophe NOT starting
  *    a contraction falls through to the punctuation-run branch, and an
  *    apostrophe in the MIDDLE of a punctuation run never re-triggers
  *    branch 1 (matches restart only after the previous match's end);
  *  - branches 2-4 take one OPTIONAL literal space (0x20 only — not \s)
  *    before a letter / digit / other run; when the space is present
  *    the run class is decided by the character AFTER it, and a space
  *    followed by neither (another whitespace char, or end of input)
  *    falls through to the `\s+` branch;
  *  - the "other" class `[^A-Za-z0-9\s]` is evaluated per UTF-16 unit
  *    in Java; every unit of a non-ASCII codepoint is in it, and every
  *    UTF-8 byte ≥ 0x80 is too, so a byte-level scan draws identical
  *    run boundaries (runs collapse the same either way) and the match
  *    COUNT is unchanged;
  *  - Java `\s` is space/\t/\n/\x0B/\f/\r (FIXTURES.md pins the no-VT
  *    fixture contract that keeps the DuckDB/RE2 oracle divergence
  *    unreachable; the kernel itself is \x0B-faithful to Java).
  *
  * The differential spec (BpeCountSpec) holds the kernel to the
  * composed `regexp_count` form on fixtures, hand-built edges and a
  * ScalaCheck fuzz, so the q54 oracle stays valid unchanged.
  */
case class BpeCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string column")
    }

  override def nullSafeEval(v: Any): Any =
    BpeCountExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.BpeCountExpr.compute($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeCountExpr {

  def apply(text: Column): Column =
    GraftColumnBridge.column(BpeCountExpr(GraftColumnBridge.expression(text)))

  private def isLetter(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isDigit(b: Int): Boolean = b >= '0' && b <= '9'
  private def isWs(b: Int): Boolean = // Java regex \s, no UNICODE flag
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
  private def isOther(b: Int): Boolean =
    !isLetter(b) && !isDigit(b) && !isWs(b)

  /** Length of the contraction suffix after the apostrophe at `i`
    * (s t re ve m ll d — no branch is a prefix of another, so the
    * first-letter dispatch is the alternation order), or 0.
    */
  private def contractionLen(s: UTF8String, n: Int, i: Int): Int = {
    if (i + 1 >= n) return 0
    (s.getByte(i + 1): @annotation.switch) match {
      case 's' | 't' | 'm' | 'd' => 2
      case 'r' => if (i + 2 < n && s.getByte(i + 2) == 'e') 3 else 0
      case 'v' => if (i + 2 < n && s.getByte(i + 2) == 'e') 3 else 0
      case 'l' => if (i + 2 < n && s.getByte(i + 2) == 'l') 3 else 0
      case _ => 0
    }
  }

  def compute(text: UTF8String): Long = {
    val n = text.numBytes()
    var i = 0
    var count = 0L
    while (i < n) {
      val c = text.getByte(i) & 0xFF
      if (c == '\'' && contractionLen(text, n, i) > 0) {
        i += contractionLen(text, n, i)
      } else if (isLetter(c)) {
        i += 1; while (i < n && isLetter(text.getByte(i) & 0xFF)) i += 1
      } else if (isDigit(c)) {
        i += 1; while (i < n && isDigit(text.getByte(i) & 0xFF)) i += 1
      } else if (c == ' ' && i + 1 < n && isLetter(text.getByte(i + 1) & 0xFF)) {
        i += 2; while (i < n && isLetter(text.getByte(i) & 0xFF)) i += 1
      } else if (c == ' ' && i + 1 < n && isDigit(text.getByte(i + 1) & 0xFF)) {
        i += 2; while (i < n && isDigit(text.getByte(i) & 0xFF)) i += 1
      } else if (c == ' ' && i + 1 < n && isOther(text.getByte(i + 1) & 0xFF)) {
        i += 2; while (i < n && isOther(text.getByte(i) & 0xFF)) i += 1
      } else if (isWs(c)) { // incl. a space followed by whitespace/end
        i += 1; while (i < n && isWs(text.getByte(i) & 0xFF)) i += 1
      } else { // punctuation/non-ASCII run (apostrophes inside included)
        i += 1; while (i < n && isOther(text.getByte(i) & 0xFF)) i += 1
      }
      count += 1
    }
    count
  }
}
