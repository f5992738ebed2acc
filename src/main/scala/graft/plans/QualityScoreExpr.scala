package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused quality score — [[graft.functions.TextFunctions.qualityScore]]
  * in ONE native pass per row instead of three regex walks (a
  * whitespace split for the token count, a `regexp_replace` sweep for
  * the punctuation count, a `\b(stopword|...)\b` `regexp_count` for the
  * stopword count). The score feeds every quality consumer (q19
  * directly; q83 curriculum and q103 budget selection through their
  * scored projections), where the regex chain IS the per-row cost the
  * sf1.0 report shows scaling linearly.
  *
  * Replicated semantics, exactly:
  *  - chars  = codepoint count of the raw text;
  *  - punct  = characters in the ASCII punctuation class
  *    `[!-/:-@[-`{-~]` (four codepoint ranges — a range check, not a
  *    regex);
  *  - tokens = `split(trim(text), "\s+")` element count under limit
  *    −1: trim strips 0x20 only; a leading/trailing NON-space
  *    whitespace run yields an empty first/last element that COUNTS
  *    (the composed form counts it, so the kernel must);
  *  - stops  = `\b(en-stopword)\b` matches over `lower(text)`: the
  *    lowercase pass is the real UTF8String.toLowerCase (Unicode
  *    mappings can create new ASCII letters), then maximal WORD runs
  *    compare against the stopword set. The word class is Java `\b`'s,
  *    which is NOT ASCII `\w`: `java.util.regex` defines the boundary
  *    via `'_' || Character.isLetterOrDigit` even without
  *    UNICODE_CHARACTER_CLASS (found by the fuzz: "thatË" has no
  *    boundary after "that", so `\bthat\b` does not match). Run
  *    identity ≡ `\b`-bounded match under that class; non-ASCII runs
  *    simply never equal an ASCII stopword;
  *  - the percent/penalty arithmetic keeps the composed form's
  *    `floor(100.0 · a / b)` double division (IEEE-correctly-rounded
  *    on exact ints — bit-identical in DuckDB, the q19 oracle
  *    contract).
  *
  * The differential spec asserts kernel ≡ composed on fixtures, edge
  * corpora and a ScalaCheck fuzz (the PiiMaskExpr pattern), so the
  * existing q19/q103 oracles stay valid unchanged.
  */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "quality_score"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string column")
    }

  override def nullSafeEval(v: Any): Any =
    QualityScoreExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.QualityScoreExpr.compute($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object QualityScoreExpr {

  /** TextFunctions.StopwordsEn as a set; all ≤ 4 chars, ASCII lower. */
  private val Stopwords: Array[java.util.HashSet[String]] =
    Array(TextKernels.toSet(graft.functions.TextFunctions.StopwordsEn))

  private def isPunct(cp: Int): Boolean =
    (cp >= 0x21 && cp <= 0x2F) || (cp >= 0x3A && cp <= 0x40) ||
      (cp >= 0x5B && cp <= 0x60) || (cp >= 0x7B && cp <= 0x7E)

  /** The fused per-row kernel (static so generated code can call it). */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    // pass 1 (raw text): codepoint count, punct count, token count
    var chars = 0L
    var punct = 0L
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      chars += 1
      if (isPunct(cp)) punct += 1
      off += Character.charCount(cp)
    }
    // tokens: split(trim(text)) under limit -1 — trim strips 0x20 only;
    // inside the trimmed view, tokens = (whitespace runs) + 1, which
    // counts the empty segments a leading/trailing \t-style run yields
    var lo = 0
    while (lo < str.length && str.charAt(lo) == ' ') lo += 1
    var hi = str.length
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    var toks = 0L
    if (hi > lo) {
      var runs = 0L
      var inWs = false
      var i = lo
      while (i < hi) {
        val cp = str.codePointAt(i)
        if (TextKernels.isJavaRegexWs(cp)) { if (!inWs) { runs += 1; inWs = true } }
        else inWs = false
        i += Character.charCount(cp)
      }
      toks = runs + 1
    }
    // pass 2 (lowered text): stopword hits as word-run identity under
    // Java \b's model (see TextKernels.wordRunHits for the boundary
    // rules, incl. the NON_SPACING_MARK base-character quirk)
    val stops = TextKernels.wordRunHits(s.toLowerCase.toString, Stopwords, 4)(0)
    // identical arithmetic to the composed form (and the q19 oracle)
    val punctPct = if (chars == 0L) 100L
      else Math.floor(100.0 * punct / chars).toLong
    val stopPct = if (toks == 0L) 0L
      else Math.floor(100.0 * stops / toks).toLong
    val lenPenalty   = if (toks < 5) 40L else if (toks < 20) 10L else 0L
    val punctPenalty = if (punctPct > 20) 30L else if (punctPct > 10) 10L else 0L
    val stopBonus    = if (stopPct > 0) 0L else 20L
    Math.max(0L, 100L - lenPenalty - punctPenalty - stopBonus)
  }

  def apply(text: Column): Column =
    GraftColumnBridge.column(QualityScoreExpr(GraftColumnBridge.expression(text)))
}
