package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII masker — the single-kernel form of the
  * [[graft.functions.TextFunctions.maskPii]] chain (email → URL → long
  * digit run, each replaced with its typed placeholder).
  *
  * The composed form is three `regexp_replace` calls: three
  * UTF8String→String conversions, three regex-engine scans with
  * per-match replacement parsing, three result copies — and it was the
  * worst linear scaler in the suite (the per-row cost is pure regex
  * engine). This expression runs three hand-written LINEAR byte
  * scanners over the UTF-8 bytes with none of the above. Byte-level
  * scanning is exact here because every character class in the three
  * patterns is pure ASCII and UTF-8 continuation bytes (≥ 0x80) can
  * never alias an ASCII byte — a multi-byte character is simply "not
  * in class" bytewise, which is also what java.util.regex decides
  * (and, for `[^\s]`, both treat it as a match: Java `\s` without
  * UNICODE_CHARACTER_CLASS is the six ASCII whitespace chars).
  *
  * SEMANTICS CONTRACT: each pass reproduces java.util.regex leftmost
  * + greedy-with-backtracking match selection for its specific
  * pattern, and the passes run sequentially over the previous pass's
  * output — NOT as one alternation, which is observably different:
  * on `"123 456 789a@b.co"` the chain yields `123 456 [EMAIL]` (the
  * email pass runs first over the whole string and wins the overlap),
  * while a single-pass leftmost alternation would emit
  * `[NUM]a@b.co` (the number match starts earlier in the text). The
  * differential spec (PiiMaskSpec) fuzz-checks this kernel against the
  * real regex chain, and the q61 oracle holds it to DuckDB's RE2 run
  * of the same patterns.
  *
  * Per-pattern match selection, derived from backtracking semantics:
  *  - EMAIL `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`:
  *    for each `@` (left to right), the local part is the maximal run
  *    of local-class bytes immediately before it (bounded by the
  *    previous match end; must be non-empty — no byte in the run can
  *    be `@`, so shrinking the run can never expose another `@`), and
  *    the domain is accepted iff the maximal run of domain-class bytes
  *    after the `@` contains a dot at offset ≥ 1 followed by ≥ 2
  *    letters; greedy backtracking picks the RIGHTMOST such dot and
  *    the maximal letter run after it ends the match.
  *  - URL `https?://[^\s]+`: literal prefix (with the `s?` backtrack),
  *    then the maximal run of non-whitespace bytes, which must be
  *    non-empty.
  *  - NUM `[0-9][0-9 ()+.-]{6,}[0-9]`: within each maximal run of
  *    mid-class bytes, the match is first-digit .. last-digit iff they
  *    are ≥ 7 apart; if not, no start inside the run can match (later
  *    digit starts only shrink the span), and a matched run cannot
  *    match again (nothing after its last digit is a digit).
  */
case class PiiMaskExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = child.nullable
  override def prettyName: String = "mask_pii"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string column")
    }

  override def nullSafeEval(v: Any): Any =
    PiiMaskExpr.mask(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PiiMaskExpr.mask($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PiiMaskExpr {

  private val ReplEmail = "[EMAIL]".getBytes("UTF-8")
  private val ReplUrl   = "[URL]".getBytes("UTF-8")
  private val ReplNum   = "[NUM]".getBytes("UTF-8")

  // ASCII class tests on raw bytes; any byte ≥ 0x80 is negative in JVM
  // bytes and fails every test below except isNonWs (where it must
  // pass — multi-byte chars are not ASCII whitespace).
  @inline private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isLocal(b: Byte): Boolean =
    isLetter(b) || isDigit(b) || b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
  @inline private def isDomain(b: Byte): Boolean =
    isLetter(b) || isDigit(b) || b == '.' || b == '-'
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
  @inline private def isNumMid(b: Byte): Boolean =
    isDigit(b) || b == ' ' || b == '(' || b == ')' || b == '+' || b == '.' || b == '-'

  /** Growable output used only once a pass actually matches. */
  private final class Buf(cap: Int) {
    var a = new Array[Byte](cap)
    var n = 0
    def write(src: Array[Byte], from: Int, len: Int): Unit = {
      if (n + len > a.length)
        a = java.util.Arrays.copyOf(a, math.max(a.length * 2, n + len))
      System.arraycopy(src, from, a, n, len)
      n += len
    }
    def write(src: Array[Byte]): Unit = write(src, 0, src.length)
    def bytes: Array[Byte] = if (n == a.length) a else java.util.Arrays.copyOf(a, n)
  }

  /** Email pass. Returns the input array unchanged when nothing matched. */
  private[plans] def passEmail(b: Array[Byte]): Array[Byte] = {
    val n = b.length
    var out: Buf = null
    var last = 0
    var i = 0
    while (i < n) {
      var advanced = false
      if (b(i) == '@') {
        var ls = i
        while (ls > last && isLocal(b(ls - 1))) ls -= 1
        if (ls < i) {
          var de = i + 1
          while (de < n && isDomain(b(de))) de += 1
          // rightmost dot at offset ≥ 1 into the domain run, ≥ 2 letters after
          var d   = de - 1
          var end = -1
          while (d >= i + 2 && end < 0) {
            if (b(d) == '.') {
              var le = d + 1
              while (le < n && isLetter(b(le))) le += 1
              if (le - d - 1 >= 2) end = le
            }
            d -= 1
          }
          if (end > 0) {
            if (out == null) out = new Buf(n)
            out.write(b, last, ls - last)
            out.write(ReplEmail)
            last = end
            i = end
            advanced = true
          }
        }
      }
      if (!advanced) i += 1
    }
    if (out == null) b
    else { out.write(b, last, n - last); out.bytes }
  }

  /** URL pass. */
  private[plans] def passUrl(b: Array[Byte]): Array[Byte] = {
    val n = b.length
    var out: Buf = null
    var last = 0
    var i = 0
    while (i + 6 < n) { // minimal match "http://" + 1 char = 8 bytes
      var advanced = false
      if (b(i) == 'h' && b(i + 1) == 't' && b(i + 2) == 't' && b(i + 3) == 'p') {
        val k = i + 4
        var aft = -1
        if (b(k) == 's' && k + 3 < n &&
            b(k + 1) == ':' && b(k + 2) == '/' && b(k + 3) == '/') aft = k + 4
        else if (k + 2 < n && b(k) == ':' && b(k + 1) == '/' && b(k + 2) == '/') aft = k + 3
        if (aft > 0 && aft < n && !isWs(b(aft))) {
          var e = aft + 1
          while (e < n && !isWs(b(e))) e += 1
          if (out == null) out = new Buf(n)
          out.write(b, last, i - last)
          out.write(ReplUrl)
          last = e
          i = e
          advanced = true
        }
      }
      if (!advanced) i += 1
    }
    if (out == null) b
    else { out.write(b, last, n - last); out.bytes }
  }

  /** Long-digit-run pass. */
  private[plans] def passNum(b: Array[Byte]): Array[Byte] = {
    val n = b.length
    var out: Buf = null
    var last = 0
    var i = 0
    while (i < n) {
      if (isNumMid(b(i))) {
        var re = i + 1
        while (re < n && isNumMid(b(re))) re += 1
        var s = i
        while (s < re && !isDigit(b(s))) s += 1
        if (s < re) {
          var e = re - 1
          while (e > s && !isDigit(b(e))) e -= 1
          if (e - s >= 7) {
            if (out == null) out = new Buf(n)
            out.write(b, last, s - last)
            out.write(ReplNum)
            last = e + 1
          }
        }
        i = re
      } else i += 1
    }
    if (out == null) b
    else { out.write(b, last, n - last); out.bytes }
  }

  /** The fused per-row kernel (static so generated code can call it). */
  def mask(s: UTF8String): UTF8String = {
    val b0 = s.getBytes
    val b1 = passNum(passUrl(passEmail(b0)))
    if (b1 eq b0) s else UTF8String.fromBytes(b1)
  }

  def apply(text: Column): Column =
    GraftColumnBridge.column(PiiMaskExpr(GraftColumnBridge.expression(text)))
}
