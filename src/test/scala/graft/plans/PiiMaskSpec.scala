package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.functions.TextFunctions

/** Differential harness for the fused PII kernel: [[PiiMaskExpr]] must
  * be byte-identical to the definitional three-pass java.util.regex
  * chain on EVERY input — pinned adversarial cases, a scalacheck fuzz
  * over a PII-shaped alphabet, and the full documents corpus with the
  * q61 injection.
  */
class PiiMaskSpec extends SparkSpec {
  import spark.implicits._

  /** The definitional chain, evaluated by java.util.regex directly —
    * the same engine Spark's regexp_replace uses.
    */
  private def reference(s: String): String =
    s.replaceAll(TextFunctions.PiiEmailPattern, "[EMAIL]")
      .replaceAll(TextFunctions.PiiUrlPattern, "[URL]")
      .replaceAll(TextFunctions.PiiNumPattern, "[NUM]")

  private def fused(s: String): String =
    PiiMaskExpr.mask(UTF8String.fromString(s)).toString

  test("pinned adversarial cases match the regex chain") {
    val cases = Seq(
      "",
      "no pii here",
      "a@b.co",
      "user.name+tag%x@mail.example.org",
      // sequential-vs-alternation divergence: email pass wins the overlap
      "123 456 789a@b.co",
      // URL swallowing an already-masked email (pass interaction)
      "see https://x.com/a@b.com now",
      "http://x.com/1234567890",
      "https//broken http:/nope httpx://no",
      "http:// ",               // empty [^\s]+ → no match
      "https://t",              // minimal url
      "a@b@c.co x@y",           // multiple @, partial failures
      "a@@b.co",                // empty local before second @
      "a@b.co@d.com",           // rescan starts after match end
      "a@b.cd.ef-gh",           // rightmost-dot backtracking
      "a@b.comm3",              // letters stop before trailing digit
      "a@b.c",                  // single-letter TLD → no match
      "a@b-c.de",               // hyphenated domain
      ".x@y.org",               // dots are local chars
      "+1 (555) 010-9999",      // classic phone
      "1-----2 1------2",       // {6,} boundary: 7 vs 8 chars
      "12345678",               // bare 8-digit run
      "1234567",                // 7 digits: mid len 5 → no match
      "123 456 78",             // trailing non-digit in run
      "(((12345678)))",         // match excludes leading/trailing non-digits
      "55 5 5 5 5 5 5 5",       // spaces inside the run
      "ends with digits 12345678",
      "12345678 then a@b.co then http://x 87654321",
      "päivää a@b.co ünïcode http://é.example/päth 12 34 56 78",
      "\t http://a\nb 123\t45678",  // \n and \t break runs (Java \s)
      "a@b.co12345678",       // vertical tab is Java \s
      "contact user7@mail.example.org or https://example.org/d/7?ref=42 phone +1 (555) 010-0007")
    cases.foreach { c =>
      assert(fused(c) == reference(c), s"input: '$c'")
    }
  }

  /** Truncate to at most `n` UTF-16 chars WITHOUT splitting a surrogate
    * pair: a raw `.take(n)` landing inside an astral char leaves a lone
    * high surrogate — a string no Spark value can represent
    * (`UTF8String.fromString` encodes it as `?` while java.util.regex on
    * the JVM String keeps it), so the differential would fail on inputs
    * the kernel can never see.
    */
  private def takeCodepoints(s: String, n: Int): String =
    if (s.length <= n) s
    else if (Character.isHighSurrogate(s.charAt(n - 1))) s.substring(0, n - 1)
    else s.substring(0, n)

  test("fuzz: fused kernel equals the regex chain on PII-shaped strings") {
    // alphabet biased to the class boundaries: @, dots, digits, the
    // literal http fragments, whitespace variants, multi-byte chars
    val frag = Gen.frequency(
      6  -> Gen.alphaNumStr.map(_.take(6)),
      4  -> Gen.numStr.map(_.take(10)),
      3  -> Gen.oneOf("@", ".", "-", "+", "_", "%", "(", ")", " ", "  ", ":", "/"),
      2  -> Gen.oneOf("http", "https", "://", "http://", "https://"),
      2  -> Gen.oneOf("a@b.co", ".co", ".c", "example.org", "@x.", "@.com"),
      1  -> Gen.oneOf(" ", "\t", "\n", "\r", "\f", ""),
      1  -> Gen.oneOf("é", "ü", "日本", "🙂"))
    val strGen = Gen.listOf(frag).map(_.mkString).map(takeCodepoints(_, 400))
    // Canonicalize through a UTF8String round-trip BEFORE comparing: the
    // kernel's domain is UTF-8-representable strings (everything Spark
    // can hold). This also defuses ScalaCheck's shrinker, which shrinks
    // char-by-char and can fabricate lone surrogates the generator never
    // produced.
    val prop = Prop.forAll(strGen) { raw =>
      val s = UTF8String.fromString(raw).toString
      fused(s) == reference(s)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(3000), prop)
    assert(res.passed, res.status.toString)
  }

  test("lone-surrogate contract: kernel domain is UTF-8-representable strings") {
    // An unpaired surrogate is not encodable in UTF-8; UTF8String stores
    // it as '?' (0x3F). The kernel is defined on what Spark can hold, so
    // the differential is stated on the canonical image — pinned here so
    // the round-trip contract is explicit rather than implied by the fuzz.
    val lone = "123456\ud83d78" // high surrogate mid-digit-run
    assert(UTF8String.fromString(lone).toString == "123456?78")
    val s = UTF8String.fromString(lone).toString
    assert(fused(s) == reference(s))
    // and the canonical image of a VALID astral char is itself
    val ok = "a@b.co 🙂 12345678"
    assert(UTF8String.fromString(ok).toString == ok && fused(ok) == reference(ok))
  }

  test("corpus: fused column equals the regexp_replace chain on q61's input") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.org or https://example.org/d/"),
          col("doc_id").cast("string"),
          lit("?ref=42 phone +1 (555) 010-"),
          lpad(col("doc_id").cast("string"), 4, "0")).as("text"))
    val diff = docs
      .withColumn("a", TextFunctions.maskPii(col("text")))
      .withColumn("b", TextFunctions.maskPiiRegex(col("text")))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0, diff.select("text", "a", "b").head(3).mkString("\n"))
  }

  test("null and non-string typing") {
    val out = Seq((1L, Option.empty[String]), (2L, Some("x a@b.co")))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.maskPii(col("t")).as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).isEmpty && out(2L).contains("x [EMAIL]"))
  }
}
