package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect().head.getAs[T]("v")

  test("tokenCount") {
    assert(one[Long](TextFunctions.tokenCount($"text"), "a b  c") == 3L)
    assert(one[Long](TextFunctions.tokenCount($"text"), "") == 0L)
    assert(one[Long](TextFunctions.tokenCount($"text"), "   ") == 0L)
    assert(one[Long](TextFunctions.tokenCount($"text"), " one ") == 1L)
  }

  test("punctCount counts ASCII punctuation only") {
    assert(one[Long](TextFunctions.punctCount($"text"), "a,b.c!") == 3L)
    assert(one[Long](TextFunctions.punctCount($"text"), "plain words") == 0L)
  }

  test("stopword hits are whole-word, case-insensitive") {
    // hits: "The", "of", "the" — "theme"/"day" are not whole-word matches
    assert(one[Long](TextFunctions.stopwordCount($"text"), "The theme of the day") == 3L)
  }

  test("langId picks the densest stopword profile deterministically") {
    assert(one[String](TextFunctions.langId($"text"), "the cat and the dog was here") == "en")
    assert(one[String](TextFunctions.langId($"text"), "der hund ist nicht ein katze und") == "de")
    assert(one[String](TextFunctions.langId($"text"), "xyzzy qwerty") == "und")
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val a = one[String](TextFunctions.fingerprint($"text"), "Hello   World")
    val b = one[String](TextFunctions.fingerprint($"text"), "hello world ")
    assert(a == b)
    val c = one[String](TextFunctions.fingerprint($"text"), "hello worlds")
    assert(a != c)
  }

  test("bpeTokenCount splits contractions, numbers and symbols like a pretokenizer") {
    assert(one[Long](TextFunctions.bpeTokenCount($"text"), "don't stop") == 3L)
    // ["don","'t"," stop"]
    assert(one[Long](TextFunctions.bpeTokenCount($"text"), "x=1") == 3L)
    assert(one[Long](TextFunctions.bpeTokenCount($"text"), "hello world") == 2L)
    assert(one[Long](TextFunctions.bpeTokenCount($"text"), "") == 0L)
  }

  test("rollingHashes matches a hand-rolled Rabin-Karp; winnow minima are correct") {
    val text = "abcdefghij" // 10 chars, k=8 → 3 hashes
    val pows = TextFunctions.hashPowers(8)
    def h(s: String): Long =
      s.zip(pows).map { case (c, p) => (c.toLong % 256) * p }.sum
    val expect = (0 to 2).map(i => h(text.slice(i, i + 8)))
    val got = one[collection.Seq[Long]](TextFunctions.rollingHashes($"text"), text)
    assert(got == expect)
    // window=4 > 3 positions → no winnow window fits → empty
    assert(one[collection.Seq[Long]](TextFunctions.winnowFingerprints($"text"), text).isEmpty)
    // 12 chars → 5 hashes → 2 windows of 4; each fingerprint is a real minimum
    val t2   = "abcdefghijkl"
    val h2   = (0 to 4).map(i => h(t2.slice(i, i + 8)))
    val fps  = one[collection.Seq[Long]](TextFunctions.winnowFingerprints($"text"), t2)
    assert(fps.toSet == Set(h2.slice(0, 4).min, h2.slice(1, 5).min))
    // shorter than k → no hashes at all
    assert(one[collection.Seq[Long]](TextFunctions.rollingHashes($"text"), "short").isEmpty)
  }

  test("shingles: n-grams distinct+lowercased; short/blank docs give empty, not error") {
    val sh = one[collection.Seq[String]](TextFunctions.shingles($"text", 3), "A b c D")
    assert(sh == Seq("a b c", "b c d"))
    // fewer tokens than n used to drive sequence(0,-1) → slice(toks, 0, n) → error
    assert(one[collection.Seq[String]](TextFunctions.shingles($"text", 3), "only two").isEmpty)
    assert(one[collection.Seq[String]](TextFunctions.shingles($"text", 3), "").isEmpty)
    assert(one[Boolean](TextFunctions.hasShingles($"text", 3), "a b c"))
    assert(!one[Boolean](TextFunctions.hasShingles($"text", 3), "a b"))
  }

  test("maskPii masks emails, URLs, and digit runs with typed placeholders") {
    def m(s: String) = one[String](TextFunctions.maskPii($"text"), s)
    assert(m("mail a.user+tag@sub.example.org now") == "mail [EMAIL] now")
    assert(m("see https://example.org/p?id=9 and http://x.io/q") ==
      "see [URL] and [URL]")
    assert(m("call +1 (555) 010-7321 today") == "call +[NUM] today")
    // short digit runs (< 8 chars total) are NOT account-number-shaped
    assert(m("room 1234 floor 9") == "room 1234 floor 9")
    // untouched text passes through byte-identical
    assert(m("no pii here at all") == "no pii here at all")
  }

  test("maskPii ordering: email digits and URL ports never leak to [NUM]") {
    def m(s: String) = one[String](TextFunctions.maskPii($"text"), s)
    // email first: the address's digits vanish inside [EMAIL], never [NUM]
    assert(m("user12345678@example.com") == "[EMAIL]")
    // URL second: a numeric path/port is consumed by [URL], not re-masked
    assert(m("https://h.example:8080/path/1234567890 x") == "[URL] x")
    // all three in one string, in reverse pattern order
    assert(m("tel 0123 456 789, https://a.io/9?p=1234567890, b9@c.de") ==
      "tel [NUM], [URL] [EMAIL]")
  }

  test("qualityScore rewards stopword-bearing prose, caps at [0,100]") {
    val prose = "the quick brown fox jumps over the lazy dog and runs far away " * 3
    val junk  = "!!! ??? ### !!!"
    val qProse = one[Long](TextFunctions.qualityScore($"text"), prose)
    val qJunk  = one[Long](TextFunctions.qualityScore($"text"), junk)
    assert(qProse > qJunk)
    assert(qProse <= 100L && qJunk >= 0L)
  }

  test("normalizeText: NFC composes, controls strip, whitespace collapses, trim") {
    def n(s: String) = one[String](TextFunctions.normalizeText($"text"), s)
    val decomposed = "cafe\u0301"  // e + combining acute (U+0301)
    val composed   = "caf\u00e9"   // precomposed e-acute
    assert(n(decomposed) == composed) // the fingerprints unify
    assert(n(composed) == composed)   // already-NFC text untouched
    // C0 controls and DEL vanish; \t\n\r are whitespace, not stripped
    assert(n("a\u0001b\u0002c\u007fd") == "abcd")
    assert(n("a\tb\nc\rd") == "a b c d")
    // runs collapse, edges trim
    assert(n("  a   b  ") == "a b")
    // all legs together
    assert(n("  Cafe\u0301 \t menu \u0000  ") == "Caf\u00e9 menu")
    // NFC never folds compatibility characters (that's NFKC policy)
    assert(n("\u2460 \ufb01") == "\u2460 \ufb01") // circled-1 and fi-ligature survive
  }

  test("langId kernel equals the composed five-regex form") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.unsafe.types.UTF8String
    def both(s: String): (String, String) = (
      one[String](TextFunctions.langId($"text"), s),
      one[String](TextFunctions.langIdComposed($"text"), s))
    for (s <- Seq("", "the cat and the dog", "der hund ist nicht",
        "le chat est une b\u00eate", "el perro es una cosa",
        "och att det som \u00e4r f\u00f6r", "xyzzy", "en en en the the the",
        "f\u00f6r the", "pa\u030a och att det"))  // decomposed å ≠ composed å
      assert(both(s)._1 == both(s)._2, s"mismatch on $s")
    // fuzz across all five profiles + decoys + unicode edges
    val words = TextFunctions.StopwordsEn ++ TextFunctions.StopwordsDe ++
      TextFunctions.StopwordsFr ++ TextFunctions.StopwordsEs ++
      TextFunctions.StopwordsSv
    val frag = Gen.frequency(
      6 -> Gen.oneOf(words),
      2 -> Gen.oneOf("theme", "rat", "x_y", "\u00e4r1", "f\u00f6", "\u0130s"),
      2 -> Gen.oneOf(" ", "  ", "\t", "\n", ".", ",", "!"),
      1 -> Gen.oneOf("\u65e5\u672c", "\ud83d\ude42", "a\u0301", ""))
    val prop = Prop.forAll(Gen.listOf(frag).map(_.mkString(" "))) { raw =>
      val s = UTF8String.fromString(raw).toString
      graft.plans.LangIdExpr.compute(UTF8String.fromString(s)).toString ==
        one[String](TextFunctions.langIdComposed($"text"), s)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("qualityScore kernel equals the composed three-regex form") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.unsafe.types.UTF8String
    def both(s: String): (Long, Long) = (
      one[Long](TextFunctions.qualityScore($"text"), s),
      one[Long](TextFunctions.qualityScoreComposed($"text"), s))
    // edge corpus: boundary shapes for every leg of the arithmetic
    for (s <- Seq("", "   ", "\tx", "x\t", "the and of to is",
        "a b c d", "a b c d e", "!!!", "a!!!b", "was?the,and",
        "the_cat", "that4 the", "x " * 25, "\u00e9 the \u0301a",
        "The THE tHe", "a\u0001b the", "\ud83d\ude00 the fox"))
      assert(both(s)._1 == both(s)._2, s"mismatch on ${s.take(40)}")
    // fuzz (PiiMaskSpec pattern): word/punct/ws/unicode-biased alphabet
    val frag = Gen.frequency(
      5 -> Gen.oneOf("the", "and", "a", "that", "theme", "rat", "x_y", "to4"),
      3 -> Gen.oneOf(" ", "  ", "\t", "\n", "\r", "\f", ""),
      2 -> Gen.oneOf("!", ".", ",", "?", "@", "[", "`", "~", "{"),
      2 -> Gen.alphaNumStr.map(_.take(6)),
      1 -> Gen.oneOf("\u00e9", "\u0130", "\u65e5\u672c", "\ud83d\ude42"))
    val prop = Prop.forAll(Gen.listOf(frag).map(_.mkString)) { raw =>
      val s = UTF8String.fromString(raw).toString
      graft.plans.QualityScoreExpr.compute(UTF8String.fromString(s)) ==
        one[Long](TextFunctions.qualityScoreComposed($"text"), s)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("NfcNormalizeExpr: null-safe and idempotent") {
    def n(s: String) = one[String](TextFunctions.normalizeText($"text"), s)
    val messy = "cafe\u0301 x \u0003 y"
    assert(n(n(messy)) == n(messy)) // idempotent
    val df = Seq((1L, null: String)).toDF("id", "text")
      .select(graft.plans.NfcNormalizeExpr($"text").as("n"))
    assert(df.collect().head.isNullAt(0))
  }
}
