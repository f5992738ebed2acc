package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.functions.TextFunctions

/** Differential harness for the fused BPE-token-count kernel:
  * [[BpeCountExpr]] must equal the definitional
  * `regexp_count(text, BpePattern)` (java.util.regex — the engine
  * behind Spark's regexp_count) on EVERY input — pinned boundary
  * cases, a scalacheck fuzz over a contraction/punctuation-shaped
  * alphabet, and the q54 corpus shape.
  */
class BpeCountSpec extends SparkSpec {
  import spark.implicits._

  private val P = java.util.regex.Pattern.compile(TextFunctions.BpePattern)

  private def reference(s: String): Long = {
    val m = P.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  private def fused(s: String): Long =
    BpeCountExpr.compute(UTF8String.fromString(s))

  test("pinned boundary cases match the regex") {
    val cases = Seq(
      "",
      "don't",              // letter-run + 't contraction → 2
      "x=1",                // letter, punct, digit → 3
      "we'll we've he's I'm you'd they're", // every contraction suffix
      "'s",                 // contraction at start
      "'S 'x 'r 're 'v 've 'l 'll", // case/partial suffixes: only lowercase full suffixes win
      "'",                  // lone apostrophe → punct run
      "''s",                // punct run absorbs first ', second starts contraction
      "!!'s",               // ' mid-punct-run never re-triggers branch 1
      " 's",                // space+punct beats contraction (branch order)
      "a 'll b",            // space+' → punct match " '", then letter run "ll"
      "word word",          // space-prefixed letter run
      "  word",             // double space: \s+ then letter run (no space prefix)
      "a  b",               // letter run, \s+ over both spaces, letter run
      "1 2 33 444",         // space-prefixed digit runs
      "a 1 ! é",            // all four space-prefixed classes
      "tab\tsep\nnl\rcr\fff", // non-space whitespace never prefixes a run
      " \t ",               // whitespace-only
      "ab",           // vertical tab is Java \s (kernel is Java-faithful)
      "héllo wörld",        // non-ASCII bytes are 'other' class
      "日本語 text",          // multi-byte runs
      "🙂🙂 ok",             // astral chars
      "a'b'c'd",            // apostrophes between letters, no suffixes
      "it's-not'true",      // contraction then punct then letter then ' then letter
      "ve've",              // letters that look like suffixes
      "'re're",             // contraction then bare suffix letters
      "end'",               // trailing apostrophe
      "end's",              // trailing contraction
      "3'st",               // digit, then 's contraction, then t? or 'st?
      "x ' y",              // spaced lone apostrophe
      "a2b3c",              // alternating letter/digit runs
      "--- === !!!")        // punct runs with spaces
    cases.foreach { c =>
      assert(fused(c) == reference(c), s"input: '$c'")
    }
  }

  test("fuzz: fused kernel equals regexp count on BPE-shaped strings") {
    val frag = Gen.frequency(
      6 -> Gen.alphaNumStr.map(_.take(6)),
      3 -> Gen.oneOf("'", "'s", "'t", "'re", "'ve", "'m", "'ll", "'d", "'x", "''"),
      3 -> Gen.oneOf(" ", "  ", "\t", "\n", "\r", "\f", ""),
      3 -> Gen.oneOf("!", "?", ".", ",", "-", "=", "(", ")", "#", "@"),
      2 -> Gen.numStr.map(_.take(5)),
      1 -> Gen.oneOf("é", "ü", "日本", "🙂", "Ë"))
    val strGen = Gen.listOf(frag).map(_.mkString)
    val prop = Prop.forAll(strGen) { raw =>
      val s = UTF8String.fromString(raw).toString // canonical UTF-8 image
      fused(s) == reference(s)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(3000), prop)
    assert(res.passed, res.status.toString)
  }

  test("corpus: fused column equals the composed regexp_count on documents") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val diff = docs
      .withColumn("a", TextFunctions.bpeTokenCount(col("text")))
      .withColumn("b", TextFunctions.bpeTokenCountComposed(col("text")))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0, diff.select("doc_id", "a", "b").head(3).mkString("\n"))
  }

  test("null and non-string typing") {
    val out = Seq((1L, Option.empty[String]), (2L, Some("don't")))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.bpeTokenCount(col("t")).as("c"))
      .collect()
    assert(out.find(_.getLong(0) == 1L).get.isNullAt(1))
    assert(out.find(_.getLong(0) == 2L).get.getLong(1) == 2L)
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("i").select(TextFunctions.bpeTokenCount(col("i"))).collect()
    }
  }
}
