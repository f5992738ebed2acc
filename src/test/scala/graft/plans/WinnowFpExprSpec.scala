package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class WinnowFpExprSpec extends SparkSpec {
  import spark.implicits._

  private def composed(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("codes", TextFunctions.charCodes($"text"))
      .withColumn("hashes", TextFunctions.hashesFromCodes($"codes"))
      .select($"id",
        TextFunctions.winnowFromHashes($"hashes").as("fps"),
        array_min($"hashes").as("min_hash"))

  private def fused(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("wf", WinnowFpExpr($"text"))
      .select($"id", $"wf.fps".as("fps"), $"wf.min_hash".as("min_hash"))

  test("fused kernel equals the composed column chain, including edges") {
    val docs = Seq(
      1L  -> "the quick brown fox jumps over the lazy dog",
      2L  -> "aaaaaaaaaaaaaaaaaaaa",           // degenerate: all minima equal
      3L  -> "abcdefgh",                        // exactly k chars → 1 hash, no window
      4L  -> "abcdefghijk",                     // k ≤ n < k+window-1 → fps empty, min set
      5L  -> "short",                           // < k chars → empty fps, null min
      6L  -> "",                                // empty text
      7L  -> "héllo wörld — çafé naïve über",   // non-ASCII codepoints (mod 256)
      8L  -> "日本語のテキストとハッシュ",        // CJK (codepoints ≫ 256)
      9L  -> "emoji 😀😁 pair test", // supplementary plane
      10L -> "spaces   and\ttabs\nand newlines here"
    ).toDF("id", "text")
    val a = fused(docs).orderBy("id").collect()
    val b = composed(docs).orderBy("id").collect()
    assert(a.sameElements(b))
  }

  test("fused kernel equals the composed chain on the real corpus") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(length($"text") >= 8)
      .select($"doc_id".as("id"), $"text")
    val a = fused(docs).orderBy("id").collect()
    val b = composed(docs).orderBy("id").collect()
    assert(a.length > 0 && a.sameElements(b))
  }

  test("null text yields null struct; winnowNearDupPairs output unchanged") {
    val one = Seq((1L, null.asInstanceOf[String]), (2L, "abcdefghijklmno"))
      .toDF("id", "text")
    val got = one.select($"id", WinnowFpExpr($"text").as("wf")).orderBy("id").collect()
    assert(got(0).isNullAt(1))
    assert(!got(1).isNullAt(1))
  }
}
