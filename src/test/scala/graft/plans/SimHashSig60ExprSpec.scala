package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup
import graft.functions.PortableHash

class SimHashSig60ExprSpec extends SparkSpec {
  import spark.implicits._

  test("fused signature equals the composed explode+votes form on real docs") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(200)
    val fused = Dedup.simhashSignatures60Fused(docs)
      .as[(Long, Long)].collect().toMap
    val composed = Dedup.simhashSignatures60(docs)
      .as[(Long, Long)].collect().toMap
    assert(fused == composed, "fused and composed signatures must be identical")
  }

  test("base hash matches md5Hex60 exactly; empty array is null, '' still votes") {
    val df = Seq(
      (1L, Seq("alpha")),
      (2L, Seq.empty[String]),
      (3L, Seq(""))
    ).toDF("id", "words")
    val sigs = df.select($"id", SimHashSig60Expr($"words").as("sig"))
      .as[(Long, Option[Long])].collect().toMap
    // single word: every set bit of the 60-bit hash votes +1, the rest
    // −1 → the signature IS the hash
    val h = df.filter($"id" === 1L)
      .select(PortableHash.md5Hex60(element_at($"words", 1))).as[Long].head()
    assert(sigs(1L).contains(h))
    // explode-of-nothing semantics: no words → no signature row
    assert(sigs(2L).isEmpty)
    // the empty STRING is a word to the composed form (md5("") hashes) —
    // the fused kernel must not skip it
    val hEmpty = Seq("x").toDF("t").select(PortableHash.md5Hex60(lit(""))).as[Long].head()
    assert(sigs(3L).contains(hEmpty))
  }

  test("wordless docs disappear from the fused signature table like the composed one") {
    val docs = Seq((1L, "real words here"), (2L, "   ")).toDF("doc_id", "text")
    val fusedIds = Dedup.simhashSignatures60Fused(docs).select("doc_id").as[Long].collect()
    val composedIds = Dedup.simhashSignatures60(docs).select("doc_id").as[Long].collect()
    // "   " trims to "" which splits to [""] — a votable word for BOTH
    assert(fusedIds.sorted.sameElements(composedIds.sorted))
    assert(fusedIds.length == 2, "the empty-string token votes in both forms")
  }
}
