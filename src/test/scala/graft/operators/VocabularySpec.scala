package graft.operators

import graft.SparkSpec

class VocabularySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "aa aa aa bb bb cc"),   // aa:3 bb:2 cc:1
    (2L, "aa bb zz zz"),         // zz:2
    (3L, "qq ww ee rr"),         // all rare
    (4L, "")                     // no tokens → no rate
  ).toDF("doc_id", "text")

  test("topTokens: frequency order with deterministic text tie-break") {
    val top = Vocabulary.topTokens(docs, 3).as[(String, Long)].collect()
    // aa:4, bb:3, zz:2 — cc/qq/ww/ee/rr (1 each) lose; zz beats none on ties
    assert(top.toSeq == Seq(("aa", 4L), ("bb", 3L), ("zz", 2L)))
    // tie region: with k=5, the two 1-freq winners are the lexicographically first
    val top5 = Vocabulary.topTokens(docs, 5).as[(String, Long)].collect().map(_._1)
    assert(top5.toSeq == Seq("aa", "bb", "zz", "cc", "ee"))
  }

  test("oovRate scores occurrences against the corpus vocabulary") {
    val rates = Vocabulary.oovRate(docs, vocabSize = 3)
      .select("doc_id", "n_tok", "n_oov", "oov_pct")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rates(1L) == ((1L, 6L, 1L, 16L)))  // cc is OOV: floor(100/6)
    assert(rates(2L) == ((2L, 4L, 0L, 0L)))   // aa/bb/zz all in vocab
    assert(rates(3L) == ((3L, 4L, 4L, 100L))) // fully OOV
    assert(!rates.contains(4L))               // token-free doc excluded
  }
}
