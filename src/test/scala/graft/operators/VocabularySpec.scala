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

  test("surprisalScore: hand-computed whole-bit surprisal") {
    // corpus: a×8, rare×1 -> total=9
    // sbits(a)    = floor(log2 9) - floor(log2 8) = 3 - 3 = 0
    // sbits(rare) = floor(log2 9) - floor(log2 1) = 3 - 0 = 3
    val docs = Seq(
      (1L, "a a a a a a a"),  // 7 tokens, all common -> avg 0
      (2L, "a rare"))         // (0 + 3) div 2 = 1
      .toDF("doc_id", "text")
    val got = Vocabulary.surprisalScore(docs)
      .select("doc_id", "n_tok", "avg_surprisal_bits")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((7L, 0L)), 2L -> ((2L, 1L))))
  }

  test("surprisalScore: uniform corpus scores uniformly, empty docs vanish") {
    // 4 docs of "x y": cnt(x)=cnt(y)=4, total=8 -> sbits = 3-2 = 1
    val docs = ((1 to 4).map(i => (i.toLong, "x y")) :+ ((9L, ""))).toDF("doc_id", "text")
    val got = Vocabulary.surprisalScore(docs)
      .select("doc_id", "n_tok", "avg_surprisal_bits")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == (1 to 4).map(i => i.toLong -> ((2L, 1L))).toMap)
  }

  test("fused bigramTf equals the composed transform/explode/groupBy form") {
    // differential over the fused codegen kernel vs the HOF composition
    // it replaced (the WinnowFpExpr precedent) — including multi-space
    // runs, repeated pairs, unicode, 0/1/2-token edges, blank text
    val fuzz = Seq(
      "aa bb aa bb aa", "x", "", "  lead and   trail  ", "a a a a a a",
      "solo pair", "ü ber ü ber zw ö lf", "p q r p q r p q s",
      (1 to 60).map(i => s"t${i % 7}").mkString(" "))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = fuzz.toDF("doc_id", "text")
    val got = Vocabulary.bigramTf(df)
      .as[(Long, String, String, Long)].collect().toSet
    val want = fuzz.flatMap { case (id, t) =>
      val tk = t.toLowerCase.trim.split("\\s+", -1).toSeq
      if (tk.length < 2) Nil
      else tk.sliding(2).toSeq.groupBy(identity).map { case (p, occ) =>
        (id, p(0), p(1), occ.size.toLong) }
    }.toSet
    assert(got == want)
  }

  test("bigramSurprisalScore: rare continuations score high, hand-checked") {
    // bigrams: (b,a) x3, (a,b) x1, (b,c) x1 -> cnt_ctx: b=4, a=1
    // sbits: (b,a)=floor(log2 4)-floor(log2 3)=1, (a,b)=0-0=0, (b,c)=2-0=2
    val docs = Seq(
      (1L, "b a b a"),   // (2*1 + 1*0) div 3 = 0
      (2L, "b a"),       // 1 div 1 = 1
      (3L, "b c"),       // 2 div 1 = 2: common words, rare ORDER
      (4L, "solo"))      // one token: no bigrams, no row
      .toDF("doc_id", "text")
    val got = Vocabulary.bigramSurprisalScore(docs)
      .select("doc_id", "n_bigrams", "avg_bigram_bits")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((3L, 0L)), 2L -> ((1L, 1L)), 3L -> ((1L, 2L))))
  }

  test("bigramSurprisalScore sees word order where unigram surprisal cannot") {
    // same bag of words, different order. The contexts of the shuffled
    // doc's bigrams must stay COMMON (else p(·|ctx)=1 and the score is
    // legitimately 0 bits): 6 copies of "the cat sat" keep 'the' and
    // 'cat' frequent contexts; doc 7 = "cat the sat" then chains two
    // never-repeated continuations of those common contexts.
    // cctx(the)=7, cnt(the,sat)=1 -> 2 bits; cctx(cat)=7, cnt(cat,the)=1 -> 2.
    val docs = ((1 to 6).map(i => (i.toLong, "the cat sat")) :+ ((7L, "cat the sat")))
      .toDF("doc_id", "text")
    val uni = Vocabulary.surprisalScore(docs)
      .select("doc_id", "avg_surprisal_bits").as[(Long, Long)].collect().toMap
    assert(uni(7L) == uni(1L), "bag-of-words score must tie")
    val bi = Vocabulary.bigramSurprisalScore(docs)
      .select("doc_id", "avg_bigram_bits").as[(Long, Long)].collect().toMap
    assert(bi(1L) == 0L && bi(7L) == 2L,
      s"shuffled word order must raise bigram surprisal: $bi")
  }

  test("bpePairCounts: vocabulary-weighted adjacent pairs, overlaps included") {
    val corpus = Seq(
      (1L, "abab cd"),   // abab: ab,ba,ab — overlapping pairs all count
      (2L, "abab abab"), // wf(abab)=3 total
      (3L, "cd x")       // wf(cd)=2; length-1 'x' contributes nothing
    ).toDF("doc_id", "text")
    val got = Vocabulary.bpePairCounts(corpus, k = 10)
      .as[(String, Long)].collect().toSeq
    // ab: 2 per abab × wf 3 = 6; ba: 1 × 3 = 3; cd: wf 2
    assert(got == Seq(("ab", 6L), ("ba", 3L), ("cd", 2L)))
  }

  test("collocations: PMI separates a faithful pair from a promiscuous one") {
    // bigrams never cross documents, so each two-word doc is one pair.
    // x→y is exclusive (4/4 of x's uses); a and b are promiscuous
    // (a pairs with b/c/d, b receives from a/e/f). N=10, all marginals
    // powers of two, so every floor-log2 is exact by construction:
    //   pmi(x,y) = ⌊lg 10⌋+⌊lg 4⌋−⌊lg 4⌋−⌊lg 4⌋ = 3+2−2−2 = 1
    //   pmi(a,b) = 3+1−2−2 = 0
    val corpus = (Seq.fill(4)("x y") ++ Seq.fill(2)("a b") ++
        Seq("a c", "a d", "e b", "f b"))
      .zipWithIndex.map { case (s, i) => (i.toLong + 1, s) }
      .toDF("doc_id", "text")
    val got = Vocabulary.collocations(corpus, minCount = 2L, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("x", "y", 4L, 1L), ("a", "b", 2L, 0L)))
  }
}
