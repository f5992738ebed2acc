package graft.operators

import graft.SparkSpec

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  private def top(k: Int, rows: (Long, String)*): Seq[(Long, Long, String, Long, Long, Long)] =
    Keywords.tfidfTopK(rows.toDF("doc_id", "text"), k)
      .orderBy("doc_id", "rnk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

  test("hand-computed tf*idf ranks: rare tokens beat common ones") {
    // N=2. tf: d1{apple:2, banana:1}, d2{banana:1, cherry:1}
    // df: apple 1, banana 2, cherry 1
    // idf_micro: apple (2e6/1)=2000000, banana 1000000, cherry 2000000
    // scores: d1 apple 4000000, banana 1000000; d2 cherry 2000000, banana 1000000
    val got = top(5,
      1L -> "apple apple banana",
      2L -> "banana cherry")
    assert(got == Seq(
      (1L, 1L, "apple", 2L, 1L, 4000000L),
      (1L, 2L, "banana", 1L, 2L, 1000000L),
      (2L, 1L, "cherry", 1L, 1L, 2000000L),
      (2L, 2L, "banana", 1L, 2L, 1000000L)))
  }

  test("score ties break on token text ascending") {
    // both tokens: tf=1, df=1 -> same score; "ant" must rank first
    val got = top(5, 1L -> "zebra ant")
    assert(got.map(t => (t._2, t._3)) == Seq((1L, "ant"), (2L, "zebra")))
  }

  test("k truncates per document, case folds, empty docs vanish") {
    val got = top(1,
      1L -> "Apple apple BANANA banana banana",
      2L -> "  ")
    // tf: apple 2, banana 3 (case-folded); same df (1 each) -> banana
    // wins on tf. N=2: the token-free doc still counts in the corpus
    // size (idf mirrors COUNT(*) FROM documents), so idf = 2e6.
    assert(got == Seq((1L, 1L, "banana", 3L, 1L, 6000000L)))
  }

  test("integer idf: df dividing 1e6*N exactly vs truncating") {
    // N=3, df=2 -> idf = 3000000//2 = 1500000; df=3 -> 1000000
    val got = top(5,
      1L -> "x y",
      2L -> "x y",
      3L -> "y")
    val idf = got.map(t => t._3 -> t._6 / t._4).toMap // score/tf = idf
    assert(idf == Map("x" -> 1500000L, "y" -> 1000000L))
  }

  test("tfidfTopKOwned: release returns staged block storage to baseline") {
    // track the SPECIFIC persisted-RDD ids the stage adds (an absolute
    // count is flaky: ContextCleaner GCs unreferenced persisted RDDs
    // from earlier tests concurrently)
    def ids(): Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val docs = Seq(1L -> "apple apple banana", 2L -> "banana cherry")
      .toDF("doc_id", "text")
    val before = ids()
    val (out, staged) = Keywords.tfidfTopKOwned(docs, 5)
    val added = ids() -- before
    assert(added.nonEmpty, "the eager stage must have materialized blocks")
    assert(out.count() == 4) // consume while the stage is alive
    staged.release()
    assert((ids() intersect added).isEmpty,
      s"release must free the staged blocks: $added still persisted")
    staged.release() // idempotent
    // repeated build/consume/release cycles never accumulate storage —
    // the long-lived-driver contract the plain stage() lacked
    (1 to 3).foreach { _ =>
      val pre = ids()
      val (o, h) = Keywords.tfidfTopKOwned(docs, 5)
      o.count(); h.release()
      assert((ids() -- pre).isEmpty, "a released cycle must not accumulate")
    }
  }
}
