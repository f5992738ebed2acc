package graft.operators

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("signals separate looping text from diverse text, exact integers") {
    val docs = Seq(
      (1L, "spam spam spam spam"),          // one bigram, 3 occurrences
      (2L, "a b c d"),                      // 3 distinct bigrams
      (3L, "go stop go stop go stop"),      // alternating template
      (4L, "one"),                          // < n tokens → no row
      (5L, "")                              // blank → no row
    ).toDF("doc_id", "text")
    val out = Repetition.signals(docs, n = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()

    // doc 1: total=3, top=3 ("spam spam"), distinct=1
    assert(out(0) == ((1L, 3L, 100L, 66L)))
    // doc 2: total=3, top=1, distinct=3 → concentration 33%, no dups
    assert(out(1) == ((2L, 3L, 33L, 0L)))
    // doc 3: bigrams = go stop ×3, stop go ×2 → total=5, top=3, distinct=2
    assert(out(2) == ((3L, 5L, 60L, 60L)))
    assert(out.length == 3, "docs with < n tokens must produce no row")
  }

  test("signals are case-insensitive and whitespace-normalized like the dedup family") {
    val docs = Seq((1L, "Ha  HA ha\tha")).toDF("doc_id", "text")
    val Array((_, total, top, dup)) =
      Repetition.signals(docs, n = 2).as[(Long, Long, Long, Long)].collect()
    // all tokens lower to "ha": bigrams "ha ha" ×3
    assert(total == 3L && top == 100L && dup == 66L)
  }
}
