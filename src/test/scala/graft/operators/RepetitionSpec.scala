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

  test("profile computes all permilles exactly, every doc emits a row") {
    val docs = Seq(
      (1L, "spam spam spam spam"),     // 4 words, 1 distinct, maxw=4
      (2L, "a b c d"),                 // fully diverse
      (3L, "go stop go stop go stop"), // alternating template
      (4L, "one"),                     // 1 word: no n-grams, still a row
      (5L, "")                         // blank: all zeros, still a row
    ).toDF("doc_id", "text")
    val out = Repetition.profile(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 5, "profile must emit a row per document")
    // (doc_id, n_words, distinct‰, top_word‰, dup2‰, dup3‰, repetitive)
    // doc1: n=4 d=1 maxw=4; g2: 3 occ 1 distinct → dup2=666; g3: 2/1 → 500
    assert(out(0) == ((1L, 4L, 250L, 1000L, 666L, 500L, 1L)))
    // doc2: everything distinct → dup=0, top=250
    assert(out(1) == ((2L, 4L, 1000L, 250L, 0L, 0L, 1L)))
    // doc3: n=6 d=2 maxw=3 → top=500; g2: 5 occ 2 distinct → 600;
    // g3: 4 occ 2 distinct → 500
    assert(out(2) == ((3L, 6L, 333L, 500L, 600L, 500L, 1L)))
    // doc4: single word → n-gram signals 0, top=1000 flags it
    assert(out(3) == ((4L, 1L, 1000L, 1000L, 0L, 0L, 1L)))
    // doc5: blank → all zeros, not flagged
    assert(out(4) == ((5L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("profile thresholds gate the repetitive flag") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // diverse
      (2L, "loop loop loop loop loop loop loop loop")        // degenerate
    ).toDF("doc_id", "text")
    val flags = Repetition.profile(docs)
      .select($"doc_id", $"repetitive").as[(Long, Long)].collect().toMap
    assert(flags(1L) == 0L && flags(2L) == 1L)
    // permissive thresholds un-flag the loop doc
    val lax = Repetition.profile(docs,
        dup2MaxPermille = 2000L, topWordMaxPermille = 2000L)
      .select($"doc_id", $"repetitive").as[(Long, Long)].collect().toMap
    assert(lax(2L) == 0L)
  }

  test("signals kernel equals the composed explode/groupBy form, incl. n=1 and n=3") {
    val fixture = spark.read.parquet(s"${sf()}/documents.parquet")
    val edge = Seq(
      (9001L, ""), (9002L, " a"), (9003L, "x y"),
      (9004L, "go stop go stop go"), (9005L, "a A a\ta  a")
    ).toDF("doc_id", "text")
    for (docs <- Seq(fixture, edge); n <- Seq(1, 2, 3, 4)) {
      val a = Repetition.signals(docs, n)
        .as[(Long, Long, Long, Long)].collect().toSet
      val b = Repetition.signalsComposed(docs, n)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(a == b, s"n=$n kernel/composed mismatch: " +
        s"only-kernel=${(a -- b).take(3)} only-composed=${(b -- a).take(3)}")
    }
  }

  test("signals map-only plan: no exchange below the output") {
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val plan = Repetition.signals(docs, n = 2).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"signals must not shuffle:\n$plan")
  }

  test("fused kernel equals the composed form on the fixture and edge corpora") {
    // the WinnowFpExpr differential pattern: RepetitionStatsExpr must
    // reproduce the staged functions._ composition value-for-value, so
    // the SQL oracle of the composed arithmetic stays valid
    val fixture = spark.read.parquet(s"${sf()}/documents.parquet")
    val edge = Seq(
      (9001L, ""), (9002L, "   "), (9003L, "x"),
      (9004L, "Tab\there  and\nnewline"),  // \t\n are split chars, not trim chars
      (9005L, "a a a a a a a a"),
      (9006L, "MiXeD CaSe mixed case MIXED CASE")
    ).toDF("doc_id", "text")
    for (docs <- Seq(fixture, edge)) {
      val a = Repetition.profile(docs)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      val b = Repetition.profileComposed(docs)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(a == b, s"kernel/composed mismatch: only-kernel=${(a -- b).take(3)} " +
        s"only-composed=${(b -- a).take(3)}")
    }
  }

  test("profile is map-only: no exchange in the physical plan") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val plan = Repetition.profile(docs).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"profile must not shuffle:\n$plan")
  }
}
