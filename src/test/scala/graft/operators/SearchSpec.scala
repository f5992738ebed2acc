package graft.operators

import org.apache.spark.sql.functions.lit

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark join hash join"),   // repeated term: ONE index row
    (2L, "merge join sort"),
    (3L, "hash scan filter"),
    (4L, "Join HASH upper"),        // tokenizer lowercases
    (5L, "")                        // empty: no index rows
  ).toDF("doc_id", "text")

  test("index is distinct (tok, doc) pairs; df counts documents not occurrences") {
    val idx = Search.buildIndex(docs)
    assert(idx.filter($"doc_id" === 1L && $"tok" === "join").count() == 1L,
      "repeated token must index once")
    val df = Search.documentFrequencies(idx).as[(String, Long)].collect().toMap
    assert(df("join") == 3L && df("hash") == 3L && df("merge") == 1L)
  }

  test("AND query returns exactly the documents containing every term") {
    val idx = Search.buildIndex(docs)
    assert(Search.andQuery(idx, Seq("join", "hash")).as[Long].collect().toSet ==
      Set(1L, 4L))
    assert(Search.andQuery(idx, Seq("join")).as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
    assert(Search.andQuery(idx, Seq("join", "scan")).isEmpty)
  }

  test("repeated and differently-cased query terms do not change the result") {
    val idx = Search.buildIndex(docs)
    val once = Search.andQuery(idx, Seq("join", "hash")).as[Long].collect().toSet
    assert(Search.andQuery(idx, Seq("JOIN", "hash", "join")).as[Long].collect().toSet
      == once)
  }

  test("rankedQuery: rare terms dominate through idf; ties break on id") {
    val corpus = Seq(
      (1L, "join join join"),  // tf(join)=3
      (2L, "rare join"),       // the only 'rare' doc
      (3L, "join"),
      (4L, "other words here")
    ).toDF("doc_id", "text")
    val n = corpus.groupBy().count().withColumnRenamed("count", "n_docs")
    val got = Search.rankedQuery(
        Search.buildTfIndex(corpus), n, Seq("rare", "join"), k = 3)
      .as[(Long, Long)].collect()
    // idf(join) = (4e6) div 3 = 1333333; idf(rare) = 4e6
    // doc2 = 4e6 + 1333333; doc1 = 3*1333333; doc3 = 1333333
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 3L))
    assert(got.head._2 == 4000000L + 1333333L)
    assert(got(1)._2 == 3L * 1333333L)
  }

  test("phraseQuery matches exact adjacency only, in order") {
    val corpus = Seq(
      (1L, "the hash join wins"),     // match
      (2L, "hash then join"),          // words present, not adjacent
      (3L, "join hash"),               // adjacent, wrong order
      (4L, "hash join hash join"),     // two occurrences -> ONE row
      (5L, "sort merge join")
    ).toDF("doc_id", "text")
    val idx = Search.buildPositionalIndex(corpus)
    val got = Search.phraseQuery(idx, Seq("hash", "join")).as[Long].collect().toSet
    assert(got == Set(1L, 4L))
    // three-word phrase spans the pairwise joins
    assert(Search.phraseQuery(idx, Seq("sort", "merge", "join"))
      .as[Long].collect().toSet == Set(5L))
    // single-word phrase degenerates to membership
    assert(Search.phraseQuery(idx, Seq("join")).as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 5L))
  }

  test("proximityQuery: within-window both orders, outside-window excluded") {
    val corpus = Seq(
      (1L, "dup near join"),        // distance 2: in at maxDist=2
      (2L, "join dup"),             // distance 1, reversed order: in
      (3L, "dup far far far join"), // distance 4: out
      (4L, "dup only"),
      (5L, "join only")
    ).toDF("doc_id", "text")
    val idx = Search.buildPositionalIndex(corpus)
    val got = Search.proximityQuery(idx, "dup", "join", maxDist = 2)
      .as[Long].collect().toSet
    assert(got == Set(1L, 2L))
    assert(Search.proximityQuery(idx, "dup", "join", maxDist = 4)
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("minShouldMatch spans the AND-OR dial") {
    val idx = Search.buildIndex(docs)
    // 1-of-n = OR, n-of-n = AND, the middle bar sits between
    val or2 = Search.minShouldMatch(idx, Seq("join", "hash"), 1)
      .select("doc_id").as[Long].collect().toSet
    assert(or2 == Set(1L, 2L, 3L, 4L))
    val and2 = Search.minShouldMatch(idx, Seq("join", "hash"), 2)
      .select("doc_id").as[Long].collect().toSet
    assert(and2 == Search.andQuery(idx, Seq("join", "hash")).as[Long].collect().toSet)
    val mid = Search.minShouldMatch(idx, Seq("join", "hash", "merge"), 2)
      .select("doc_id").as[Long].collect().toSet
    assert(mid == Set(1L, 2L, 4L)) // doc2: join+merge; docs 1,4: join+hash
  }

  test("maintainTfIndex: delta-fold equals rebuild-from-scratch") {
    val base = Seq(
      (1L, "join hash join"),
      (2L, "merge sort"),
      (3L, "hash scan filter")
    ).toDF("doc_id", "text")
    val inserted = Seq((4L, "join vector join join")).toDF("doc_id", "text")
    // delete doc 2 entirely (retraction mirrors its indexed text),
    // insert doc 4
    val delta = inserted.withColumn("sign", lit(1L))
      .unionByName(base.filter($"doc_id" === 2L).withColumn("sign", lit(-1L)))
    val folded = Search.maintainTfIndex(Search.buildTfIndex(base), delta)
      .as[(Long, String, Long)].collect().toSet
    val rebuilt = Search.buildTfIndex(
        base.filter($"doc_id" =!= 2L).unionByName(inserted))
      .as[(Long, String, Long)].collect().toSet
    assert(folded == rebuilt)
    // zeroed keys LEAVE the index — no tf=0 tombstones for doc 2
    assert(!folded.exists(_._1 == 2L))
    // and the inserted doc carries its true tf
    assert(folded.contains((4L, "join", 3L)))
  }

  test("maintainTfIndex folds from an EMPTY state, batch-associatively") {
    val corpus = Seq(
      (1L, "join hash join"),
      (2L, "merge sort"),
      (3L, "hash scan filter")
    ).toDF("doc_id", "text")
    val zero = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Search.buildTfIndex(corpus).schema)
    // wave 1: docs 1-2; wave 2: doc 3 inserts, doc 2 retracts
    val w1 = corpus.filter($"doc_id" <= 2L).withColumn("sign", lit(1L))
    val w2 = corpus.filter($"doc_id" === 3L).withColumn("sign", lit(1L))
      .unionByName(corpus.filter($"doc_id" === 2L).withColumn("sign", lit(-1L)))
    val folded = Seq(w1, w2).foldLeft(zero)(Search.maintainTfIndex(_, _))
      .as[(Long, String, Long)].collect().toSet
    val rebuilt = Search.buildTfIndex(corpus.filter($"doc_id" =!= 2L))
      .as[(Long, String, Long)].collect().toSet
    assert(folded == rebuilt)
  }

  test("buildScoredIndex denormalizes dl into every posting; empty docs absent") {
    val scored = Search.buildScoredIndex(docs)
      .as[(Long, String, Long, Long)].collect()
    // doc 1 "spark join hash join": dl=4 on every posting, tf(join)=2
    assert(scored.filter(_._1 == 1L).forall(_._4 == 4L))
    assert(scored.exists(r => r._1 == 1L && r._2 == "join" && r._3 == 2L))
    // the empty doc has no postings at all
    assert(!scored.exists(_._1 == 5L))
  }

  test("bm25Query: pinned exact-integer arithmetic") {
    val corpus = Seq(
      (1L, "rare join"),
      (2L, "join join join join join join join join"),
      (3L, "join x"),
      (4L, "a b c d")
    ).toDF("doc_id", "text")
    // N=4, Σdl=16 → A=(1000·16) div 4 = 4000
    // df(rare)=1 → idf₂ = ⌊log₂((8−2+1) div 3 = 2)⌋ = 1
    // df(join)=3 → idf₂ = ⌊log₂(max((8−6+1) div 7 = 0, 1))⌋ = 0  (stopword floor)
    // doc1: sat(tf=1,dl=2) = (1e6·44·4000) div (80000+24000+36000) = 1257142
    val got = Search.bm25Query(Search.buildScoredIndex(corpus),
        Search.corpusStats(corpus), Seq("rare", "join"), k = 4)
      .as[(Long, Long)].collect()
    assert(got.head == ((1L, 1257142L)), got.toSeq)
    // join-only docs score 0 (idf floored), tie broken by doc_id
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got.tail.forall(_._2 == 0L))
  }

  test("bm25Query: tf saturates and longer documents are penalized") {
    val corpus = Seq(
      (1L, "zeta a"),                                     // tf=1, dl=2
      (2L, "zeta zeta zeta zeta zeta zeta zeta a"),       // tf=7, dl=8
      (3L, "zeta a b c d e f g h i j k l m n o p q r s")  // tf=1, dl=20
    ).toDF("doc_id", "text") union
      (4L to 10L).map(i => (i, "x y")).toDF("doc_id", "text")
    val scores = Search.bm25Query(Search.buildScoredIndex(corpus),
        Search.corpusStats(corpus), Seq("zeta"), k = 10)
      .as[(Long, Long)].collect().toMap
    // more occurrences still win…
    assert(scores(2L) > scores(1L))
    // …but SUBLINEARLY — 7× the tf is far less than 7× the score
    assert(scores(2L) < 7L * scores(1L))
    // same tf, 10× the length → lower score (length normalization)
    assert(scores(1L) > scores(3L))
  }

  test("the term filter reaches the index scan (pushdown-able shape)") {
    val idx = Search.buildIndex(docs)
    val plan = Search.andQuery(idx, Seq("join", "hash"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("tok"), plan)
    // the filter sits below the aggregate, not above it
    assert(plan.indexOf("Aggregate") < plan.indexOf("IN (join,hash)")
      || plan.indexOf("Aggregate") < plan.indexOf("tok#"), plan)
  }
}
