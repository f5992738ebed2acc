package graft.operators

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
