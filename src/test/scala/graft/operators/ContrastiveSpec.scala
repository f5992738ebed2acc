package graft.operators

import graft.SparkSpec

class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "web"), (1L, "web"), (2L, "wiki"), (3L, "wiki"), (4L, "books"),
    (5L, "books"), (6L, "web"), (7L, "wiki"), (8L, "books"), (9L, "web")
  ).toDF("doc_id", "source")

  test("negatives never share the anchor's group and never equal the anchor") {
    val out = Contrastive.negativeSamples(docs, "doc_id", "source", k = 4)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val srcOf = docs.as[(Long, String)].collect().toMap
    out.foreach { case (anchor, _, neg) =>
      assert(neg != anchor, s"self-negative for $anchor")
      assert(srcOf(neg) != srcOf(anchor), s"same-group negative $neg for $anchor")
    }
    // at most k per anchor, (anchor, j) unique
    val byAnchor = out.groupBy(_._1)
    assert(byAnchor.values.forall(_.length <= 4))
    assert(out.map(r => (r._1, r._2)).distinct.length == out.length)
  }

  test("the sample is deterministic and partition-independent") {
    val a = Contrastive.negativeSamples(docs, "doc_id", "source", 4)
      .as[(Long, Long, Long)].collect().toSet
    val b = Contrastive.negativeSamples(docs.repartition(7), "doc_id", "source", 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("a different salt draws a different (still valid) sample") {
    val a = Contrastive.negativeSamples(docs, "doc_id", "source", 4)
      .as[(Long, Long, Long)].collect().toSet
    val b = Contrastive.negativeSamples(docs, "doc_id", "source", 4, salt = "neg-epoch2")
      .as[(Long, Long, Long)].collect().toSet
    assert(a != b, "salts must give independent probe sequences")
  }
}
