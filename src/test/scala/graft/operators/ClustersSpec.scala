package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels planted components with their min id") {
    // component {1,2,3,4} as a 3-hop chain (forces multi-round propagation),
    // component {10,11}, plus a reversed and a duplicate edge
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (3L, 4L))
      .toDF("a", "b")
    val labels = Clusters.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents converges past 2 hops and respects maxIter") {
    // a 6-node path: label 1 needs 5 propagation rounds to reach node 6
    val path = (1L to 5L).map(i => (i, i + 1)).toDF("a", "b")
    val full = Clusters.connectedComponents(path).as[(Long, Long)].collect().toMap
    assert(full.values.toSet == Set(1L), s"path graph must collapse to one label: $full")
    // with maxIter=1 the far end cannot have received label 1 yet
    val truncated = Clusters.connectedComponents(path, maxIter = 1)
      .as[(Long, Long)].collect().toMap
    assert(truncated(2L) == 1L)
    assert(truncated(6L) != 1L, "one round cannot propagate 5 hops")
  }

  test("an adversarial 200-hop chain converges in O(log n) rounds, not O(diameter)") {
    // the boilerplate-spam shape that put a 50-round (maxIter) ceiling
    // on min-label propagation: a single long chain. Star contraction
    // halves the structure every round — 200 hops must fully collapse
    // well inside the default round budget, where label propagation
    // would have needed 199 rounds and silently truncated at 50.
    val chain = (1L to 199L).map(i => (i, i + 1)).toDF("a", "b")
    var rounds = 0
    val qEdges    = scala.collection.mutable.ArrayBuffer.empty[Long]
    val qInternal = scala.collection.mutable.ArrayBuffer.empty[Long]
    val labels = Clusters.connectedComponents(chain,
        onRound = r => rounds = r,
        onQuotient = (_, e, i) => { qEdges += e; qInternal += i })
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 200 && labels.values.toSet == Set(1L),
      s"chain must collapse to one component: ${labels.values.toSet}")
    assert(rounds <= 14, s"expected O(log n) rounds, took $rounds")
    // the CONTRACTION claim itself: edge count stays ~n by construction
    // (every non-root keeps one parent edge), but the INTERNAL-node
    // count — the graph's remaining depth mass — must strictly shrink
    // every star round and hit 0 exactly at the forest. A plateau
    // would mean the two-rule alternation stopped contracting and the
    // O(log n) bound is luck, not structure.
    assert(qInternal.size >= 2, s"escalation must have run: $qInternal")
    qInternal.sliding(2).foreach { w =>
      assert(w(1) < w(0),
        s"internal-node count must shrink per round: $qInternal")
    }
    assert(qInternal.last == 0L,
      s"the final round must be a star forest (0 internal): $qInternal")
    assert(qEdges.forall(_ <= 200L),
      s"a forestward quotient never exceeds n-1-ish edges: $qEdges")
  }

  test("connectedComponents on an empty edge set returns no labels") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Clusters.connectedComponents(empty).count() == 0L)
  }

  test("connectedComponents stays type-agnostic: string/UUID node ids") {
    // the documented contract ("two node-id columns, any orientation")
    // has no numeric restriction — every rule is order algebra, so
    // string keys must label with the LEXICOGRAPHIC component minimum.
    // Includes a chain long enough to cross into the star-contraction
    // phase so both phases run on strings.
    val chain = (1 to 12).map(i => (f"doc-$i%03d", f"doc-${i + 1}%03d"))
    val edges = (chain :+ (("uuid-b", "uuid-a"))).toDF("a", "b")
    val labels = Clusters.connectedComponents(edges)
      .as[(String, String)].collect().toMap
    assert(labels("doc-013") == "doc-001", s"chain min: $labels")
    assert(labels("uuid-a") == "uuid-a" && labels("uuid-b") == "uuid-a")
    assert(labels.size == 15)
  }

  test("duplicatesToDrop keeps exactly the cluster minima") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val drops = Clusters.duplicatesToDrop(pairs).as[Long].collect().toSet
    assert(drops == Set(2L, 3L, 11L))
  }

  test("canonicalize: longest member wins its cluster, min id breaks ties") {
    val docs = Seq(
      (1L, "short"), (2L, "the longest one"), (3L, "medium!"), // cluster 1
      (10L, "same len"), (11L, "same len")                     // cluster 10: tie
    ).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster")
    val got = Clusters.canonicalize(clusters, docs)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    // cluster 1: doc 2 (15 chars) beats 3 (7) and 1 (5); cluster 10:
    // equal lengths → lower id 10 wins the tie
    assert(got == Seq((1L, 1L, 2L, 0L), (2L, 1L, 2L, 1L), (3L, 1L, 2L, 0L),
      (10L, 10L, 10L, 1L), (11L, 10L, 10L, 0L)))
    // exactly one kept member per cluster — the invariant an anti-join
    // dedup pass depends on
    val perCluster = Clusters.canonicalize(clusters, docs)
      .groupBy("cluster").agg(sum("kept").as("n")).as[(Long, Long)].collect().toMap
    assert(perCluster.values.forall(_ == 1L))
  }

  test("nearDedup keeps one survivor per cluster and all singletons") {
    val corpus = Seq(
      (1L, "a"), (2L, "a'"), (3L, "a''"), // one near-dup cluster
      (10L, "b"), (11L, "b'"),            // another
      (50L, "unique")                     // singleton — never in the pair graph
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val deduped = Dedup.nearDedup(corpus, pairs)
    val kept = deduped.select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 10L, 50L)))
    // idempotent: re-running on the deduped corpus with the ORIGINAL
    // pair set drops nothing further — every non-minimum member is
    // already gone, and survivors 1 and 10 share no pair
    val again = Dedup.nearDedup(deduped, pairs).select("doc_id").as[Long].collect().sorted
    assert(again.sameElements(kept))
  }
}
