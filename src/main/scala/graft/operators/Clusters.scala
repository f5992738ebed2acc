package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair/edge set — the clustering step between
  * "near-dup pairs" (MinHash/SimHash/winnowing output) and "keep one
  * document per duplicate cluster".
  *
  * Algorithm: STAGED ESCALATION. Phase 1 is plain min-label
  * propagation (each node takes the minimum label in its closed
  * neighborhood) for a few cheap rounds — near-dup components are
  * clique-ish with diameter 2-3, so the common case converges here at
  * one join+agg per round. If propagation has not converged by the
  * escalation bound, phase 2 CONTRACTS the graph by the partial labels
  * (a component-preserving quotient — every label is a reachable id)
  * and runs alternating two-rule STAR CONTRACTION (large-star /
  * small-star — Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) on the much smaller quotient: O(log n) rounds vs
  * the O(component diameter) that put a ~50-round ceiling on one
  * adversarial boilerplate chain. The composed label (node → partial
  * label → quotient star root) is the component minimum, because the
  * minimum id of a component is always its own label and hence a
  * quotient node.
  *
  * Scale design (100 TB):
  *  - a phase-1 round is ONE shuffle (neighbor-min join + map-side
  *    combinable min agg); a phase-2 round is two join+agg passes over
  *    the quotient edge set, which only shrinks as components
  *    contract;
  *  - lineage is truncated each round ([[graft.util.Checkpoints.stage]])
  *    so the plan doesn't grow exponentially with iterations; pass
  *    `checkpointDir` (or set `spark.graft.checkpointDir`) to use a
  *    reliable DFS checkpoint that survives executor loss — mandatory
  *    on a real cluster, where `localCheckpoint` blocks die with the
  *    executor and would kill a 100 TB run mid-iteration;
  *  - phase-2 convergence = the round's edge set IS a star forest,
  *    detected by shape in one fused role-count job over the
  *    just-checkpointed round — no extra confirm round;
  *  - the output is O(|nodes in any edge|), not O(|corpus|):
  *    singleton documents never enter the graph and need no label.
  */
object Clusters {

  /** Labels every node that appears in `edges` with the smallest node id
    * reachable from it. Output columns: `id`, `cluster`.
    *
    * @param edges   DataFrame with two node-id columns (any orientation,
    *                duplicates fine)
    * @param src     name of the first endpoint column
    * @param dst     name of the second endpoint column
    * @param maxIter safety bound on propagation rounds (components wider
    *                than this many hops keep a non-minimal label)
    * @param checkpointDir reliable checkpoint root for the per-round
    *                lineage cut; `None` (default) falls back to the
    *                session conf `spark.graft.checkpointDir`, then to
    *                `localCheckpoint` (local runs only — blocks are
    *                lost on executor death)
    * @param onRound called with the round number after each completed
    *                propagation round — the failure-injection hook the
    *                executor-loss drill uses to kill an executor
    *                mid-run (ClusterFailureSpec); default no-op
    */
  /** @param onQuotient called with (round, edge-count, internal-node
    *                count) after each phase-2 star-contraction round,
    *                riding the SAME fused role-count job the
    *                convergence check already runs (zero extra cost).
    *                Edge count stays ~n by construction (every
    *                non-root keeps exactly one parent edge — star
    *                contraction shrinks DEPTH, not edges); the
    *                contraction invariant is the INTERNAL-node count
    *                (nodes that are both child and root), which
    *                strictly falls to 0 at the star forest — the
    *                shuffle audit pins that claim per round
    */
  def connectedComponents(
      edges: DataFrame,
      src: String = "a",
      dst: String = "b",
      maxIter: Int = 50,
      checkpointDir: Option[String] = None,
      onRound: Int => Unit = _ => (),
      onQuotient: (Int, Long, Long) => Unit = (_, _, _) => ()): DataFrame = {
    val ckptDir = checkpointDir.orElse(
      graft.util.Checkpoints.configured(edges.sparkSession))
    // no cast: every rule below is pure order algebra (min/least/
    // greatest/comparisons), so any orderable id type — long doc ids,
    // string/UUID keys — works as-is, same contract as before the
    // star-contraction rewrite
    val in = edges.select(col(src).as("a"), col(dst).as("b"))
    // ONE evaluation of the (possibly expensive) edge pipeline: sym is
    // the persisted universe every phase reads — self-loops ride along
    // harmlessly (their nodes enter the label table; they add no
    // connectivity and the phase-2 quotient filters them)
    val sym = in.union(in.select(col("b").as("a"), col("a").as("b")))
      .persist()

    // ---- phase 1: min-label propagation (diameter-bounded, cheap) ----
    // the escalation bound: enough for the clique-ish components that
    // dominate near-dup graphs, small enough that a pathological chain
    // wastes almost nothing before phase 2 takes over
    val escalateAfter = math.min(4, maxIter)
    var labels = graft.util.Checkpoints.stage(
      sym.select(col("a").as("id")).distinct()
        .withColumn("cluster", col("id")),
      ckptDir)
    var changed = 1L
    var iter    = 0
    while (changed > 0 && iter < escalateAfter) {
      val nbrMin = sym.join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid"))
        .agg(min(col("cluster")).as("nbr_min"))
      val stepped = graft.util.Checkpoints.stage(
        labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
          .select(col("id"), col("cluster").as("old"),
            least(col("cluster"),
              coalesce(col("nbr_min"), col("cluster"))).as("cluster")),
        ckptDir)
      changed = stepped.filter(col("cluster") < col("old")).count()
      labels = stepped.select("id", "cluster")
      iter += 1
      onRound(iter)
    }

    if (changed > 0 && iter < maxIter) {
      // ---- phase 2: star contraction on the label QUOTIENT ----
      // quotient edges (label_a, label_b) per original edge: a
      // component-preserving contraction, and already ~4 hops coarser
      // than the input after phase 1
      val la = labels.select(col("id").as("a"), col("cluster").as("qa"))
      val lb = labels.select(col("id").as("b"), col("cluster").as("qb"))
      // built from the PERSISTED sym (both directions — smallStar
      // canonicalizes), so phase 2 never re-evaluates the edge pipeline
      val quotient = sym.join(la, "a").join(lb, "b")
        .select(col("qa").as("a"), col("qb").as("b"))
        .filter(col("a") =!= col("b"))

      def largeStar(g: DataFrame): DataFrame = {
        val gsym = g.union(g.select(col("b").as("a"), col("a").as("b")))
        val mins = gsym.groupBy("a").agg(min(col("b")).as("mb"))
          .select(col("a"), least(col("a"), col("mb")).as("m"))
        // no intermediate distinct: smallStar consumes this within the
        // round and dedups its own output
        gsym.join(mins, "a").filter(col("b") > col("a"))
          .select(col("b").as("a"), col("m").as("b"))
      }
      def smallStar(g: DataFrame): DataFrame = {
        val dir = g.select(greatest(col("a"), col("b")).as("a"),
            least(col("a"), col("b")).as("b"))
          .filter(col("a") =!= col("b"))
        val mins = dir.groupBy("a").agg(min(col("b")).as("m"))
        dir.join(mins, "a")
          .select(col("b").as("a"), col("m").as("b"))
          .filter(col("a") =!= col("b"))
          .union(mins.select(col("a"), col("m").as("b")))
          .distinct()
      }
      // star forest ⟺ every child has exactly one parent AND no node
      // is both child and root — ONE fused role-count job over the
      // just-checkpointed round, and the moment it holds the roots are
      // the component minima (both rules attach larger onto smaller and
      // preserve components)
      def starForest(g: DataFrame, round: Int): Boolean = {
        val firstRow = g
          .select(col("a").as("id"), lit(1L).as("c"), lit(0L).as("r"))
          .union(g.select(col("b").as("id"), lit(0L).as("c"), lit(1L).as("r")))
          .groupBy("id").agg(sum(col("c")).as("c"), max(col("r")).as("r"))
          .agg(coalesce(max(col("c")), lit(0L)).as("maxc"),
            coalesce(max(when(col("c") > 0 && col("r") > 0, 1L)
              .otherwise(0L)), lit(0L)).as("both"),
            // free per-round telemetry in the SAME job: edge count
            // (each edge contributes its child row once) and the
            // INTERNAL-node count — the quantity contraction drives
            // to 0
            coalesce(sum(col("c")), lit(0L)).as("edges"),
            coalesce(sum(when(col("c") > 0 && col("r") > 0, 1L)
              .otherwise(0L)), lit(0L)).as("internal"))
          .head()
        onQuotient(round, firstRow.getLong(2), firstRow.getLong(3))
        firstRow.getLong(0) <= 1L && firstRow.getLong(1) == 0L
      }

      var cur = graft.util.Checkpoints.stage(smallStar(quotient), ckptDir)
      iter += 1
      onRound(iter)
      var converged = starForest(cur, iter)
      while (!converged && iter < maxIter) {
        val next = graft.util.Checkpoints.stage(
          smallStar(largeStar(cur)), ckptDir)
        iter += 1
        onRound(iter)
        converged = starForest(next, iter)
        cur = next
      }
      // quotient labels in ONE aggregation (children → parent, roots →
      // themselves; min collapses the multi-parent edges a truncated
      // run can still carry), then compose back onto the phase-1
      // labels: node → partial label → quotient star root
      val qLabels = cur.select(col("a").as("qid"), col("b").as("qcluster"))
        .union(cur.select(col("b").as("qid"), col("b").as("qcluster")))
        .groupBy("qid").agg(min(col("qcluster")).as("qcluster"))
      labels = labels.join(qLabels, labels("cluster") === qLabels("qid"), "left")
        .select(col("id"),
          coalesce(col("qcluster"), col("cluster")).as("cluster"))
    }
    sym.unpersist()
    labels
  }

  /** Canonical-document selection — the dedup ACTION a cluster table
    * exists for: within every near-dup cluster keep the member with the
    * most text (`length(text)` DESC, id ASC tie-break — "longest wins"
    * is the standard near-dup policy: truncated mirrors and snippet
    * copies lose to the full document), and emit the per-member verdict
    * `(id, cluster, keep_id, kept)` a downstream anti-join or audit
    * table consumes.
    *
    * Scale shape: `clusters` holds only documents that appear in a dup
    * pair (≪ corpus — singletons never enter the graph); the text
    * column collapses to an `(id, n_chars)` projection before anything
    * shuffles, so the id-keyed join moves count-width rows, the
    * ranking window is PARTITIONED by cluster (bounded clique-ish
    * groups, never a global sort), and the keep-list joins back
    * cluster-keyed at cluster-count cardinality.
    */
  def canonicalize(
      clusters: DataFrame,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    canonicalizeByLen(clusters,
      docs.select(col(idCol).as("id"),
        length(col(textCol)).cast("long").as("n_chars")))

  /** [[canonicalize]] from a precomputed `(id, n_chars)` length table —
    * for callers that already carried the text length out of an earlier
    * single pass over the corpus (e.g. alongside the MinHash
    * signatures), so ranking does not re-scan the text column at all.
    */
  def canonicalizeByLen(
      clusters: DataFrame,
      lens: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val members = clusters.join(lens, "id")
    val w = Window.partitionBy("cluster")
      .orderBy(col("n_chars").desc, col("id").asc)
    val keep = members.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("cluster"), col("id").as("keep_id"))
    members.join(keep, "cluster")
      .select(col("id"), col("cluster"), col("keep_id"),
        (col("id") === col("keep_id")).cast("long").as("kept"))
  }

  /** Near-dup removal keep-list: for every node in the pair graph that is
    * NOT its cluster's minimum, emit one row (`doc_id`) — the documents a
    * dedup pass drops. Anti-join the corpus against this to keep exactly
    * one representative per duplicate cluster (plus all singletons, which
    * never enter the graph).
    */
  def duplicatesToDrop(
      pairs: DataFrame,
      src: String = "doc_a",
      dst: String = "doc_b",
      checkpointDir: Option[String] = None): DataFrame =
    connectedComponents(pairs, src, dst, checkpointDir = checkpointDir)
      .filter(col("cluster") < col("id"))
      .select(col("id").as("doc_id"))
}
