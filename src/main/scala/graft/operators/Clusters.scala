package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair/edge set — the clustering step between
  * "near-dup pairs" (MinHash/SimHash/winnowing output) and "keep one
  * document per duplicate cluster".
  *
  * Algorithm: alternating two-rule STAR CONTRACTION (large-star /
  * small-star — Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14). Each round rewires every node toward the minimum
  * of its neighborhood: large-star hangs every neighbor LARGER than the
  * center onto the neighborhood minimum, small-star re-roots each
  * node's smaller neighbors (and itself) onto that minimum. The edge
  * set contracts toward one star per component (every node → component
  * minimum) in O(log n) rounds — vs O(component diameter) for plain
  * min-label propagation, which put a ~50-round ceiling on one
  * adversarial boilerplate chain. Near-dup graphs are clique-ish
  * (2-3 rounds); the log bound is insurance for the pathological tail.
  *
  * Scale design (100 TB):
  *  - each round is two join+agg passes over the CURRENT edge set,
  *    which only shrinks (distinct-bounded) as components contract —
  *    no label table riding along, the edges ARE the state;
  *  - lineage is truncated each round ([[graft.util.Checkpoints.stage]])
  *    so the plan doesn't grow exponentially with iterations; pass
  *    `checkpointDir` (or set `spark.graft.checkpointDir`) to use a
  *    reliable DFS checkpoint that survives executor loss — mandatory
  *    on a real cluster, where `localCheckpoint` blocks die with the
  *    executor and would kill a 100 TB run mid-iteration;
  *  - convergence = the round's edge set equals its input (count match
  *    + one anti-join probe over already-checkpointed blocks);
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
  def connectedComponents(
      edges: DataFrame,
      src: String = "a",
      dst: String = "b",
      maxIter: Int = 50,
      checkpointDir: Option[String] = None,
      onRound: Int => Unit = _ => ()): DataFrame = {
    val ckptDir = checkpointDir.orElse(
      graft.util.Checkpoints.configured(edges.sparkSession))
    val in = edges.select(col(src).cast("long").as("a"),
      col(dst).cast("long").as("b"))
    // self-loops carry membership but no connectivity: peel their nodes
    // off (self-labeled singletons unless an edge also reaches them)
    val selfIds = in.filter(col("a") === col("b")).select("a").distinct()

    // large-star: hang every neighbor LARGER than the center onto the
    // neighborhood minimum (center included) — strictly decreasing
    // attachment, halves long chains
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy("a").agg(min(col("b")).as("mb"))
        .select(col("a"), least(col("a"), col("mb")).as("m"))
      sym.join(mins, "a").filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .distinct()
    }
    // small-star: re-root each center's smaller neighbors (and the
    // center itself) onto its minimum
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("a"), col("b")).as("a"),
          least(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b"))
      val mins = dir.groupBy("a").agg(min(col("b")).as("m"))
      dir.join(mins, "a")
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .union(mins.select(col("a"), col("m").as("b")))
        .distinct()
    }

    var cur = graft.util.Checkpoints.stage(
      in.filter(col("a") =!= col("b")).distinct(), ckptDir)
    var curN = cur.count()
    var converged = curN == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = graft.util.Checkpoints.stage(
        smallStar(largeStar(cur)), ckptDir)
      val nextN = next.count()
      // fixpoint: both rules leave a forest of component stars alone —
      // equal counts plus an empty one-sided anti-join pins set
      // equality over the two checkpointed rounds
      converged = nextN == curN &&
        next.join(cur, Seq("a", "b"), "left_anti").isEmpty
      cur = next; curN = nextN
      iter += 1
      onRound(iter)
    }
    // labels: children point at their star root; roots (only ever on
    // the b side at fixpoint) label themselves. min() collapses the
    // multi-parent edges a maxIter-truncated run can still carry, so
    // the output is one row per node at ANY cut point.
    val children = cur.groupBy(col("a").as("id"))
      .agg(min(col("b")).as("cluster"))
    val roots = cur.select(col("b").as("id")).distinct()
      .join(children.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster"))
    val lone = selfIds.select(col("a").as("id"))
      .join(children.select("id").union(roots.select("id")),
        Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster"))
    children.union(roots).union(lone)
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
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val len = docs.select(col(idCol).as("id"),
      length(col(textCol)).cast("long").as("n_chars"))
    val members = clusters.join(len, "id")
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
