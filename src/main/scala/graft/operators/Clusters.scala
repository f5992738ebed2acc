package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair/edge set — the clustering step between
  * "near-dup pairs" (MinHash/SimHash/winnowing output) and "keep one
  * document per duplicate cluster".
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the minimum of its own
  * label and its neighbors' labels; fixpoint = each component labeled by
  * its smallest member id. This is the classic BSP formulation (Pregel /
  * GraphX `connectedComponents` use the same propagation); rounds are
  * bounded by the component diameter, and near-dup graphs are
  * low-diameter (clusters are clique-ish), so 2-4 rounds is typical.
  *
  * Scale design (100 TB):
  *  - each round is ONE shuffle: an equi-join of the (symmetrized) edge
  *    set with the current labels on the neighbor id, then a map-side
  *    combinable `min` aggregation on the node id;
  *  - the edge set is persisted once and reused every round;
  *  - lineage is truncated each round ([[graft.util.Checkpoints.stage]])
  *    so the plan doesn't grow exponentially with iterations; pass
  *    `checkpointDir` (or set `spark.graft.checkpointDir`) to use a
  *    reliable DFS checkpoint that survives executor loss — mandatory
  *    on a real cluster, where `localCheckpoint` blocks die with the
  *    executor and would kill a 100 TB run mid-iteration;
  *  - convergence is detected with a `count` of changed labels — one
  *    cheap action per round on data that is already cached;
  *  - the label table is O(|nodes in any edge|), not O(|corpus|):
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
    val e = edges.select(col(src).as("a"), col(dst).as("b"))
    // symmetrize once so propagation flows both directions
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b"))).persist()
    var labels = graft.util.Checkpoints.stage(
      sym.select(col("a").as("id")).distinct()
        .withColumn("cluster", col("id")),
      ckptDir)
    var changed = 1L
    var iter    = 0
    while (changed > 0 && iter < maxIter) {
      // min label among each node's neighbors (map-side combinable)
      val nbrMin = sym.join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid"))
        .agg(min(col("cluster")).as("nbr_min"))
      // checkpoint FIRST (the round's one real materialization — also
      // truncates lineage), then run the convergence count against the
      // checkpointed blocks: cheaper than the previous
      // persist → count → checkpoint-from-cache double pass, and no
      // cache bookkeeping
      val stepped = graft.util.Checkpoints.stage(
        labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
          .select(col("id"), col("cluster").as("old"),
            least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("cluster")),
        ckptDir)
      changed = stepped.filter(col("cluster") < col("old")).count()
      labels = stepped.select("id", "cluster")
      iter += 1
      onRound(iter)
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
