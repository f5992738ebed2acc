package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic negative sampling for contrastive training — pair
  * every anchor document with k pseudo-random negatives drawn from the
  * corpus, EXCLUDING same-group candidates (same source/domain rows are
  * potential positives, the standard in-batch-negative contamination
  * guard). No RNG: candidate j of an anchor is the Carter–Wegman affine
  * `affine_j(md5_32("neg:" || id)) mod N` ([[PortableHash]]), so the
  * sample is reproducible cross-engine, stable across runs, and
  * re-runnable per epoch by changing the salt — the [[Sampling]]
  * determinism contract applied to pair construction.
  *
  * Candidates that miss (no such id), hit the anchor itself, or land in
  * the anchor's own group are DROPPED, not re-rolled: re-rolling is a
  * sequential loop an engine cannot express as one pass, and a slightly
  * variable k-per-anchor is what every large-scale contrastive pipeline
  * accepts in exchange (callers oversample k for a target count).
  *
  * Scale shape: candidate generation is a per-row projection (k rows
  * out per anchor, map-side); resolving negatives is ONE hash equi-join
  * of (cand_id) against the (id, group) projection — the corpus never
  * sees a cross join, and the only broadcast is the one-row count
  * (q42 shape).
  */
object Contrastive {

  /** (idCol, j, neg_id) for k deterministic negatives per anchor;
    * output is unique per (anchor, j). */
  def negativeSamples(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      k: Int,
      salt: String = "neg"): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    val n = docs.agg(count(lit(1)).as("_n"))
    val consts = PortableHash.affineConstants(7L, k)
    val anchors = docs
      .select(col(idCol), col(groupCol).as("_grp"),
        PortableHash.md5Hex32(
          concat(lit(salt), lit(":"), col(idCol).cast("string"))).as("_h"))
      .crossJoin(broadcast(n)) // one-row corpus size (q42 shape)
    val cands = anchors.select(
      col(idCol), col("_grp"),
      posexplode(array(consts.map(ab =>
        PortableHash.affine(col("_h"), ab) % col("_n")): _*)).as(Seq("j", "_cand")))
    val negs = docs.select(col(idCol).as("neg_id"), col(groupCol).as("_negGrp"))
    cands
      .join(negs, col("_cand") === col("neg_id"))
      .filter(col("_negGrp") =!= col("_grp") && col("neg_id") =!= col(idCol))
      .select(col(idCol), col("j").cast("long").as("j"), col("neg_id"))
  }
}
