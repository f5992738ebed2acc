package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse the rankings of independent retrievers over
  * the same corpus — canonically a lexical leg ([[Search]]) and a
  * vector leg ([[Similarity]]) — with Reciprocal Rank Fusion
  * (Cormack, Clarke & Büttcher, SIGIR 2009):
  *
  *   fused(d) = Σ_legs 1 / (k₀ + rank_leg(d)),  k₀ = 60
  *
  * RRF is the standard first fusion because it needs NO score
  * calibration: each leg contributes only through its rank, so a
  * BM25 score and a cosine live on incomparable scales yet fuse
  * soundly. Realized in exact integers — `scale div (k₀ + rank)` —
  * so the fused ranking is bit-reproducible by a SQL oracle.
  *
  * Scale shape: each leg is already a TOP-K LIST (TakeOrdered output,
  * ≤ k rows by construction — the legs do the 100 TB work with their
  * own scale arguments); fusion ranks and merges O(legs·k) rows. The
  * unpartitioned rank windows here are bounded by that k, not by the
  * corpus (PlanAuditSpec allowlists them with this justification).
  */
object Hybrid {

  /** Fuse ranked legs. Each leg must be a bounded top-k list carrying
    * `idCol` and `ordCol` (higher = better; ties break on `idCol`
    * ascending — each leg's own total-order contract). Emits the
    * fused top-`topK`: (id, rrf, n_legs), where `n_legs` counts the
    * legs that retrieved the document — the agreement diagnostic
    * (found by both ≫ found by one).
    */
  def rrfFuse(
      legs: Seq[DataFrame],
      idCol: String,
      ordCol: String,
      topK: Int,
      k0: Int = 60,
      scale: Long = 1000000L): DataFrame = {
    require(legs.nonEmpty, "at least one ranked leg required")
    require(topK >= 1, s"topK must be positive, got $topK")
    val contribs = legs.map { leg =>
      // ≤ k rows by the leg contract — this window never sees the corpus
      val w = Window.orderBy(col(ordCol).desc, col(idCol))
      leg.select(col(idCol), col(ordCol))
        .withColumn("_r", row_number().over(w))
        .select(col(idCol), expr(s"${scale}L div ($k0 + _r)").as("_rrf"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum("_rrf").as("rrf"), count(lit(1)).as("n_legs"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}
