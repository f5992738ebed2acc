package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Global plan audit over EVERY driver query: an unpartitioned window
  * (`Window.orderBy` with no partition key) drags all rows through one
  * task — the classic 100 TB scale-killer that local tests never feel.
  * The only sanctioned instance is q66's bucket-totals window, which by
  * construction consumes 1/blockSize of the corpus (PackingSpec pins
  * its exact shape). Any new query that introduces one must either
  * restructure (two-level scan, partitioned window) or argue its way
  * into the allowlist here.
  */
class PlanAuditSpec extends SparkSpec {

  private val allowedUnpartitionedWindows = Map(
    "q66_seq_pack" -> 1, // two-level prefix sum: window over bucket totals
    "q123_corpus_prep" -> 1, // same concatPack two-level prefix sum
    "q83_curriculum_shards" -> 1, // same idiom: window over (score, sub-bucket) totals
    "q103_budget_select" -> 1, // same idiom: weight prefix sum over bucket totals
    "q85_stratified_exact" -> 1, // remainder rank over the O(#strata) quota table
    // RRF rank windows run over TakeOrdered top-k LISTS (≤20 rows by
    // construction) — bounded by the query k, never by the corpus
    "q97_hybrid_rrf" -> 2
  )

  test("no query has an unsanctioned unpartitioned window") {
    graft.plans.GraftExtensions.install(spark)
    val sfDir = sf("sf0.001")
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }.size
      if (n > allowedUnpartitionedWindows.getOrElse(name, 0)) Some(name -> n) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned global windows (single-task at scale): $offenders")
  }
}
