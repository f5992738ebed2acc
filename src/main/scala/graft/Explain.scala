package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan inspection: `runMain graft.Explain [sfDir] [query...]` prints the
  * formatted plan of each named query (default: a representative set).
  * The review loop for "is this the plan I'd want at 100 TB": check
  * PushedFilters, ReadSchema, broadcast vs sort-merge, WholeStageCodegen
  * spans, partial aggregation.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_pricing_summary", "q03_nation_revenue", "q15_bbox_parts",
        "q20_fingerprint_dedup", "q22_cosine_topk", "q23_minhash_pairs",
        "q50_asof_native", "q52_salted_join", "q53_range_join",
        "q57_hll_distinct", "q63_jaccard_prefix", "q66_seq_pack",
        "q68_ann_int8")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.install(spark)
    for (n <- names) {
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
