package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class CosineSimExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")

  test("fused cosine is bit-identical to the functions._ composition") {
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("q"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        $"vec_id",
        VectorFunctions.cosine($"embedding", $"q").as("slow"),
        VectorFunctions.cosineFused($"embedding", $"q").as("fast"))
    // index-order accumulation on both paths → exact double equality
    assert(both.filter($"slow" =!= $"fast").count() == 0)
  }

  test("nulls and zero vectors") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (2L, Array(0.0f, 0.0f), Array(1.0f, 2.0f))
    ).toDF("id", "a", "b")
    val out = df.select($"id", VectorFunctions.cosineFused($"a", $"b").as("c"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(out(2L) == 0.0)
    val withNull = df.withColumn("a", when($"id" === 1, $"a"))
      .select(VectorFunctions.cosineFused($"a", $"b").as("c"))
    assert(withNull.filter($"c".isNull).count() == 1)
  }

  test("expression codegen compiles (no fallback)") {
    // AQE wraps unexecuted plans in AdaptiveSparkPlan, which reports zero
    // codegen subtrees before execution — disable it for the inspection.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = emb.filter($"vec_id" === 0).select($"embedding".as("q"))
      val df = emb.crossJoin(broadcast(q))
        .select(VectorFunctions.cosineFused($"embedding", $"q").as("c"))
      val codegen = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!codegen.contains("Found 0 WholeStageCodegen"), codegen.take(300))
      // the generated code must contain our fused loop, not a fallback call
      assert(codegen.contains("Math.sqrt"), "fused loop missing from generated code")
      assert(df.agg(sum("c")).head().getDouble(0) != 0.0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
