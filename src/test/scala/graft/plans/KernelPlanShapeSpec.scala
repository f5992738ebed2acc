package graft.plans

import org.apache.spark.sql.catalyst.expressions.LambdaFunction
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, RepartitionByExpression}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Plan-shape regression guards for the two pathologies that serialized
  * text kernels onto the scan partition (round 6):
  *
  *  1. a bare `repartition(col)` is an AQE coalescing target and folds
  *     back to one partition — the distribute-the-kernel exchange must
  *     carry an EXPLICIT partition count;
  *  2. `explode`'s inferred `size(...) > 0` filter sinks below the
  *     staging projects and the exchange by alias substitution,
  *     re-running the whole array build (with the tokenizer inlined at
  *     every n-gram position) per row in the scan stage. The operators
  *     use `explode_outer` + a post-Generate isNotNull instead, so no
  *     lambda-bearing filter may appear under the repartition.
  *
  * These assert on the OPTIMIZED logical plan — the shape that actually
  * executes — so a Catalyst rule change or operator edit that
  * reintroduces either pathology fails here, not in a benchmark.
  */
class KernelPlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "aa bb cc dd ee ff gg hh"),
    (2L, "aa bb cc dd ee xx yy zz"),
    (3L, "one two three four five six seven")
  ).toDF("doc_id", "text")

  /** All nodes strictly below any RepartitionByExpression. */
  private def belowRepartition(plan: LogicalPlan): Seq[LogicalPlan] =
    plan.collect { case r: RepartitionByExpression => r.child.collect { case n => n } }.flatten

  private def hasLambdaFilter(nodes: Seq[LogicalPlan]): Boolean =
    nodes.exists {
      case f: Filter => f.condition.exists(_.isInstanceOf[LambdaFunction])
      case _         => false
    }

  test("kernel repartitions carry an explicit partition count (AQE-proof)") {
    for ((name, df) <- Seq(
        "minhash sig"   -> Dedup.minhashSignaturesPortable(docs, 3, 8),
        "contamination" -> Dedup.contaminationReport(docs.filter($"doc_id" > 1),
          docs.filter($"doc_id" === 1), n = 3),
        // the kernel half: the pair fn stages it, so the returned plan
        // would only show the staged RDD scan
        "winnow pairs"  -> Dedup.winnowPrunedFps(docs))) {
      val reps = df.queryExecution.optimizedPlan.collect {
        case r: RepartitionByExpression => r
      }
      assert(reps.nonEmpty, s"$name: expected a kernel-distribution repartition")
      assert(reps.forall(_.optNumPartitions.nonEmpty),
        s"$name: repartition without an explicit count is AQE-coalescible back to 1 partition")
    }
  }

  test("no lambda-bearing filter sinks below the kernel repartition") {
    for ((name, df) <- Seq(
        "minhash sig"   -> Dedup.minhashSignaturesPortable(docs, 3, 8),
        "minhash pairs" -> Dedup.minhashNearDupPairsPortable(docs),
        "contamination" -> Dedup.contaminationReport(docs.filter($"doc_id" > 1),
          docs.filter($"doc_id" === 1), n = 3),
        "winnow pairs"  -> Dedup.winnowPrunedFps(docs))) {
      val under = belowRepartition(df.queryExecution.optimizedPlan)
      assert(!hasLambdaFilter(under),
        s"$name: a higher-order-function filter was pushed below the distribution " +
          "exchange — the inferred explode filter is re-running the array build on " +
          "the scan partition")
    }
  }

  test("staged tokens: the n-gram lambda slices an attribute, not a re-split") {
    // the shingle Project must reference the token attribute inside its
    // lambda; a `split` inside any LambdaFunction means the tokenizer
    // is re-run at every n-gram position (O(tokens^2) per row)
    val plan = Dedup.minhashSignaturesPortable(docs, 3, 8).queryExecution.optimizedPlan
    val lambdaSplits = plan.expressions.flatMap(_.collect {
      case l: LambdaFunction => l.collect {
        case e if e.prettyName == "split" => e
      }
    }.flatten)
    assert(lambdaSplits.isEmpty,
      "tokenizer inlined into an n-gram lambda — stage TextFunctions.loweredTokens first")
  }
}
