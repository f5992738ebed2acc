package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Temperature-weighted source mixing — the mixture-rebalancing step of
  * a pretraining data pipeline (split → MIX → pack → chunk): flatten a
  * skewed source/language distribution toward uniform by keeping source
  * s with share ∝ n_s^(1/T), the standard multilingual-pretraining
  * reweighting (temperature sampling as in XLM-R / mT5; T=1 keeps the
  * natural distribution, T→∞ is uniform). This engine fixes T=2 —
  * sqrt weights — because 2 is the common practical choice AND it is
  * the temperature whose reweighting has an EXACT integer form (isqrt),
  * so the whole operator stays bit-reproducible by an external SQL
  * oracle (the same exactness contract as [[Sampling]]).
  *
  * Downsampling-only (no row duplication): the smallest source is kept
  * in full and every larger source is thinned to
  * `kept_s ≈ isqrt(n_s·n_min)`, which makes kept shares ∝ √n_s with
  * the max acceptance rate exactly 1000‰.
  *
  * Exactness: acceptance is a pure function of (salt, id) — an md5
  * permille bucket compared to a per-source integer threshold — and the
  * threshold is exact integer arithmetic: [[isqrt]] corrects
  * floor(sqrt(double)) by one where t·t > x, so a last-ulp sqrt
  * difference between engines cannot flip a threshold; the rate is
  * `(1000·isqrt(n_s·n_min)) div n_s` (integer division both sides).
  * Determinism is the same property that matters for [[Sampling]]:
  * re-running on a grown corpus re-derives rates but keeps each
  * surviving row's acceptance stable for a fixed rate.
  *
  * Scale shape: one groupBy on the source column reduces the corpus to
  * O(#sources) rows; the global n_min is a one-row aggregate of THAT
  * (broadcast back — the scalar-subquery shape, sanctioned in
  * CartAuditSpec); the rate table re-joins the corpus as a broadcast
  * hash join on the source key (sanctioned tiny: one row per source);
  * the acceptance filter is codegen'd hash arithmetic. The corpus
  * itself never shuffles.
  */
object Mixing {

  /** Stable bucket ∈ [0, 1000) for an id under a salt — the permille
    * counterpart of [[Sampling.pctBucket]], for rate thresholds finer
    * than 1%. DuckDB mirror: [[permilleBucketSql]].
    */
  def permilleBucket(id: Column, salt: String): Column =
    PortableHash.md5Hex32(concat(lit(salt), lit(":"), id.cast("string"))) % 1000

  /** DuckDB rendering of [[permilleBucket]] (salt restricted, not
    * escaped — same rationale as [[Sampling.pctBucketSql]]). */
  def permilleBucketSql(idExpr: String, salt: String): String = {
    require(salt.matches("[A-Za-z0-9_.\\-]*"),
      s"salt must match [A-Za-z0-9_.-]* (it is spliced into a SQL literal), got '$salt'")
    s"${PortableHash.md5Hex32Sql(s"'$salt:' || CAST($idExpr AS VARCHAR)")} % 1000"
  }

  /** Exact ⌊√x⌋ for a non-negative long column: floor of the double
    * sqrt, corrected by at most one in EITHER direction. For x ≤ 2^53
    * the only possible error is sqrt rounding UP across an integer
    * (fixed by the downward correction); for x > 2^53 the long→double
    * cast itself can round x DOWN across k², leaving the floored sqrt
    * one too LOW — the upward correction repairs that. The upward
    * probe (t+1)² is guarded against 64-bit wrap: t+1 ≤ 3037000499
    * (= ⌊√Long.MAX⌋) keeps the square in range, and any t past that
    * bound already exceeds every representable x. IEEE sqrt is
    * correctly rounded in both engines, so the true isqrt is within
    * one of the floored double and the pair of conditionals is
    * exhaustive. DuckDB mirror: [[isqrtSql]] — the IDENTICAL formula,
    * so the cross-engine contract holds over the full long range.
    */
  def isqrt(x: Column): Column = {
    val t = floor(sqrt(x.cast("double"))).cast("long")
    val down = when(t * t > x, lit(1L)).otherwise(lit(0L))
    val up = when(t < lit(3037000499L) && (t + 1L) * (t + 1L) <= x, lit(1L))
      .otherwise(lit(0L))
    t - down + up
  }

  /** DuckDB rendering of [[isqrt]] — same formula, same guard. Kept as
    * one expression for inlining (xExpr and the floored sqrt are each
    * repeated; callers pass cheap column refs). */
  def isqrtSql(xExpr: String): String = {
    val t = s"CAST(floor(sqrt(CAST(($xExpr) AS DOUBLE))) AS BIGINT)"
    s"($t - CASE WHEN $t * $t > ($xExpr) THEN 1 ELSE 0 END" +
      s" + CASE WHEN $t < 3037000499 AND ($t + 1) * ($t + 1) <= ($xExpr) THEN 1 ELSE 0 END)"
  }

  /** Per-source T=2 acceptance-rate table: one row per source with its
    * count and permille keep rate `(1000·isqrt(n_s·n_min)) div n_s`
    * (1000 for the smallest source, smaller for larger ones).
    */
  def mixRatesT2(df: DataFrame, sourceCol: String): DataFrame = {
    val n = df.groupBy(sourceCol).agg(count(lit(1)).as("n_s"))
    val nMin = n.agg(min(col("n_s")).as("n_min"))
    n.crossJoin(broadcast(nMin)) // one-row global scalar (q42 shape)
      .withColumn("isq", isqrt(col("n_s") * col("n_min")))
      .withColumn("rate_pm", expr("(1000 * isq) div n_s"))
      .select(col(sourceCol), col("n_s"), col("rate_pm"))
  }

  /** The temperature-mixed corpus: rows of `df` that survive their
    * source's T=2 rate under a deterministic (salt, id) permille
    * bucket. Adds `rate_pm` for audit; drop it to get the bare mix.
    */
  def temperatureMixT2(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      salt: String = "mix"): DataFrame = {
    val rates = mixRatesT2(df, sourceCol).drop("n_s")
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(permilleBucket(col(idCol), salt) < col("rate_pm"))
  }
}
