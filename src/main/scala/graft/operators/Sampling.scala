package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic dataset splitting and sampling for training-data
  * pipelines: train/val/test assignment, stable subsampling, and
  * per-stratum rate control.
  *
  * Everything is a pure function of (salt, id) — no RNG, no state:
  * re-running the pipeline on a grown corpus keeps every previously
  * assigned row in its split (the property that matters for dataset
  * versioning: yesterday's val set never bleeds into today's train
  * set), and two clusters assign identically without coordination.
  * A 100 TB corpus splits with ZERO shuffles — the bucket is a scalar
  * projection, fully codegen'd, and a split filter pushes down to the
  * scan as a deterministic predicate.
  *
  * The bucket hash is the portable md5 construction
  * ([[PortableHash.md5Hex32]]) so an external SQL oracle reproduces
  * assignments bit-for-bit (q65); salts give independent buckets for
  * independent decisions (splitting vs subsampling).
  */
object Sampling {

  /** Stable bucket ∈ [0, 100) for an id under a salt: two salts give
    * (practically) independent bucketings, so layered decisions — split
    * first, subsample second — do not correlate.
    * DuckDB mirror: [[pctBucketSql]].
    */
  def pctBucket(id: Column, salt: String): Column =
    PortableHash.md5Hex32(concat(lit(salt), lit(":"), id.cast("string"))) % 100

  /** DuckDB rendering of [[pctBucket]] for oracle SQL. The salt is
    * interpolated into a SQL string literal, so it is restricted to a
    * quote-free identifier charset rather than escaped — salts are
    * pipeline config, not data, and a rejected salt fails loudly at
    * plan time instead of corrupting the oracle query.
    */
  def pctBucketSql(idExpr: String, salt: String): String = {
    require(salt.matches("[A-Za-z0-9_.\\-]*"),
      s"salt must match [A-Za-z0-9_.-]* (it is spliced into a SQL literal), got '$salt'")
    s"${PortableHash.md5Hex32Sql(s"'$salt:' || CAST($idExpr AS VARCHAR)")} % 100"
  }

  /** Append a `split` column assigning each row to the first named
    * split whose cumulative weight exceeds the row's bucket —
    * e.g. `Seq("train" -> 90, "val" -> 5, "test" -> 5)` sends buckets
    * [0,90) → train, [90,95) → val, [95,100) → test. Weights must sum
    * to 100 so the assignment is total (every row lands in exactly one
    * split).
    */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Int)],
      salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split weights must sum to 100, got ${splits.map(_._2).sum}")
    require(splits.forall(_._2 > 0),
      s"every split weight must be positive (a zero or negative weight is an " +
        s"unreachable or overlapping split), got ${splits.map(_._2).mkString(",")}")
    val bucket = pctBucket(col(idCol), salt)
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val assigned = splits.zip(cum).tail.foldLeft(
      when(bucket < cum.head, splits.head._1)) {
        case (acc, ((name, _), hi)) => acc.when(bucket < hi, name)
      }
    df.withColumn("split", assigned)
  }

  /** Keep a stable `pct`% of rows: the same ids survive on every run
    * and at every corpus size. */
  def deterministicSample(
      df: DataFrame,
      idCol: String,
      pct: Int,
      salt: String = "sample"): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.filter(pctBucket(col(idCol), salt) < pct)
  }

  /** Per-key occurrence cap — the domain-balancing primitive of a web
    * corpus (cap documents per domain/source so no single crawl host
    * dominates the mixture). Keeps at most `cap` rows per `keyCol`
    * value: rows are ranked inside each key by the deterministic
    * (salt, id) hash with the id as tiebreak — a uniform "random"
    * order that is reproducible cross-engine and stable across runs —
    * and ranks > cap are dropped. Unlike a rate (stratifiedSample), a
    * cap guarantees an absolute bound per key no matter how skewed the
    * key distribution is.
    *
    * Scale shape: one hash-partitioned window per key — the shuffle
    * moves (key, hash, id) plus payload once; no global ordering
    * anywhere. A pathological single-key corpus degrades to one
    * partition's sort, which is the cap semantics' inherent cost (the
    * rank inside one key is a total order by definition).
    */
  def perKeyCap(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      cap: Int,
      salt: String = "cap"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol)
      .orderBy(PortableHash.md5Hex32(
        concat(lit(salt), lit(":"), col(idCol).cast("string"))), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  /** Per-stratum sampling rates — the mixture-balancing primitive
    * (downsample the dominant language, keep all of a rare one).
    * `rates` maps stratum value → pct; strata not listed use
    * `defaultPct`. The rate lookup is a literal when-chain (no join —
    * rates are pipeline config, not data) and the survival decision is
    * still a pure function of (salt, id), so a stratum's kept set is
    * stable under rate changes to OTHER strata.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Int],
      defaultPct: Int = 100,
      salt: String = "sample"): DataFrame = {
    require((defaultPct +: rates.values.toSeq).forall(p => p >= 0 && p <= 100),
      "every pct must be in [0,100]")
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(strataCol) === k, p).otherwise(acc)
    }
    df.filter(pctBucket(col(idCol), salt) < rate)
  }

  /** EXACT-size proportional stratified sample — the eval-set
    * construction primitive: draw exactly `budget` rows, allocated
    * across strata by the largest-remainder method (Hare quota, the
    * standard apportionment rule): stratum s gets
    * `⌊budget·n_s/N⌋` rows plus one of the `budget − Σ⌊·⌋` leftovers,
    * leftovers going to the largest remainders (ties: stratum value
    * ascending — a total order). Within a stratum the picks are the
    * [[perKeyCap]] deterministic (salt, id) hash order. A rate
    * (stratifiedSample) preserves proportions only in expectation;
    * this allocates exactly, which is what a fixed-size benchmark
    * split needs. All arithmetic is integer (quota via div, remainder
    * via mod), so an external SQL oracle reproduces every allocation
    * and every pick (q85).
    *
    * When `budget·n_s/N + 1 > n_s` for a tiny stratum the stratum
    * yields all its rows (the rank filter cannot exceed n_s); the
    * output is then smaller than `budget` — the caller sized the
    * budget above what proportionality can deliver.
    *
    * Scale shape: the corpus aggregates once per stratum (tiny
    * result); quota/remainder/leftover run over that O(#strata) table
    * (its rank window is unpartitioned but bounded by #strata —
    * allowlisted like the q66 bucket-totals window); the corpus itself
    * is touched by one broadcast join of the allocation plus the
    * per-stratum rank window — no global sort, no second pass.
    */
  def stratifiedExact(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      budget: Long,
      salt: String = "strat"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_ns"))
    val total  = counts.agg(sum(col("_ns")).as("_nall"))
    val quotas = counts.crossJoin(broadcast(total)) // one-row N (q42 shape)
      .withColumn("_base", expr(s"($budget * _ns) div _nall"))
      .withColumn("_rem",  expr(s"($budget * _ns) % _nall"))
    // one window pass over the O(#strata) quota table computes both the
    // remainder rank and the leftover total (same spec → one Window op)
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy(col("_rem").desc, col(strataCol))
    val allW = rankW.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val alloc = quotas
      .withColumn("_rr", row_number().over(rankW))
      .withColumn("_left", lit(budget) - sum(col("_base")).over(allW))
      .withColumn("_alloc",
        col("_base") + when(col("_rr") <= col("_left"), 1L).otherwise(0L))
      .select(col(strataCol), col("_alloc"))
    val pickW = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(PortableHash.md5Hex32(
        concat(lit(salt), lit(":"), col(idCol).cast("string"))), col(idCol))
    df.join(broadcast(alloc), strataCol)
      .withColumn("_rn", row_number().over(pickW))
      .filter(col("_rn") <= col("_alloc"))
      .drop("_rn", "_alloc")
  }
}
