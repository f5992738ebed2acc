package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonicalizes the events table's `ts` column to the engine's internal
  * representation: epoch-NANOsecond BIGINT.
  *
  * The fixture generator has shipped `ts` under three different parquet
  * types across rounds — TIMESTAMP(NANOS) (read as a ns long under
  * `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP_NTZ(µs), and the
  * normalized long itself. Every event-time operator (sessionization,
  * as-of joins, windowed aggregates, range joins) does exact integer
  * time arithmetic, so the engine pins ONE representation at the scan
  * boundary and all downstream kernels stay type-oblivious. The
  * conversion is a single codegen'd projection on top of the scan —
  * nothing is materialized, and column pruning still reaches parquet.
  *
  * NTZ→TZ note: an NTZ value is converted through a `TimestampType`
  * cast, which interprets the wall-clock in the SESSION timezone. Every
  * graft entry point (Verify, Bench, SparkSpec) pins
  * `spark.sql.session.timeZone=UTC`, making the cast the identity on
  * the epoch — the same convention DuckDB uses when `epoch_us(ts)` reads
  * the oracle side of the same file.
  */
object EventTime {

  /** The NTZ→TZ cast interprets wall-clock values in the session
    * timezone, so a non-UTC session would silently shift every epoch.
    * All graft entry points pin UTC; fail loudly (the module's
    * convention for unsupported inputs) rather than drift if a future
    * caller does not.
    */
  private def requireUtc(df: DataFrame): Unit = {
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"events.ts is TIMESTAMP_NTZ: canonicalization requires " +
        s"spark.sql.session.timeZone=UTC (got $tz) or epochs would shift")
  }

  /** `ts` rewritten (if needed) to epoch-ns BIGINT; all other columns
    * untouched. Idempotent; works on batch and streaming frames alike
    * (the dispatch is on the static schema, not per-row).
    */
  def tsNanos(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case TimestampNTZType =>
      requireUtc(df)
      df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    case TimestampType =>
      df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    case dt =>
      throw new IllegalArgumentException(
        s"events.ts: expected BIGINT/TIMESTAMP/TIMESTAMP_NTZ, got $dt")
  }

  /** An `event_time` TIMESTAMP column from whatever `ts` is — for
    * watermarks / `window()` / `session_window()`, which require a real
    * timestamp type. Long nanos are truncated to µs with integer `div`
    * (a `/ 1000` double round-trip would wobble ~1.7e18 ns values by
    * hundreds of ns — harmless for windows, fatal for exact-µs oracle
    * hashes).
    */
  def eventTime(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType => requireUtc(df); col("ts").cast(TimestampType)
    case TimestampType    => col("ts")
    case dt =>
      throw new IllegalArgumentException(
        s"events.ts: expected BIGINT/TIMESTAMP/TIMESTAMP_NTZ, got $dt")
  }

  /** A `ts` literal in the fixture's own column type from epoch-ns (the
    * specs use this to append watermark-advancing heartbeat rows BESIDE
    * a fixture file — a file-stream source reads every file under one
    * mandated schema, so appended rows must match the fixture's type,
    * not the engine's canonical long). ns→µs division happens on the
    * JVM long (exact), never through a double.
    */
  def tsLiteral(ns: Long, dt: DataType): Column = dt match {
    case LongType         => lit(ns)
    case TimestampNTZType => timestamp_micros(lit(ns / 1000L)).cast(TimestampNTZType)
    case TimestampType    => timestamp_micros(lit(ns / 1000L))
    case other =>
      throw new IllegalArgumentException(
        s"events.ts: expected BIGINT/TIMESTAMP/TIMESTAMP_NTZ, got $other")
  }
}
