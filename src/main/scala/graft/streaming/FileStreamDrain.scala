package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.max
import org.apache.spark.sql.streaming.OutputMode

/** Shared harness for holding streaming operators to batch oracles: run
  * a streaming pipeline over a STATIC frame by staging it as a
  * file-stream source and draining the output through a memory sink.
  *
  * The result is `localCheckpoint`ed before the memory-sink view and
  * scratch files are dropped, so callers get a self-contained DataFrame
  * with no leaked temp views, queries, or directories — safe to call
  * repeatedly in one session (unique sink names).
  */
private[graft] object FileStreamDrain {

  /** Build a `secondBatch` closure for [[drain]] that closes every real
    * window/session in Append mode: read the staged frame's max event
    * time under `timeExpr` and emit ONE far-future heartbeat row built
    * by `mk(spark, maxTime)`. The `agg(max).head()` here is the single
    * sanctioned driver-side scalar in the streaming harnesses — one
    * long per drain, read from the STATIC batch frame (never the
    * stream) — centralized so call sites don't hand-roll driver reads.
    */
  def watermarkCloser(timeExpr: Column)(
      mk: (SparkSession, Long) => DataFrame): DataFrame => Option[DataFrame] =
    st => Some(mk(st.sparkSession, st.agg(max(timeExpr)).head().getLong(0)))

  /** @param staged      the static input frame (written once as batch 0)
    * @param pipeline    streaming transform under test
    * @param secondBatch optional extra rows appended as batch 1 (e.g. a
    *                    watermark-advancing heartbeat), derived from the
    *                    staged frame
    */
  def drain(
      staged: DataFrame,
      pipeline: DataFrame => DataFrame,
      secondBatch: DataFrame => Option[DataFrame] = _ => None): DataFrame = {
    val spark = staged.sparkSession
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_drain")
    staged.write.parquet(s"$dir/b0.parquet")
    val schema = spark.read.parquet(s"$dir/b0.parquet").schema
    val name = "graft_stream_drain_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = pipeline(spark.readStream.schema(schema).parquet(s"$dir/*.parquet"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      secondBatch(staged).foreach { b =>
        b.write.mode("append").parquet(s"$dir/b1.parquet")
        q.processAllAvailable()
      }
      spark.table(name).localCheckpoint(true)
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
      scala.util.Try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      ()
    }
  }
}
