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

  // phase timing for harness-cost work (SPARK_GRAFT_DRAIN_TIMING=1):
  // the drains are pure fixed cost at bench scale, so knowing WHICH
  // phase (stage write / stream start / batch 2 / collect) pays is the
  // difference between tuning and guessing
  private val timing = sys.env.get("SPARK_GRAFT_DRAIN_TIMING").contains("1")
  private[streaming] def phase[A](name: String)(body: => A): A =
    if (!timing) body
    else {
      val t0 = System.nanoTime()
      try body
      finally System.err.println(
        f"[drain-timing] $name%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

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
    st => {
      val row = st.agg(max(timeExpr)).head()
      require(!row.isNullAt(0),
        "watermarkCloser: staged frame is empty (max event time is null) — " +
          "an empty drain has no watermark to close")
      Some(mk(st.sparkSession, row.getLong(0)))
    }

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
    // tmpfs when available: the drain's staging files, offset/commit
    // logs and state-store deltas are all throwaway scratch whose
    // fsyncs otherwise dominate the harness's fixed cost on disk.
    // Capacity-guarded: a default Docker /dev/shm is 64 MB — writable
    // but too small for a staged table — so require real headroom
    // before preferring it over java.io.tmpdir.
    val shm = java.nio.file.Paths.get("/dev/shm")
    val dir =
      if (java.nio.file.Files.isWritable(shm) &&
          shm.toFile.getUsableSpace > (4L << 30))
        java.nio.file.Files.createTempDirectory(shm, "graft_stream_drain")
      else java.nio.file.Files.createTempDirectory("graft_stream_drain")
    // a few files per batch: the scan of batch 0 parallelizes across
    // them (1 file left the 100k-row scan single-task — measured 10-20%
    // on the triad), while dozens would pay per-file stream-source
    // overhead (measured +2s at 32 files)
    val stageFiles = sys.env.get("SPARK_GRAFT_DRAIN_STAGE_FILES").map(_.toInt).getOrElse(4)
    phase("stage-write") { staged.coalesce(stageFiles).write.parquet(s"$dir/b0.parquet") }
    // the staged frame's own schema IS the written schema (we wrote it
    // one line up) — re-reading the footer would cost a listing + job
    val schema = staged.schema
    // BOTH batches are staged before the stream starts (secondBatch is
    // a function of the STATIC frame, never of stream output), so the
    // whole drain runs as one Trigger.AvailableNow pass: no
    // processAllAvailable round-trips, and one fewer no-data
    // micro-batch (the watermark-advance batch between b0 and b1 —
    // each empty batch still costs a full state-store-commit job).
    // Batch boundaries are preserved exactly: maxFilesPerTrigger =
    // |b0 files| and a forced mtime gap make batch 0 = b0, batch 1 =
    // b1 (the file source admits oldest-mtime files first).
    val b0Files = new java.io.File(s"$dir/b0.parquet").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    b0Files.foreach(f => f.setLastModified(f.lastModified() - 120000L))
    val hasSecond = phase("batch1-write") {
      secondBatch(staged).map { b =>
        b.coalesce(1).write.parquet(s"$dir/b1.parquet")
      }.isDefined
    }
    val name = "graft_stream_drain_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // The drain runs with few shuffle partitions: each stateful
    // operator commits one state store per shuffle partition per
    // micro-batch (delta file + fsync); at the session default 32 that
    // fixed cost dominates these seconds-long parity drains. Results
    // are partition-count-invariant (the oracle compare proves it),
    // and the production entry points (closedSessions, windowedStats,
    // startAlertTableSink on a real stream) inherit the session's own
    // parallelism. The reduced conf lives on a CLONED session (same
    // SparkContext, isolated SQLConf/catalog), so queries planned
    // concurrently on the caller's session never race on it.
    val drainSession = spark.newSession()
    // a quarter of the cores, floor 4: enough tasks that a million-row
    // batch still parallelizes, few enough that state-store commit
    // overhead stays off the floor for the common small drains
    drainSession.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_DRAIN_PARTS",
        math.max(4, spark.sparkContext.defaultParallelism / 4).toString))
    // state-store provider knob (RocksDB for state that outgrows heap):
    // the clone doesn't inherit runtime conf, so propagate explicitly
    StateStores.propagate(spark, drainSession)
    val q = phase("start") {
      pipeline(drainSession.readStream.schema(schema)
          .option("maxFilesPerTrigger", math.max(b0Files.length, 1).toString)
          .parquet(s"$dir/*.parquet"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$dir/_ckpt")
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    try {
      // AvailableNow self-terminates after draining both staged batches
      // plus the final watermark no-data batch (the one that emits
      // timeout-closed sessions / watermark-closed windows)
      phase("drain") { q.awaitTermination() }
      require(!hasSecond || q.recentProgress.exists(_.batchId >= 1),
        "drain ran a single micro-batch for a two-batch fixture — " +
          "cross-batch semantics were not exercised")
      // localCheckpoint materializes the rows, so the returned frame is
      // self-contained and safe to use from the caller's session even
      // though it was planned on the drain clone
      if (timing) q.recentProgress.foreach(p =>
        System.err.println(s"[drain-timing] batch ${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}"))
      phase("collect") { drainSession.table(name).localCheckpoint(true) }
    } finally {
      q.stop()
      drainSession.catalog.dropTempView(name)
      scala.util.Try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      ()
    }
  }
}
