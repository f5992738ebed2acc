package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  // synthetic event time: one doc per second, deterministic from doc_id
  private def timed(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("event_time", timestamp_seconds(col("doc_id")))

  test("batch mode: duplicates collapse to first-seen, uniques survive") {
    // inject exact duplicates: re-ingest the first 50 docs under new ids
    val dups = docs.filter($"doc_id" < 50)
      .withColumn("doc_id", $"doc_id" + 100000L)
    val in  = timed(docs.unionByName(dups))
    val out = StreamingDedup.dedupWithinWatermark(in, "event_time")
    assert(out.count() == docs.count()) // 50 dups dropped, 500 uniques kept
    assert(out.select("fingerprint").distinct().count() == docs.count())
  }

  test("streaming file source: cross-batch duplicates within the horizon are dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    timed(docs).write.parquet(s"$dir/b0.parquet")
    val schema = spark.read.parquet(s"$dir/b0.parquet").schema
    val deduped = StreamingDedup.dedupWithinWatermark(
      spark.readStream.schema(schema).parquet(s"$dir/*.parquet"),
      "event_time", horizon = "10 hours")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_t").outputMode("append").start()
    try {
      q.processAllAvailable()
      // second batch: 50 re-ingested duplicates + 10 genuinely new docs
      timed(docs.filter($"doc_id" < 50).withColumn("doc_id", $"doc_id" + 100000L)
          .unionByName(docs.filter($"doc_id" < 10)
            .withColumn("doc_id", $"doc_id" + 200000L)
            .withColumn("text", concat($"text", lit(" fresh")))))
        .write.mode("append").parquet(s"$dir/b1.parquet")
      q.processAllAvailable()
      val got = spark.table("dedup_t")
      assert(got.count() == docs.count() + 10,
        s"expected ${docs.count() + 10} rows, got ${got.count()}")
      assert(got.select("fingerprint").distinct().count() == got.count())
    } finally q.stop()
  }

  test("drainDedup emits exactly the distinct fingerprint set (q71 path)") {
    val dups = docs.filter($"doc_id" < 30).withColumn("doc_id", $"doc_id" + 100000L)
    // +1 day: an event time EQUAL to the initial watermark (epoch 0) is
    // judged late and silently dropped — found the hard way via doc 0
    val in = docs.unionByName(dups)
      .withColumn("event_time", timestamp_seconds($"doc_id" % 100000L + 86400L))
    val streamed = StreamingDedup.drainDedup(in, "event_time", horizon = "10 hours")
      .select("fingerprint").as[String].collect()
    assert(streamed.length == streamed.distinct.length) // one row per fp
    val batch = docs.select(md5($"text")).as[String].collect().toSet
    assert(streamed.toSet == batch)
  }
}
