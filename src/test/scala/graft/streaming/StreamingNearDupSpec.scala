package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Streaming ingestion dedup semantics: a REAL stream through the
  * drain finds exactly the batch operator's pairs against the same
  * persisted index (q108's contract, pinned here on a hand-built
  * fixture where the expected pair is known).
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("drained stream finds the planted near-dup, equals the batch operator") {
    val passage = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra tango")
    val corpus = Seq(
      (1L, s"$passage uniform victor whiskey"),
      (2L, "completely unrelated vocabulary zebra yak xylophone walrus " +
        "vulture termite snail rhino quail porcupine ocelot newt moose lemur")
    ).toDF("doc_id", "text")
    val tag = s"strneardup-${System.nanoTime()}"
    val (bt, st) = Dedup.ensureMinhashBandIndex(corpus, "graft_strspec", srcTag = tag)

    val batch = Seq(
      (10L, s"$passage extra trailing words here"),   // near-dup of doc 1
      (11L, "totally fresh content about nothing seen before in any " +
        "corpus document with disjoint words entirely aardvark bison cougar")
    ).toDF("doc_id", "text")
      .withColumn("event_time", timestamp_seconds(col("doc_id") + 86400L))

    val drained = StreamingNearDup.drainNearDups(batch, bt, st)
      .select("new_doc", "dup_of", "n_match")
      .as[(Long, Long, Long)].collect().toSet
    assert(drained.map(p => (p._1, p._2)) == Set((10L, 1L)),
      s"expected exactly the planted pair, got $drained")

    // batch/stream parity: the static operator emits the same set
    val viaBatch = Dedup.incrementalNearDupPairs(
        batch.select("doc_id", "text"), bt, st)
      .select("new_doc", "dup_of", "n_match")
      .as[(Long, Long, Long)].collect().toSet
    assert(drained == viaBatch)

    // the non-streaming degrade path of the streaming operator agrees too
    val viaStatic = StreamingNearDup.nearDupsAgainstIndex(
        batch, bt, st)
      .select("new_doc", "dup_of", "n_match")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaStatic == viaBatch)
  }
}
