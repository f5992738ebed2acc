package graft.streaming

import graft.{SparkEntry, SparkSpec}

/** RocksDB state store for the streaming operators (the 100 TB answer
  * for per-key state that outgrows executor heap): the provider knob
  * must actually reach the drain-clone sessions, and every stateful
  * drain must produce BIT-IDENTICAL results under RocksDB — the state
  * store is an execution detail, never semantics.
  */
class StateStoreSpec extends SparkSpec {

  private val sextet = Seq(
    "q64_sessions_stream",  // flatMapGroupsWithState sessions
    "q71_dedup_stream",     // dropDuplicatesWithinWatermark
    "q72_windows_stream",   // watermarked windowed aggregation
    "q87_incr_stream",      // foreachBatch fold (driver state; knob no-op)
    "q98_stream_index",     // incremental index maintenance
    "q105_stream_join")     // stream-stream interval join (two-sided state)

  private def withProvider[A](cls: Option[String])(body: => A): A = {
    cls.foreach(spark.conf.set(StateStores.ProviderKey, _))
    try body finally spark.conf.unset(StateStores.ProviderKey)
  }

  test("the provider knob reaches the drain clone (a bogus class fails the stream)") {
    val ex = intercept[Exception] {
      withProvider(Some("graft.streaming.NoSuchProvider")) {
        SparkEntry.queries("q71_dedup_stream")(spark, sf()).collect()
      }
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(c =>
        c.isInstanceOf[ClassNotFoundException] ||
          String.valueOf(c.getMessage).contains("NoSuchProvider")),
      s"expected the bogus provider to surface, got: $ex")
  }

  test("the streaming sextet is bit-identical under RocksDB") {
    sextet.foreach { name =>
      val baseline = SparkEntry.queries(name)(spark, sf()).collect().toSeq
      val rocks = withProvider(Some(StateStores.RocksDb)) {
        SparkEntry.queries(name)(spark, sf()).collect().toSeq
      }
      assert(rocks == baseline,
        s"$name diverged under RocksDB: ${rocks.take(3)} vs ${baseline.take(3)}")
      assert(baseline.nonEmpty, s"$name produced no rows — vacuous parity")
    }
  }
}
