package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.{BloomBuildAgg, BloomMightContain}

/** Bloom-filter runtime pruning for selective semi-joins — the
  * "runtime filter" / dynamic-partition-pruning idiom: when a big probe
  * table is semi-joined against a selective build side, first reduce
  * the build side to a KiB-scale Bloom bitset, push a codegen'd
  * `might_contain(key)` predicate into the probe SCAN stage, and only
  * then run the exact join on the survivors. At 100 TB the win is that
  * non-candidate rows die before the exchange: the shuffle carries the
  * Bloom survivors (true matches + the fp-rate tail), not the table.
  *
  * Exactness contract: the Bloom test is one-sided (no false
  * negatives — `BloomHash.set`/`mightContain` share the probe
  * sequence), and the exact semi-join afterwards removes false
  * positives, so the composition returns EXACTLY the plain semi-join's
  * rows — which is what the oracle checks (q81).
  *
  * The driver-side `head()` of the built bitset is the sanctioned
  * runtime-filter shape (Spark's own InjectRuntimeFilter does the
  * same): ONE row of numBits/8 bytes, independent of build-side row
  * count — not a data collect.
  */
object RuntimeFilter {

  /** One-pass Bloom build over `keys(keyCol)` (bigint). Partial
    * aggregation applies (merge = bitwise OR); result is the bitset.
    */
  def buildBloom(keys: DataFrame, keyCol: String, numBits: Int, k: Int = 5): Array[Long] = {
    val row = keys.agg(BloomBuildAgg(col(keyCol), numBits, k).as("bits")).head()
    row.getSeq[Long](0).toArray
  }

  /** The codegen'd probe predicate for a prebuilt bitset. */
  def mightContain(key: Column, bits: Array[Long], k: Int = 5): Column =
    BloomMightContain(key, bits, k)

  /** Bloom-pruned exact semi-join: probe rows whose `probeCol` appears
    * in `keys(keyCol)`. Plan shape: scan-stage Bloom filter → exact
    * left-semi equi-join (broadcast when the build side is small).
    */
  def semiJoin(
      probe: DataFrame,
      probeCol: String,
      keys: DataFrame,
      keyCol: String,
      numBits: Int = 1 << 17,
      k: Int = 5): DataFrame = {
    val bits = buildBloom(keys, keyCol, numBits, k)
    probe
      .filter(mightContain(col(probeCol), bits, k))
      .join(keys, col(probeCol) === col(keyCol), "leftsemi")
  }
}
