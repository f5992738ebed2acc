package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew stress: the degenerate corpus every near-dup operator meets at
  * 100 TB — a boilerplate CLIQUE (here 1,000 byte-identical documents:
  * license headers, error pages, templated spam) whose all-pairs set is
  * quadratic in the clique size.
  *
  * The suite proves the two bounding mechanisms hold and states the
  * recall trade they buy:
  *
  *  - `maxBucketSize` (MinHash-LSH banding) and `maxDf` (winnow
  *    fingerprint / Jaccard word inverted indexes) drop HOT keys
  *    entirely, so a B-member clique contributes ZERO candidates
  *    instead of B²/2 — the bound is independent of clique size.
  *  - The recall loss is confined to exactly those hot keys: pairs in
  *    the same corpus whose keys stay under the caps are still found
  *    (measured against the exact-Jaccard verifier below).
  *  - The EXACT variants (prefix-filtered Jaccard, q63) are lossless by
  *    contract and therefore quadratic on a clique BY DESIGN — the
  *    pipeline ladder handles cliques one rung earlier: [[Dedup.exactDedup]]
  *    collapses byte-identical groups to one survivor, so the exact
  *    near-dup stage never sees the clique at all.
  */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  private val CliqueN = 1000
  // one boilerplate text, vocabulary disjoint from the families below
  private val boiler = (0 until 40).map(i => f"boiler$i%02d").mkString(" ")

  /** 30 families × 3 members: member 0 is the base (20 distinct tokens,
    * per-family vocabulary), members 1 and 2 substitute one token each
    * at different positions. Within-family Jaccard: base↔variant 19/21
    * (0.90), variant↔variant 18/22 (0.82) — all above the 50% and 80%
    * thresholds used below. Cross-family Jaccard is exactly 0.
    */
  private def familyDocs: Seq[(Long, String)] =
    for (f <- 0 until 30; v <- 0 until 3) yield {
      val toks = (0 until 20).map {
        case 0 if v == 1 => s"var${f}_1"
        case 1 if v == 2 => s"var${f}_2"
        case i           => s"w${f}_$i"
      }
      (f * 3L + v, toks.mkString(" "))
    }

  private lazy val families: DataFrame = familyDocs.toDF("doc_id", "text")
  private lazy val clique: DataFrame =
    (0 until CliqueN).map(i => (10000L + i, boiler)).toDF("doc_id", "text")
  private lazy val corpus: DataFrame = families.union(clique)

  // the 90 within-family pairs, from the exact quadratic verifier
  private lazy val exactFamilyPairs: Set[(Long, Long)] =
    Dedup.jaccardNearDupPairs(families, thresholdPct = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  private def inClique(id: Long): Boolean = id >= 10000L

  test("the exact verifier sees the expected within-family pair set") {
    assert(exactFamilyPairs.size == 90) // 30 families × 3 pairs
    assert(exactFamilyPairs.forall { case (a, b) => a / 3 == b / 3 })
  }

  test("minhash bucket cap: a 1k clique contributes zero pairs, families keep full recall") {
    val found = Dedup.minhashNearDupPairsPortable(corpus) // maxBucketSize = 100
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the bound: every clique bucket has 1,000 members > cap → dropped.
    // Without the cap this corpus yields 1000·999/2 = 499,500 clique
    // pairs (candidate blow-up measured on a smaller clique below).
    assert(!found.exists(p => inClique(p._1) || inClique(p._2)),
      "bucket cap failed: clique pairs leaked into the candidate set")
    // the trade: recall loss is CONFINED to the hot buckets — cold
    // (family) buckets are untouched and recall there stays 100%
    val recall = (found intersect exactFamilyPairs).size.toDouble / exactFamilyPairs.size
    assert(recall == 1.0, s"family recall $recall < 1.0 under the bucket cap")
  }

  test("minhash without the cap: the clique IS quadratic (the blow-up being bounded)") {
    // smaller clique so the uncapped all-pairs set stays spec-sized
    val smallClique = (0 until 200).map(i => (10000L + i, boiler)).toDF("doc_id", "text")
    val uncapped = Dedup.minhashNearDupPairsPortable(
      families.union(smallClique), maxBucketSize = 100000)
    // identical docs agree on all 64 hashes → every clique pair survives
    assert(uncapped.filter(col("doc_a") >= 10000L).count() == 200L * 199 / 2)
  }

  test("winnow df-prune: boilerplate fingerprints generate no candidates, families still pair") {
    val found = Dedup.winnowNearDupPairs(corpus) // maxDf = 20
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every clique fingerprint has df = 1,000 > maxDf → pruned; the
    // join's per-key fanout stays ≤ maxDf² regardless of corpus size
    assert(!found.exists(p => inClique(p._1) || inClique(p._2)),
      "df-prune failed: boilerplate fingerprints generated candidates")
    // family fingerprints have df ≤ 3 → the shared passages still pair.
    // Winnow is passage-level (char 8-grams), not token-Jaccard, so its
    // pair set need not equal the Jaccard verifier's — require most of
    // the within-family pairs and no cross-family inventions instead.
    assert(found.forall { case (a, b) => a / 3 == b / 3 },
      "winnow invented a cross-family pair")
    val recall = (found intersect exactFamilyPairs).size.toDouble / exactFamilyPairs.size
    assert(recall >= 0.8, s"family recall $recall under df-prune (expected ≥ 0.8)")
  }

  test("jaccard word df-prune: hot words pruned, surviving pairs exact") {
    val found = Dedup.jaccardNearDupPairs(corpus, thresholdPct = 50, maxDf = Some(20L))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // boilerplate words: df = 1,000 > 20 → no clique candidates; family
    // words: df ≤ 3 → every family pair intersects on its full word set,
    // so the df-pruned result equals the exact verifier's family pairs
    assert(found == exactFamilyPairs)
  }

  test("exact variants are clique-quadratic by contract; exactDedup is the ladder rung that bounds them") {
    // prefix filtering is LOSSLESS, so on a clique it must return every
    // pair — that correctness is the reason it cannot also be the skew
    // guard (50-doc clique: 1,225 pairs, small enough to verify exactly)
    val smallClique = (0 until 50).map(i => (10000L + i, boiler)).toDF("doc_id", "text")
    val prefixPairs = Dedup.jaccardNearDupPairsPrefix(smallClique, thresholdPct = 80)
    assert(prefixPairs.count() == 50L * 49 / 2)
    // the ladder: exact dedup first — the full 1k clique collapses to
    // ONE survivor (min doc_id), so downstream exact near-dup work is
    // independent of clique size
    val deduped = Dedup.exactDedup(corpus)
    assert(deduped.count() == 90L + 1L)
    assert(deduped.filter(col("doc_id") >= 10000L)
      .select("doc_id").as[Long].collect().toSeq == Seq(10000L))
  }
}
