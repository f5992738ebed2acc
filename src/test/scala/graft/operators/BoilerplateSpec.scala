package graft.operators

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // window=3 for hand-computable chunks
  private def stats(rows: (Long, String)*): Map[Long, (Long, Long, Long)] =
    Boilerplate.dedupStats(rows.toDF("doc_id", "text"), window = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("shared header chunks dedup to the lowest doc's occurrence") {
    // all three docs start with the same 3-token chunk "h h h";
    // tails are distinct
    val got = stats(
      1L -> "h h h one two three",
      2L -> "h h h four five six",
      3L -> "h h h seven eight nine")
    assert(got(1L) == ((2L, 2L, 0L))) // canonical: keeps header + own tail
    assert(got(2L) == ((2L, 1L, 1L)))
    assert(got(3L) == ((2L, 1L, 1L)))
  }

  test("duplicate chunk within one document: first chunk_id wins") {
    val got = stats(7L -> "x y z x y z")
    assert(got(7L) == ((2L, 1L, 1L)))
  }

  test("identical whole documents: only the lowest doc_id survives") {
    val got = stats(5L -> "a b c d e f", 4L -> "a b c d e f")
    assert(got(4L) == ((2L, 2L, 0L)))
    assert(got(5L) == ((2L, 0L, 2L)))
  }

  test("tail chunks shorter than the window still fingerprint and dedup") {
    // 4 tokens -> chunks "a b c" and "d"; the 1-token tail duplicates
    val got = stats(1L -> "a b c d", 2L -> "q r s d")
    assert(got(1L) == ((2L, 2L, 0L)))
    assert(got(2L) == ((2L, 1L, 1L))) // its "d" tail lost to doc 1's
  }

  test("empty and whitespace-only documents produce no row") {
    val got = stats(1L -> "a b c", 2L -> "", 3L -> "   ")
    assert(got.keySet == Set(1L))
  }
}
