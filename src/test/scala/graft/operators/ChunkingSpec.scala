package graft.operators

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h i j"), // 10 tokens
    (2L, "x y z"),               // shorter than one window
    (3L, "   "),                 // blank: no chunks
    (4L, "")                     // empty: no chunks
  ).toDF("doc_id", "text")

  test("sliding windows: starts, bounds, text, and overlap") {
    val out = Chunking.slidingWindows(docs, window = 4, stride = 3)
      .select("doc_id", "chunk_id", "tok_start", "tok_end", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .sortBy(r => (r._1, r._2))
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq == Seq(0L, 3L, 6L, 9L)) // starts every stride while < n
    assert(d1.map(_._5).toSeq == Seq("a b c d", "d e f g", "g h i j", "j"))
    assert(d1.map(_._4).toSeq == Seq(4L, 7L, 10L, 10L)) // tok_end clipped at n
    // stride < window ⇒ consecutive chunks share window−stride tokens
    d1.sliding(2).foreach {
      case Array(a, b) =>
        val overlap = a._5.split(" ").drop((b._3 - a._3).toInt).mkString(" ")
        assert(b._5.startsWith(overlap))
      case _ =>
    }
    assert(out.filter(_._1 == 2L).map(_._5).toSeq == Seq("x y z"))
    assert(!out.exists(r => r._1 == 3L || r._1 == 4L)) // no chunks for blank/empty
  }

  test("disjoint mode (stride == window) reconstructs the document") {
    val rebuilt = Chunking.slidingWindows(docs, window = 3, stride = 3)
      .filter($"doc_id" === 1L)
      .orderBy("chunk_id")
      .select("chunk_text").as[String].collect().mkString(" ")
    assert(rebuilt == "a b c d e f g h i j")
  }

  test("invalid window/stride rejected") {
    intercept[IllegalArgumentException] {
      Chunking.slidingWindows(docs, window = 3, stride = 4)
    }
  }
}
