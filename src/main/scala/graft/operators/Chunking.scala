package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sliding-window document chunking — the context-window prep step for
  * RAG indexing and pretraining: fixed `window`-token chunks every
  * `stride` tokens (stride < window ⇒ overlapping context is preserved
  * across cuts; stride = window ⇒ disjoint).
  *
  * Chunk starts are `0, stride, 2·stride, …` while < n_tokens; chunk i
  * covers tokens `[i·stride, min(i·stride + window, n))`. Empty
  * documents produce no chunks. Pure per-row generation: tokenize once,
  * explode a `sequence` of starts, slice — one Generate, no joins, no
  * shuffle beyond the explicit kernel-distribution exchange (the
  * single-file scan would otherwise serialize the tokenizer).
  */
object Chunking {

  def slidingWindows(
      docs: DataFrame,
      window: Int,
      stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    Dedup.spread(docs, "doc_id")
      .withColumn("_tk", split(trim(col("text")), "\\s+"))
      .withColumn("_n", TextFunctions.tokenCount(col("text")))
      .filter(col("_n") > 0)
      .select(col("doc_id"), col("_tk"), col("_n"),
        explode(sequence(lit(0L), col("_n") - 1L, lit(stride.toLong))).as("tok_start"))
      .select(
        col("doc_id"),
        expr(s"tok_start div $stride").as("chunk_id"),
        col("tok_start"),
        least(col("tok_start") + window, col("_n")).as("tok_end"),
        array_join(slice(col("_tk"), (col("tok_start") + 1L).cast("int"), lit(window)), " ")
          .as("chunk_text"))
  }
}
