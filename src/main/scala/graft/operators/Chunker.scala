package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size token chunking with overlap — the document → model-input
  * prep step of an embedding/pretraining pipeline (each chunk becomes
  * one encoder input; overlap preserves cross-boundary context).
  *
  * Chunk `i` covers tokens `[i·stride, i·stride + size)` with
  * `stride = size − overlap`; the chunk count
  * `ceil((n − overlap) / stride)` (min 1) is exactly enough for the
  * last chunk to reach the end of the doc. Everything is built-in
  * column functions (`sequence` → `explode` → `slice`), so chunking is
  * per-row work with no shuffle — at 100 TB it pipelines inside the
  * scan stage, and the output is larger than the input only by the
  * overlap fraction.
  */
object Chunker {

  /** One row per (doc, chunk): doc_id, chunk_id, n_tokens, chunk_text. */
  def chunkTokens(docs: DataFrame, size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val n = org.apache.spark.sql.functions.size(TextStats.tokens(col("text"))).cast("long")
    // exact-integer quotients are exact in IEEE double, so ceil over a
    // double division replays bit-identically in any engine
    val nChunks = greatest(lit(1L),
      ceil((n - overlap).cast("double") / lit(stride.toDouble)).cast("long"))
    docs
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"),
        explode(sequence(lit(0L), nChunks.cast("long") - 1)).as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id"),
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"), lit(size)).as("chunk"))
      .select(
        col("doc_id"),
        col("chunk_id"),
        org.apache.spark.sql.functions.size(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }
}
