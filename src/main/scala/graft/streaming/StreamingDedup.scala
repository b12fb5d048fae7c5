package graft.streaming

import graft.functions.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document dedup — the LLM-corpus dedup operators
  * (operators/Dedup.scala) applied to an UNBOUNDED document stream,
  * the shape a continuous crawl-ingest pipeline needs.
  *
  *  - [[exactFirstWins]]: stateful `dropDuplicates` on the content
  *    fingerprint — checkpointed key state spans micro-batches and
  *    restarts, so a document seen once is suppressed forever. State
  *    is one md5 string per distinct document: ~32 bytes × corpus
  *    cardinality, partitioned by the state store.
  *  - [[exactWithinWatermark]]: `dropDuplicatesWithinWatermark` —
  *    bounded state for feeds where a duplicate can only arrive
  *    within a bounded lateness window (e.g. retried uploads). State
  *    expires past the watermark: the 100 TB-stream-safe variant,
  *    since unbounded distinct-content state eventually exceeds any
  *    store.
  *
  * Near-dup signatures compose the same way: the MinHash/SimHash
  * expressions are per-row (no state), so `sig → groupBy band` runs
  * as a windowed streaming aggregation; the pairwise verify is a
  * batch job over each window's candidates.
  */
object StreamingDedup {

  /** Content fingerprint used as the dedup key (normalized-text md5 —
    * same definition as the batch q_fingerprint). */
  def withFingerprint(stream: DataFrame, textCol: String): DataFrame =
    stream.withColumn("fp", TextStats.fingerprint(col(textCol)))

  /** First-wins exact dedup over the whole stream history. */
  def exactFirstWins(stream: DataFrame, textCol: String): DataFrame =
    withFingerprint(stream, textCol).dropDuplicates("fp")

  /** Exact dedup with state bounded by the event-time watermark:
    * duplicates are only suppressed while their fingerprint state is
    * younger than `delay` — after that the state is dropped. */
  def exactWithinWatermark(stream: DataFrame, textCol: String,
                           tsCol: String, delay: String): DataFrame =
    withFingerprint(stream, textCol)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")
}
