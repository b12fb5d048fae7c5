package graft.streaming

import graft.functions.TextStats
import graft.operators.{BpeTrainer, ImportanceSampling}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming curation gate — the FROZEN-ARTIFACT form of corpus
  * curation, composed into the ingest loop: every arriving
  * micro-batch is scored against the persisted DSIR selection model
  * and token-counted with the persisted BPE tokenizer, then split
  * into accepted (with its token budget contribution) and rejected
  * (with its first-failing reason). Batch-side fitting NEVER happens
  * here: a gate that refits per batch silently shifts the selection
  * boundary as the raw mix drifts — the model and tokenizer are
  * trained once ([[graft.operators.ImportanceSampling.saveModel]],
  * [[graft.operators.BpeTrainer.saveMerges]]) and every batch is
  * judged by the same frozen boundary.
  *
  * Replay safety: foreachBatch is at-least-once, so both sinks
  * partition by `ingest_batch` with DYNAMIC partition overwrite —
  * a replayed batch overwrites its own partition byte-identically
  * (scoring is deterministic and reads only frozen artifacts), the
  * same contract as [[StreamingDedup.ingestNearDupBatch]].
  *
  * Scale shape: per batch, one broadcast join against the B-row
  * model, one map-only encode pass, one write per sink. No state
  * store at all — the "state" is the frozen artifacts.
  */
object CurationGate {

  /** Gate one micro-batch. Rejection reasons, first match wins:
    * 'short' (fewer than `minTokens` whitespace tokens), 'low_weight'
    * (DSIR weight below `minWeight`; docs sharing no bucket with the
    * model score NULL and are rejected as 'low_weight' too — the
    * model never saw anything like them). */
  def gateBatch(batch: DataFrame, batchId: Long, modelPath: String,
                mergesPath: String, acceptedPath: String, rejectedPath: String,
                nBuckets: Int, minWeight: Double, minTokens: Int,
                statsPath: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val merges = BpeTrainer.loadMerges(spark, mergesPath)
    // DETERMINISTIC within-batch id dedup (dropDuplicates keeps an
    // arbitrary row, which would break the byte-identical replay
    // contract when one batch carries the same doc_id with different
    // text): min row by (content hash, full-row fingerprint) — the
    // xxhash64 fingerprint in the ordering key resolves equal-text
    // ties deterministically (same row → same hash on any layout)
    // while staying ORDERABLE for every batch schema (a raw row
    // struct in the key would reject map-typed columns outright;
    // hash expressions accept them). Distinct rows colliding on the
    // 64-bit fingerprint is the only residual tie — same accepted
    // residual as the Sinks.jdbcUpsert survivor rule.
    val rowStruct = struct(batch.columns.map(col): _*)
    val b = batch
      .groupBy(col("doc_id").as("__id"))
      .agg(min_by(rowStruct,
        struct(md5(col("text")), xxhash64(batch.columns.map(col): _*))).as("__r"))
      .select(col("__r.*"))
      .localCheckpoint()
    val scored = b
      .join(ImportanceSampling.scoreWithModel(b, modelPath, nBuckets),
        Seq("doc_id"), "left")
      .join(BpeTrainer.encode(b, merges), Seq("doc_id"))
      .withColumn("n_tokens", TextStats.nTokens(col("text")))
      .withColumn("n_bpe", BpeTrainer.tokenCount(col("enc")).cast("long"))
      .withColumn("reason",
        when(col("n_tokens") < minTokens, lit("short"))
          .when(col("w").isNull || col("w") < minWeight, lit("low_weight")))
      .drop("enc")
      .localCheckpoint()
    scored.filter(col("reason").isNull).drop("reason")
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch").parquet(acceptedPath)
    scored.filter(col("reason").isNotNull)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch").parquet(rejectedPath)
    // per-batch gate telemetry: acceptance rate and the weight profile
    // the operator watches for boundary drift (alongside the corpus-vs
    // -target q_dsir_drift query, which says when to REFIT). Same
    // dynamic-overwrite idempotence as the data sinks.
    statsPath.foreach { sp =>
      scored.agg(
        count(lit(1)).as("n_in"),
        count(when(col("reason").isNull, 1)).as("n_accepted"),
        count(when(col("reason") === "short", 1)).as("n_short"),
        count(when(col("reason") === "low_weight", 1)).as("n_low_weight"),
        round(avg(col("w")), 6).as("mean_w"),
        sum(when(col("reason").isNull, col("n_bpe")).otherwise(lit(0L)))
          .as("accepted_bpe_tokens"))
        .withColumn("ingest_batch", lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch").parquet(sp)
    }
  }

  /** The gate as a streaming query: drain with AvailableNow, gate each
    * micro-batch against the frozen artifacts. */
  def ingest(docs: DataFrame, modelPath: String, mergesPath: String,
             acceptedPath: String, rejectedPath: String, checkpoint: String,
             nBuckets: Int = 256, minWeight: Double = 0.0,
             minTokens: Int = 3, statsPath: Option[String] = None): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        gateBatch(batch, id, modelPath, mergesPath, acceptedPath, rejectedPath,
          nBuckets, minWeight, minTokens, statsPath)
      }
      .start()
}
