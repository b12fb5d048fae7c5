package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (Xie et al., "Data Selection for
  * Language Models via Importance Resampling", NeurIPS 2023 — public
  * method): select raw-corpus documents whose hashed n-gram profile
  * looks like a TARGET corpus. Features are unigrams+bigrams hashed
  * into `nBuckets` buckets; bag-of-buckets models p (target) and q
  * (raw) are Laplace-smoothed; a document's importance weight is its
  * log-likelihood ratio  Σ_b c_db · [ln p_b − ln q_b];  selection is
  * Gumbel-top-k, i.e. sampling without replacement ∝ exp(weight).
  *
  * Scale shape (100 TB): the per-corpus models are `nBuckets`-row
  * aggregates (one explode + one hash aggregation each — the target
  * corpus is small by definition, the raw pass is the one full scan)
  * broadcast back as a tiny join; per-doc weights pre-aggregate to
  * (doc, bucket) counts BEFORE the join, so shuffle volume is
  * distinct buckets per doc, not gram occurrences. No driver-side
  * state at any size.
  *
  * Determinism: md5 bucket hashing (engine-portable, layout-free),
  * per-doc fold in sorted bucket order, and Gumbel noise derived from
  * md5(doc_id) — the whole selection replays bit-exactly in DuckDB.
  */
object ImportanceSampling {

  /** 60-bit md5 bucket of a gram string. */
  private def bucket(gram: org.apache.spark.sql.Column, nBuckets: Int) =
    conv(substring(md5(gram), 1, 15), 16, 10).cast("long") % nBuckets

  /** (doc_id, b) per unigram+bigram OCCURRENCE (not distinct — the
    * models are bag-of-grams). Tokens staged as a column before the
    * per-gram lambdas (see Dedup.gramsOf's O(n²) warning). */
  def docBuckets(docs: DataFrame, nBuckets: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), TextStats.tokens(col("text")).as("tk"))
    val bigrams = when(size(col("tk")) >= 2,
      transform(sequence(lit(1), size(col("tk")) - 1),
        i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1))))
      .otherwise(array().cast("array<string>"))
    toks.select(col("doc_id"),
        explode(concat(col("tk"), bigrams)).as("g"))
      .select(col("doc_id"), bucket(col("g"), nBuckets).as("b"))
  }

  /** The `nBuckets`-row smoothed log-ratio model:
    * lr_b = ln((tgt_b+1)/(tgt_tot+B)) − ln((raw_b+1)/(raw_tot+B)),
    * one row per bucket SEEN IN RAW (raw docs can only probe those). */
  def logRatios(target: DataFrame, raw: DataFrame, nBuckets: Int): DataFrame = {
    val tgtB = docBuckets(target, nBuckets).groupBy("b").agg(count(lit(1)).as("tc"))
    val rawB = docBuckets(raw, nBuckets).groupBy("b").agg(count(lit(1)).as("rc"))
    val totals = tgtB.agg(sum(col("tc")).as("tt"))
      .crossJoin(rawB.agg(sum(col("rc")).as("rt")))
    rawB.join(tgtB, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log((coalesce(col("tc"), lit(0L)) + lit(1.0)) / (col("tt") + lit(nBuckets.toDouble)))
          - log((col("rc") + lit(1.0)) / (col("rt") + lit(nBuckets.toDouble)))).as("lr"))
  }

  /** Per-raw-doc importance weight, folded in sorted bucket order
    * (byte-stable at any partitioning), rounded to 6 dp.
    *
    * ONE raw-corpus pass: the per-(doc, bucket) counts are
    * materialized once (localCheckpoint — bounded by docs × ≤nBuckets
    * rows, far below gram-occurrence cardinality) and BOTH the raw
    * histogram the model needs and the per-doc scoring fold derive
    * from them; only the small target corpus is scanned separately. */
  def weights(raw: DataFrame, target: DataFrame, nBuckets: Int): DataFrame = {
    val docb = docBuckets(raw, nBuckets)
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val rawB = docb.groupBy("b").agg(sum(col("c")).as("rc"))
    val tgtB = docBuckets(target, nBuckets).groupBy("b").agg(count(lit(1)).as("tc"))
    val totals = tgtB.agg(sum(col("tc")).as("tt"))
      .crossJoin(rawB.agg(sum(col("rc")).as("rt")))
    val ratios = rawB.join(tgtB, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log((coalesce(col("tc"), lit(0L)) + lit(1.0)) / (col("tt") + lit(nBuckets.toDouble)))
          - log((col("rc") + lit(1.0)) / (col("rt") + lit(nBuckets.toDouble)))).as("lr"))
    scoreCounts(docb, ratios)
  }

  /** The scoring tail shared by [[weights]] (fresh model) and
    * [[scoreWithModel]] (frozen model): per-(doc, bucket) counts join
    * the broadcast ratio table, per-doc sorted-bucket fold. Buckets a
    * doc has that the model lacks contribute nothing — for a frozen
    * model that is the honest semantics (the model never saw them). */
  private def scoreCounts(docb: DataFrame, ratios: DataFrame): DataFrame =
    docb
      .join(broadcast(ratios), Seq("b"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("b"),
        (col("c") * col("lr")).as("v")))).as("cs"))
      .select(col("doc_id"),
        round(aggregate(col("cs"), lit(0.0), (acc, x) => acc + x.getField("v")), 6)
          .as("w"))

  private def score(docs: DataFrame, ratios: DataFrame, nBuckets: Int): DataFrame =
    scoreCounts(
      docBuckets(docs, nBuckets).groupBy("doc_id", "b").agg(count(lit(1)).as("c")),
      ratios)

  /** Persist the fitted log-ratio model: fit ONCE on (target, raw
    * sample), then [[scoreWithModel]] scores every future ingest
    * batch against the frozen artifact — the production selection
    * loop, where refitting per batch would silently shift the
    * selection boundary as the raw mix drifts. `nBuckets`-row
    * parquet + integrity meta, same artifact contract as the
    * LSH/IVF/postings indexes and [[BpeTrainer.saveMerges]]. */
  def saveModel(target: DataFrame, raw: DataFrame, nBuckets: Int,
                path: String): Unit = {
    val spark = raw.sparkSession
    logRatios(target, raw, nBuckets).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/ratios")
    graft.sources.IndexMeta.write(spark, s"$path/meta.json",
      Seq("nBuckets" -> nBuckets.toLong))
  }

  /** Score a batch against a persisted model (meta-checked: probing
    * with a different bucket count than fit time would hash grams
    * into the wrong rows and silently misscore). */
  def scoreWithModel(docs: DataFrame, path: String, nBuckets: Int): DataFrame = {
    val spark = docs.sparkSession
    graft.sources.IndexMeta.check(spark, s"$path/meta.json", "DSIR model",
      Seq("nBuckets" -> nBuckets.toLong))
    score(docs, spark.read.parquet(s"$path/ratios"), nBuckets)
  }

  /** Refit telemetry for a frozen selection boundary: PSI (population
    * stability index) between the TARGET corpus's bucket distribution
    * and a CURRENT raw batch's — Σ (p−q)·ln(p/q), Laplace-smoothed
    * over all `nBuckets` buckets, folded in bucket order. The frozen
    * model ([[saveModel]]) judges every batch by fit-time statistics;
    * this query tells the operator WHEN that stops being valid
    * (convention: <0.1 stable, >0.25 refit) — the same
    * telemetry-over-silence design as the IVF cell-stats query.
    * Output: one row (psi, n_target_buckets, n_raw_buckets).
    *
    * Scale shape: two bucket histograms (nBuckets-row aggregates) and
    * an nBuckets-row join — corpus work is the gram explode only. */
  def bucketDrift(target: DataFrame, raw: DataFrame, nBuckets: Int): DataFrame = {
    val tgtB = docBuckets(target, nBuckets).groupBy("b").agg(count(lit(1)).as("tc"))
    val rawB = docBuckets(raw, nBuckets).groupBy("b").agg(count(lit(1)).as("rc"))
    val totals = tgtB.agg(sum(col("tc")).as("tt"), count(lit(1)).as("tn"))
      .crossJoin(rawB.agg(sum(col("rc")).as("rt"), count(lit(1)).as("rn")))
    // SHUFFLE_HASH: full outer (no broadcast variant exists) over two
    // nBuckets-row aggregates — hash beats sorting even at this size,
    // and it keeps the registry's no-sort-merge-join invariant
    tgtB.join(rawB.hint("SHUFFLE_HASH"), Seq("b"), "full_outer")
      .crossJoin(broadcast(totals))
      .withColumn("p", (coalesce(col("tc"), lit(0L)) + lit(1.0))
        / (col("tt") + lit(nBuckets.toDouble)))
      .withColumn("q", (coalesce(col("rc"), lit(0L)) + lit(1.0))
        / (col("rt") + lit(nBuckets.toDouble)))
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
      .groupBy()
      .agg(
        sort_array(collect_list(struct(col("b"), col("term")))).as("cs"),
        first(col("tt")).as("tt"), first(col("rt")).as("rt"),
        first(col("tn")).as("n_target_buckets"),
        first(col("rn")).as("n_raw_buckets"))
      // buckets observed in NEITHER corpus still carry a smoothing
      // term (p0 − q0)·ln(p0/q0) ≠ 0 whenever the two corpus sizes
      // differ — add it in closed form so the reported PSI is the
      // documented sum over ALL nBuckets buckets, not just observed
      .withColumn("p0", lit(1.0) / (col("tt") + lit(nBuckets.toDouble)))
      .withColumn("q0", lit(1.0) / (col("rt") + lit(nBuckets.toDouble)))
      .select(
        round(
          aggregate(col("cs"), lit(0.0), (acc, x) => acc + x.getField("term"))
            + (lit(nBuckets) - size(col("cs"))).cast("double")
              * (col("p0") - col("q0")) * log(col("p0") / col("q0")), 6).as("psi"),
        col("n_target_buckets"), col("n_raw_buckets"))
  }

  /** Gumbel-top-k over a (doc_id, w) weight table: sampling k docs
    * without replacement with probability ∝ exp(w), derandomized —
    * noise g = −ln(−ln(u)) with u minted from md5(doc_id), so the
    * sample is reproducible and engine-portable. TakeOrderedAndProject
    * does the top-k (no global sort materialization). */
  def gumbelTopK(weights: DataFrame, k: Int): DataFrame = {
    val h = conv(substring(md5(concat(lit("g:"), col("doc_id"))), 1, 15), 16, 10)
      .cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(1152921504606846976.0) // 2^60
    weights
      .withColumn("key", round(col("w") - log(-log(u)), 6))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
  }
}
