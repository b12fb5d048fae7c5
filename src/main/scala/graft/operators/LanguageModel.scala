package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interpolated bigram language-model perplexity — the CCNet-style
  * quality filter one order up from [[KeywordSearch.unigramSurprisal]]:
  * the corpus itself is the LM, and each document is scored by how
  * predictable its token SEQUENCE is, not just its token bag.
  * Word-salad (fluent words, shuffled order) passes a unigram filter
  * and fails this one.
  *
  *   p(w2|w1) = λ·C(w1,w2)/C(w1) + (1−λ)·(C(w2)+1)/(N+V+1)
  *   ppl(doc) = exp(−mean ln p over its token transitions)
  *
  * with tokens outside the top-`vocabSize` mapped to `<unk>` first
  * (the standard closed-vocabulary construction) and the bigram table
  * pruned to the top-`maxBigrams` (count desc, w1, w2 — a total
  * order). Pruned-away bigrams back off to the smoothed unigram term,
  * so pruning changes scores smoothly, never abruptly.
  *
  * Scale shape (100 TB): the LM is THREE bounded aggregates — V-row
  * vocab, V+1 unigrams, ≤maxBigrams bigrams — all broadcast; scoring
  * is one posexplode, broadcast joins, and one per-doc fold. The only
  * corpus-wide shuffles are the LM count aggregations themselves and
  * the per-doc regroup, all on compact keys. This is the distributed
  * equivalent of shipping a pruned KenLM to every node — and
  * [[saveModel]]/[[perplexityWithModel]] make that literal: fit once,
  * persist the tables, score every future ingest batch against the
  * frozen artifact (same contract as the DSIR model and the BPE
  * merges).
  *
  * Determinism: integer counts, a total-order vocab/bigram cutoff,
  * and the per-doc fold in token-position order — byte-stable at any
  * partitioning, and the whole construction replays in DuckDB.
  */
object LanguageModel {

  val Unk = "<unk>"

  /** Top-`vocabSize` tokens by (count desc, token) — a total order. */
  private def topVocab(docs: DataFrame, vocabSize: Int): DataFrame =
    docs.select(explode(TextStats.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(vocabSize)
      .select("w")

  /** (doc_id, pos, w) token stream with OOV folded to [[Unk]]. */
  private def mapped(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "w")))
      .join(broadcast(vocab.select(col("w"), lit(1).as("__in"))), Seq("w"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("__in").isNotNull, col("w")).otherwise(lit(Unk)).as("w"))

  /** Adjacent transitions (doc_id, pos, w1, w2) of a mapped stream. */
  private def transitionsOf(stream: DataFrame): DataFrame =
    stream
      .withColumn("w1", lag(col("w"), 1)
        .over(Window.partitionBy("doc_id").orderBy("pos")))
      .filter(col("w1").isNotNull)
      .select(col("doc_id"), col("pos"), col("w1"), col("w").as("w2"))

  /** Shared scoring tail: transitions × broadcast LM tables → per-doc
    * (doc_id, n_trans, ppl), folded in position order. The c1=0 guard
    * only fires for frozen-model scoring (a fit corpus always counts
    * its own tokens); it keeps a zero-count `<unk>` from minting NaN. */
  private def scoreTrans(trans: DataFrame, uni: DataFrame, bi: DataFrame,
                         totals: DataFrame, lambda: Double): DataFrame =
    pplFold(trans
      .join(broadcast(bi), Seq("w1", "w2"), "left")
      .join(broadcast(uni.withColumnRenamed("w", "w1")
        .withColumnRenamed("cu", "c1")), Seq("w1"))
      .join(broadcast(uni.withColumnRenamed("w", "w2")
        .withColumnRenamed("cu", "c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("lp", log(
        when(col("c1") > 0,
          lit(lambda) * coalesce(col("cb").cast("double"), lit(0.0)) / col("c1"))
          .otherwise(lit(0.0))
          + lit(1.0 - lambda) * (col("c2") + lit(1.0)) / (col("n_corpus") + col("v_eff")))))

  /** Per-doc perplexity fold over (doc_id, pos, lp) transitions, in
    * position order — shared by the full and quantized scorers. */
  private def pplFold(scored: DataFrame): DataFrame =
    scored
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("lp")))).as("cs"))
      .select(col("doc_id"),
        size(col("cs")).cast("long").as("n_trans"),
        round(exp(-aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + x.getField("lp")) / size(col("cs"))), 6).as("ppl"))

  /** Per-document perplexity under the corpus's own interpolated
    * bigram LM. Output: (doc_id, n_trans, ppl) for docs with ≥1
    * transition. */
  def docPerplexity(docs: DataFrame, vocabSize: Int = 256,
                    maxBigrams: Int = 4096, lambda: Double = 0.7): DataFrame = {
    val stream = mapped(docs, topVocab(docs, vocabSize))
    val uni = stream.groupBy("w").agg(count(lit(1)).as("cu"))
    val totals = uni.agg(sum(col("cu")).as("n_corpus"),
      (count(lit(1)) + 1).as("v_eff")) // +1: smoothing headroom for V+1 types
    val trans = transitionsOf(stream)
    val bi = trans.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .orderBy(col("cb").desc, col("w1"), col("w2")).limit(maxBigrams)
    scoreTrans(trans, uni, bi, totals, lambda)
  }

  /** Fit the LM once and persist it — vocab, unigrams (with a
    * zero-count `<unk>` row so an OOV-free fit corpus still scores
    * OOV-bearing batches), pruned bigrams, totals, and the parameter
    * meta. Same frozen-artifact contract as
    * [[ImportanceSampling.saveModel]] / [[BpeTrainer.saveMerges]]. */
  def saveModel(docs: DataFrame, path: String, vocabSize: Int = 256,
                maxBigrams: Int = 4096): Unit = {
    val spark = docs.sparkSession
    val vocab = topVocab(docs, vocabSize)
    val stream = mapped(docs, vocab)
    val uni = stream.groupBy("w").agg(count(lit(1)).as("cu"))
    // totals FIRST: v_eff counts the fit corpus's real type count —
    // the synthetic <unk> row must not inflate it
    val totals = uni.agg(sum(col("cu")).as("n_corpus"),
      (count(lit(1)) + 1).as("v_eff"))
    val unkRow = spark.range(1).select(lit(Unk).as("w"), lit(0L).as("cu"))
    val uniOut = uni.unionByName(
      unkRow.join(uni.filter(col("w") === Unk), Seq("w"), "left_anti"))
    val bi = transitionsOf(stream).groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .orderBy(col("cb").desc, col("w1"), col("w2")).limit(maxBigrams)
    vocab.coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    uniOut.coalesce(1).write.mode("overwrite").parquet(s"$path/uni")
    bi.coalesce(1).write.mode("overwrite").parquet(s"$path/bi")
    totals.coalesce(1).write.mode("overwrite").parquet(s"$path/totals")
    graft.sources.IndexMeta.write(spark, s"$path/meta.json",
      Seq("vocabSize" -> vocabSize.toLong, "maxBigrams" -> maxBigrams.toLong))
  }

  /** Score a batch against a persisted LM (meta-checked): the frozen
    * quality boundary for every future ingest batch. */
  def perplexityWithModel(docs: DataFrame, path: String,
                          vocabSize: Int = 256, maxBigrams: Int = 4096,
                          lambda: Double = 0.7): DataFrame = {
    val spark = docs.sparkSession
    graft.sources.IndexMeta.check(spark, s"$path/meta.json", "bigram LM",
      Seq("vocabSize" -> vocabSize.toLong, "maxBigrams" -> maxBigrams.toLong))
    val trans = transitionsOf(mapped(docs, spark.read.parquet(s"$path/vocab")))
    scoreTrans(trans, spark.read.parquet(s"$path/uni"),
      spark.read.parquet(s"$path/bi"), spark.read.parquet(s"$path/totals"), lambda)
  }

  // ───────────────────── quantized deploy tier ─────────────────────
  // The 100 TB deploy does not ship count tables: it ships QUANTIZED
  // log-probs (the KenLM trick), so score time is pure table lookups
  // + a per-doc fold — no division, no interpolation arithmetic, and
  // the bigram table carries one small integer instead of counts.

  /** Quantize a persisted LM into its deploy artifact at `qPath`:
    * per stored bigram the FULL interpolated ln p(w2|w1), per vocab
    * word the backoff ln-prob (the exact value [[scoreTrans]] uses
    * when the bigram is pruned/absent, including the c1 = 0 guard
    * case), both at fixed point floor(lp · 2^scaleBits) — floor, not
    * round, the codebase's cross-engine determinism rule. λ is baked
    * into the codes (changing it means re-quantizing, exactly like a
    * real deploy). Error per transition < 2^−scaleBits, so quantized
    * perplexity sits in [ppl, ppl·exp(2^−scaleBits)] — the spec'd
    * bound LanguageModelSpec pins. */
  def quantizeModel(spark: SparkSession, path: String, qPath: String,
                    lambda: Double = 0.7, scaleBits: Int = 9): Unit = {
    require(scaleBits >= 1 && scaleBits <= 20, "scaleBits must be in 1..20")
    val meta = graft.sources.IndexMeta.read(spark, s"$path/meta.json", "bigram LM")
    val uni = spark.read.parquet(s"$path/uni")
    val bi = spark.read.parquet(s"$path/bi")
    val totals = spark.read.parquet(s"$path/totals")
    val s = (1L << scaleBits).toDouble
    val backoffLp = log(lit(1.0 - lambda) * (col("cu") + lit(1.0))
      / (col("n_corpus") + col("v_eff")))
    uni.crossJoin(broadcast(totals))
      .select(col("w"), floor(backoffLp * s).cast("int").as("q"))
      .coalesce(1).write.mode("overwrite").parquet(s"$qPath/quni")
    val biLp = log(
      when(col("c1") > 0, lit(lambda) * col("cb").cast("double") / col("c1"))
        .otherwise(lit(0.0))
        + lit(1.0 - lambda) * (col("c2") + lit(1.0)) / (col("n_corpus") + col("v_eff")))
    bi
      .join(broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("cu", "c1")), Seq("w1"))
      .join(broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("cu", "c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), floor(biLp * s).cast("int").as("q"))
      .coalesce(1).write.mode("overwrite").parquet(s"$qPath/qbi")
    spark.read.parquet(s"$path/vocab")
      .coalesce(1).write.mode("overwrite").parquet(s"$qPath/vocab")
    graft.sources.IndexMeta.write(spark, s"$qPath/meta.json",
      Seq("scaleBits" -> scaleBits.toLong,
        "lambdaMicro" -> Math.round(lambda * 1e6),
        "vocabSize" -> meta("vocabSize"), "maxBigrams" -> meta("maxBigrams")))
  }

  /** Score a batch against the QUANTIZED artifact: OOV-map against the
    * shipped vocab, then every transition's ln-prob is ONE lookup —
    * the bigram code, else the w2 backoff code — dequantized by a
    * single multiply. Same fold as the full scorer. */
  def perplexityWithQuantizedModel(docs: DataFrame, qPath: String): DataFrame = {
    val spark = docs.sparkSession
    val meta = graft.sources.IndexMeta.read(spark, s"$qPath/meta.json", "quantized LM")
    val scaleBits = meta.getOrElse("scaleBits",
      sys.error(s"quantized LM meta at $qPath lacks scaleBits")).toInt
    val s = (1L << scaleBits).toDouble
    val trans = transitionsOf(mapped(docs, spark.read.parquet(s"$qPath/vocab")))
    val qbi = spark.read.parquet(s"$qPath/qbi")
    val quni = spark.read.parquet(s"$qPath/quni")
      .select(col("w").as("w2"), col("q").as("qb"))
    pplFold(trans
      .join(broadcast(qbi), Seq("w1", "w2"), "left")
      .join(broadcast(quni), Seq("w2"))
      .withColumn("lp", coalesce(col("q"), col("qb")).cast("double") / s))
  }

  /** Artifact-size telemetry for the two LM tiers: table row counts
    * and on-disk bytes, plus the quantized/full byte ratio — the
    * observable behind "the deploy ships the quantized tier". One
    * metadata pass (no data scan for the byte counts). */
  def modelSizeStats(spark: SparkSession, path: String, qPath: String): DataFrame = {
    import spark.implicits._
    def bytes(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).getContentSummary(hp).getLength
    }
    val fullBytes = Seq("vocab", "uni", "bi", "totals").map(t => bytes(s"$path/$t")).sum
    val qBytes = Seq("vocab", "quni", "qbi").map(t => bytes(s"$qPath/$t")).sum
    Seq((
      spark.read.parquet(s"$path/bi").count(),
      spark.read.parquet(s"$qPath/qbi").count(),
      spark.read.parquet(s"$path/uni").count(),
      spark.read.parquet(s"$qPath/quni").count(),
      fullBytes, qBytes,
      BigDecimal(qBytes.toDouble / fullBytes)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("bi_rows", "qbi_rows", "uni_rows", "quni_rows",
        "full_bytes", "q_bytes", "byte_ratio")
  }
}
