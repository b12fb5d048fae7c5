package graft

import graft.operators.LanguageModel
import org.apache.spark.sql.functions._

/** Bigram-LM perplexity: sequence sensitivity (the property unigram
  * surprisal lacks), layout independence, and backoff smoothness.
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // a corpus with one dominant phrase pattern + one scrambled doc made
  // of the SAME words (identical unigram profile, alien sequence)
  private val fluent = Seq.tabulate(20)(i =>
    (i.toLong, "the quick brown fox jumps over the lazy dog"))
  private val salad = Seq((100L, "dog the over quick lazy brown the jumps fox"))
  private val corpus = (fluent ++ salad).toDF("doc_id", "text")

  test("word salad scores higher perplexity than fluent docs with the same unigrams") {
    val ppl = LanguageModel.docPerplexity(corpus, vocabSize = 64, maxBigrams = 64)
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(ppl(100L) > ppl(0L) * 2,
      s"salad=${ppl(100L)} fluent=${ppl(0L)} — sequence signal missing")
  }

  test("perplexity is layout-independent") {
    val a = LanguageModel.docPerplexity(corpus)
      .as[(Long, Long, Double)].collect().toSet
    val b = LanguageModel.docPerplexity(corpus.repartition(5))
      .as[(Long, Long, Double)].collect().toSet
    assert(a === b)
  }

  test("bigram pruning backs off smoothly: scores stay finite and positive") {
    val tiny = LanguageModel.docPerplexity(corpus, vocabSize = 64, maxBigrams = 2)
      .select("ppl").as[Double].collect()
    assert(tiny.forall(p => p > 0 && java.lang.Double.isFinite(p)))
    // heavier pruning can only make docs look LESS predictable overall
    val full = LanguageModel.docPerplexity(corpus, vocabSize = 64, maxBigrams = 64)
      .agg(sum("ppl")).as[Double].head()
    val pruned = LanguageModel.docPerplexity(corpus, vocabSize = 64, maxBigrams = 2)
      .agg(sum("ppl")).as[Double].head()
    assert(pruned >= full)
  }

  test("frozen LM: perplexityWithModel ≡ docPerplexity on the fit corpus; new batch scored; meta guards") {
    val path = java.nio.file.Files.createTempDirectory("graft-lm").toString + "/lm"
    LanguageModel.saveModel(corpus, path, vocabSize = 64, maxBigrams = 64)
    val frozen = LanguageModel.perplexityWithModel(corpus, path,
      vocabSize = 64, maxBigrams = 64).as[(Long, Long, Double)].collect().toSet
    val fresh = LanguageModel.docPerplexity(corpus, vocabSize = 64, maxBigrams = 64)
      .as[(Long, Long, Double)].collect().toSet
    assert(frozen === fresh)
    // an unseen batch with OOV tokens scores finitely off the frozen
    // boundary: the fluent phrasing stays cheaper than scrambled OOV
    val batch = Seq(
      (300L, "the quick brown fox jumps over the lazy dog"),
      (301L, "xylophone quark zephyr blimp ostrich waffle")).toDF("doc_id", "text")
    val scored = LanguageModel.perplexityWithModel(batch, path,
      vocabSize = 64, maxBigrams = 64)
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(java.lang.Double.isFinite(scored(300L)) && java.lang.Double.isFinite(scored(301L)))
    assert(scored(300L) < scored(301L), s"frozen boundary lost: $scored")
    // wrong parameters fail loudly
    intercept[IllegalArgumentException] {
      LanguageModel.perplexityWithModel(batch, path, vocabSize = 128)
    }
  }

  test("quantized deploy tier: perplexity within the fixed-point bound, meta guards, telemetry") {
    val root = java.nio.file.Files.createTempDirectory("graft-lmq").toString
    LanguageModel.saveModel(corpus, s"$root/full", vocabSize = 64, maxBigrams = 64)
    LanguageModel.quantizeModel(spark, s"$root/full", s"$root/q", scaleBits = 9)
    val batch = corpus.unionByName(
      Seq((301L, "xylophone quark zephyr blimp ostrich waffle")).toDF("doc_id", "text"))
    val full = LanguageModel.perplexityWithModel(batch, s"$root/full",
      vocabSize = 64, maxBigrams = 64)
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    val q = LanguageModel.perplexityWithQuantizedModel(batch, s"$root/q")
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(q.keySet === full.keySet, "both tiers must score the same docs")
    // floor-quantization can only RAISE each transition's -lnp by
    // < 2^-9, so ppl_q ∈ [ppl·(1−ε), ppl·exp(2^-9)+ε]
    val hi = math.exp(math.pow(2.0, -9)) + 1e-4
    q.foreach { case (id, pq) =>
      val ratio = pq / full(id)
      assert(ratio >= 1.0 - 1e-4 && ratio <= hi,
        s"doc $id quantization error out of bound: full=${full(id)} q=$pq ratio=$ratio")
    }
    // the quantized scorer is genuinely coarser: at a BRUTAL scale
    // (2^1) the scores must diverge — proving the q codes, not the
    // full tables, produced the result above
    LanguageModel.quantizeModel(spark, s"$root/full", s"$root/q1", scaleBits = 1)
    val coarse = LanguageModel.perplexityWithQuantizedModel(batch, s"$root/q1")
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(coarse.exists { case (id, p) => math.abs(p / full(id) - 1) > 0.01 },
      "scaleBits=1 scoring suspiciously equals the full model")
    // telemetry: quantized tables mirror the full tiers' row counts
    val st = LanguageModel.modelSizeStats(spark, s"$root/full", s"$root/q").collect().head
    assert(st.getAs[Long]("qbi_rows") === st.getAs[Long]("bi_rows"))
    assert(st.getAs[Long]("quni_rows") === st.getAs[Long]("uni_rows"))
    assert(st.getAs[Long]("full_bytes") > 0 && st.getAs[Long]("q_bytes") > 0)
    // an unbuilt quantized path fails loudly
    intercept[IllegalArgumentException] {
      LanguageModel.perplexityWithQuantizedModel(batch, s"$root/missing")
    }
  }

  test("single-token and empty docs are excluded (no transitions)") {
    val d = (corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ++
      Seq((200L, "solo"), (201L, ""))).toDF("doc_id", "text")
    val ids = LanguageModel.docPerplexity(d).select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(200L) && !ids.contains(201L))
  }
}
