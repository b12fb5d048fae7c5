package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.DataFrame
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
  * Scale shape (100 TB): the LM is TWO bounded aggregates — V+1
  * unigram rows and ≤maxBigrams bigram rows — both broadcast; scoring
  * is one posexplode, two broadcast joins, and one per-doc fold. The
  * only corpus-wide shuffles are the LM count aggregations themselves
  * and the per-doc regroup, all on compact keys. This is the
  * distributed equivalent of shipping a pruned KenLM to every node.
  *
  * Determinism: integer counts, a total-order vocab/bigram cutoff,
  * and the per-doc fold in token-position order — byte-stable at any
  * partitioning, and the whole construction replays in DuckDB.
  */
object LanguageModel {

  val Unk = "<unk>"

  /** Per-doc (doc_id, pos, w) token stream with OOV folded to
    * [[Unk]]; `vocab` is the top-`vocabSize` tokens. */
  private def mappedStream(docs: DataFrame, vocabSize: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "w")))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("__in").isNotNull, col("w")).otherwise(lit(Unk)).as("w"))
  }

  /** Per-document perplexity under the corpus's own interpolated
    * bigram LM. Output: (doc_id, n_trans, ppl) for docs with ≥1
    * transition. */
  def docPerplexity(docs: DataFrame, vocabSize: Int = 256,
                    maxBigrams: Int = 4096, lambda: Double = 0.7): DataFrame = {
    val stream = mappedStream(docs, vocabSize)
    // unigram model: V+1 rows (incl <unk>), one-row total alongside
    val uni = stream.groupBy("w").agg(count(lit(1)).as("cu"))
    val nTotal = uni.agg(sum(col("cu")).as("n_corpus"),
      (count(lit(1)) + 1).as("v_eff")) // +1: smoothing headroom for V+1 types
    // bigram model over adjacent mapped tokens, pruned to a total-order
    // top-maxBigrams; per-doc lag needs the doc's stream co-located
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val trans = stream
      .withColumn("w1", lag(col("w"), 1).over(byDoc))
      .filter(col("w1").isNotNull)
      .select(col("doc_id"), col("pos"), col("w1"), col("w").as("w2"))
    val bi = trans.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .orderBy(col("cb").desc, col("w1"), col("w2")).limit(maxBigrams)
    val scored = trans
      .join(broadcast(bi), Seq("w1", "w2"), "left")
      .join(broadcast(uni.withColumnRenamed("w", "w1")
        .withColumnRenamed("cu", "c1")), Seq("w1"))
      .join(broadcast(uni.withColumnRenamed("w", "w2")
        .withColumnRenamed("cu", "c2")), Seq("w2"))
      .crossJoin(broadcast(nTotal))
      .withColumn("lp", log(
        lit(lambda) * coalesce(col("cb").cast("double"), lit(0.0)) / col("c1")
          + lit(1.0 - lambda) * (col("c2") + lit(1.0)) / (col("n_corpus") + col("v_eff"))))
    scored.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("lp")))).as("cs"))
      .select(col("doc_id"),
        size(col("cs")).cast("long").as("n_trans"),
        round(exp(-aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + x.getField("lp")) / size(col("cs"))), 6).as("ppl"))
  }
}
