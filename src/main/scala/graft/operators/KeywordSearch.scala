package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the lexical half of
  * a retrieval stack (the dense half is [[Similarity]]). Matches the
  * reference's news-search role (headline/summary text columns,
  * fetch_transform_news.py:104-111) generalized to scored ranking.
  *
  * Scale shape (100 TB): one explode of the corpus filtered to the
  * query's terms — Catalyst pushes the `isin` BEFORE the per-(doc,term)
  * aggregation, so shuffle volume is proportional to matching
  * postings, not corpus tokens. Document-frequency and corpus stats
  * are tiny aggregates (≤ #terms rows and 1 row) broadcast back; no
  * driver-side collect anywhere. An inverted-index materialization
  * (partitionBy(term)) would make repeat queries partition-pruned —
  * same layout trick as [[Similarity.buildIvfIndex]].
  *
  * Determinism: tf/dl/df/N are integers; per-term contributions are
  * fixed double expressions; the per-doc sum folds contributions in
  * SORTED TERM ORDER via a higher-order aggregate (list_sum over a
  * `list(... ORDER BY term)` replays it in any SQL engine), so scores
  * are byte-stable at any partitioning.
  */
object KeywordSearch {

  /** Top-k docs for a bag-of-words query, classic BM25 (k1, b). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "query needs at least one term")
    // stage the token array ONCE (lambda-captured expressions re-eval
    // per element; see Dedup.gramsOf)
    val toks = docs
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    // corpus stats: one row, broadcast
    val stats = toks.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // postings for the query terms only: filter before the aggregation
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // document frequency per term (tf is unique per (doc, term))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfr"))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("dfr") + lit(0.5)) / (col("dfr") + lit(0.5)))
          * col("tf")
          / (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("term"), col("contrib")))).as("cs"))
      .withColumn("score",
        round(aggregate(col("cs"), lit(0.0), (acc, x) => acc + x.getField("contrib")), 6))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
