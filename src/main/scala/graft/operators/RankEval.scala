package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the harness that turns "is the ANN
  * tier good enough?" from a one-off recall probe into a standing,
  * oracle-checkable metric set: per probe, recall@k, MRR@k and
  * nDCG@k of a CANDIDATE ranking against an exact TRUTH ranking
  * (binary relevance = membership in the truth top-k). This is how a
  * retrieval stack is actually tuned — recall bounds gate correctness
  * (q_ann_ivf_recall), these metrics rank CONFIGURATIONS (nProbe,
  * bands, shortlist) against each other.
  *
  * Scale shape: both inputs are bounded top-k lists (≤ probes × k
  * rows) — the corpus-scale work already happened inside the
  * retrievers; everything here is a per-probe aggregation over ≤ k
  * rows, with the one double sum (DCG) folded in candidate-rank order
  * so scores are byte-stable and replay in any SQL engine (log2 via
  * the ln ratio, round 6).
  */
object RankEval {

  private def log2(x: Column): Column = log(x) / log(lit(2.0))

  /** Per-probe metrics of `cand` vs `truth` (both (q_id, n_id, rnk)),
    * at cutoff `k`. Probes present in the truth but missing from the
    * candidate list entirely (an ANN tier that surfaced nothing) score
    * zeros rather than dropping out. Output, one row per truth probe:
    * (q_id, n_rel, n_cand, hits, recall, mrr, ndcg). */
  def metrics(truth: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val t = truth.filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), lit(1L).as("rel"))
    val tc = t.groupBy("q_id").agg(count(lit(1)).as("n_rel"))
    // both sides are bounded top-k lists — broadcast (derived frames
    // carry no stats, so the planner would otherwise sort-merge)
    val j = cand.filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk").cast("long").as("rnk"))
      .join(broadcast(t), Seq("q_id", "n_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val perProbe = j.groupBy("q_id").agg(
      count(lit(1)).as("n_cand"),
      sum(col("rel")).as("hits"),
      min(when(col("rel") === 1L, col("rnk"))).as("first_rel"),
      // DCG folds in candidate-rank order — the deterministic double sum
      sort_array(collect_list(struct(col("rnk"), col("rel")))).as("cs"))
    val dcg = aggregate(col("cs"), lit(0.0),
      (acc, x) => acc + x.getField("rel") / log2(x.getField("rnk") + lit(1.0)))
    val idcg = aggregate(sequence(lit(1L), least(col("n_rel"), lit(k.toLong))),
      lit(0.0), (acc, i) => acc + lit(1.0) / log2(i + lit(1.0)))
    tc.join(broadcast(perProbe), Seq("q_id"), "left")
      .select(
        col("q_id"), col("n_rel"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / col("n_rel"), 6).as("recall"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6).as("mrr"),
        round(
          when(idcg > 0, coalesce(dcg, lit(0.0)) / idcg).otherwise(lit(0.0)), 6).as("ndcg"))
  }
}
