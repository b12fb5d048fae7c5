package graft

import graft.operators.RankEval
import org.apache.spark.sql.DataFrame

/** Hand-computed IR-metric fixtures for the retrieval evaluation
  * harness: recall@k, MRR@k, nDCG@k against an exact truth ranking.
  */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def rank(rows: (Long, Long, Long)*): DataFrame =
    rows.toDF("q_id", "n_id", "rnk")

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("perfect candidate scores 1.0 across the board; binary relevance is order-blind on full recall") {
    val truth = rank((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
    val perfect = RankEval.metrics(truth, truth, 3).collect().head
    assert(perfect.getAs[Double]("recall") === 1.0)
    assert(perfect.getAs[Double]("mrr") === 1.0)
    assert(perfect.getAs[Double]("ndcg") === 1.0)
    // reversed: every truth member present (recall 1, mrr 1 — rank 1
    // IS relevant) but the gain order is worst-case → ndcg < 1
    val reversed = rank((1L, 12L, 1L), (1L, 11L, 2L), (1L, 10L, 3L))
    val r = RankEval.metrics(truth, reversed, 3).collect().head
    assert(r.getAs[Double]("recall") === 1.0)
    assert(r.getAs[Double]("mrr") === 1.0)
    assert(r.getAs[Double]("ndcg") === 1.0) // binary relevance: same gains, any order
  }

  test("misses at the top cost MRR and nDCG exactly as the closed form says") {
    val truth = rank((1L, 10L, 1L), (1L, 11L, 2L))
    // candidate: irrelevant at rank 1, one truth member at rank 2
    val cand = rank((1L, 99L, 1L), (1L, 10L, 2L))
    val m = RankEval.metrics(truth, cand, 2).collect().head
    assert(m.getAs[Long]("n_rel") === 2L && m.getAs[Long]("hits") === 1L)
    assert(m.getAs[Double]("recall") === 0.5)
    assert(m.getAs[Double]("mrr") === 0.5)
    val expected = BigDecimal((1.0 / log2(3.0)) / (1.0 / log2(2.0) + 1.0 / log2(3.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m.getAs[Double]("ndcg") === expected)
  }

  test("a probe the candidate tier never answered scores zeros, not a dropped row") {
    val truth = rank((1L, 10L, 1L), (2L, 20L, 1L))
    val cand = rank((1L, 10L, 1L)) // probe 2 missing entirely
    val out = RankEval.metrics(truth, cand, 5).collect()
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Double]("recall"), r.getAs[Double]("mrr"), r.getAs[Double]("ndcg"))).toMap
    assert(out(1L) === ((1.0, 1.0, 1.0)))
    assert(out(2L) === ((0.0, 0.0, 0.0)))
  }

  test("cutoff k truncates both sides before scoring") {
    val truth = rank((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
    // candidate finds 12 only beyond the cutoff → it must not count
    val cand = rank((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
    val m = RankEval.metrics(truth, cand, 2).collect().head
    assert(m.getAs[Long]("n_rel") === 2L)
    assert(m.getAs[Long]("n_cand") === 2L)
    assert(m.getAs[Double]("recall") === 1.0)
  }
}
