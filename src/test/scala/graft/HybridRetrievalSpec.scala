package graft

import graft.operators.HybridRetrieval

/** RRF fusion: rank assignment, both-lists dominance, and NULL
  * contribution semantics for single-list hits.
  */
class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Double)*) =
    rows.toDF("id", "score")

  test("ranks: dense row numbers by score desc with id tie-break") {
    val r = HybridRetrieval.ranks(list(1L -> 0.5, 2L -> 0.9, 3L -> 0.5), "id", "score")
      .as[(Long, Long)].collect().toMap
    assert(r === Map(2L -> 1L, 1L -> 2L, 3L -> 3L))
  }

  test("a doc present in both lists outranks equal-rank single-list docs") {
    val a = HybridRetrieval.ranks(list(10L -> 1.0, 11L -> 0.9), "id", "score")
    val b = HybridRetrieval.ranks(list(10L -> 1.0, 12L -> 0.9), "id", "score")
    val fused = HybridRetrieval.rrfFuse(a, b)
      .as[(Long, Double, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(fused(10L)._2 > fused(11L)._2 && fused(10L)._2 > fused(12L)._2)
    // absent list ⇒ NULL rank and zero contribution
    assert(fused(11L)._3 === Some(2L) && fused(11L)._4 === None)
    assert(fused(11L)._2 === fused(12L)._2, "symmetric single-list docs tie")
  }

  test("rrf value matches the closed form 1/(c+ra) + 1/(c+rb)") {
    val a = HybridRetrieval.ranks(list(1L -> 1.0), "id", "score")
    val b = HybridRetrieval.ranks(list(1L -> 1.0), "id", "score")
    val rrf = HybridRetrieval.rrfFuse(a, b, c = 60)
      .select("rrf").as[Double].head()
    assert(math.abs(rrf - math.rint((2.0 / 61.0) * 1e6) / 1e6) < 1e-12)
  }
}
