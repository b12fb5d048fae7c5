package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — fuse a lexical ranking ([[KeywordSearch]]) with
  * a dense ranking ([[Similarity]]) by reciprocal-rank fusion
  * (Cormack et al., SIGIR '09, public method):
  *
  *   rrf(d) = Σ_lists 1 / (c + rank_list(d))
  *
  * RRF needs no score calibration between the lists (BM25 and cosine
  * live on incomparable scales), which is why it is the standard
  * first fusion in a lexical+vector stack.
  *
  * Scale shape: fusion operates on the two TOP-K LISTS, never the
  * corpus — the corpus-scale work already happened inside the two
  * retrievers (each independently 100 TB-shaped and oracle-verified).
  * The rank window and the full outer join here touch ≤ 2k rows; the
  * join is SHUFFLE_HASH to keep the no-sort-merge-join invariant.
  */
object HybridRetrieval {

  /** (id, rank) from a scored top-k list — rank = dense row number by
    * (score desc, id). The window is UNPARTITIONED by design: its
    * input is a bounded top-k list, not a corpus. */
  def ranks(scored: DataFrame, idCol: String, scoreCol: String): DataFrame =
    scored.select(col(idCol).as("id"),
      row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol)))
        .cast("long").as("rank"))

  /** RRF-fuse two (id, rank) lists. Output: (id, rrf, rank_a, rank_b)
    * — absent-in-list ranks are NULL and contribute 0. The a-term and
    * b-term add in fixed order, so scores are byte-stable. */
  def rrfFuse(a: DataFrame, b: DataFrame, c: Int = 60): DataFrame = {
    val aa = a.select(col("id"), col("rank").as("rank_a")).alias("a")
    val bb = b.select(col("id"), col("rank").as("rank_b")).alias("b")
    aa.join(bb.hint("SHUFFLE_HASH"), aa("id") <=> bb("id"), "full_outer")
      .select(
        coalesce(col("a.id"), col("b.id")).as("id"),
        round(
          coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0)), 6).as("rrf"),
        col("rank_a"), col("rank_b"))
  }
}
