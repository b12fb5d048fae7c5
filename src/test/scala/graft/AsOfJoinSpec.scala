package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._

/** Native as-of join: fixture semantics, native ≡ fallback equivalence
  * on a randomized two-table workload, and plan shape (custom exec node
  * present, one shuffle per side).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 35L, 99.0),
    ("B", 15L, 50.0), ("B", 16L, 51.0),
    ("C", 5L, 7.0) // no quote ever
  ).toDF("sym", "t", "trade_px")

  private def quotes = Seq(
    ("A", 8L, 99.5), ("A", 20L, 100.5), ("A", 30L, 98.5),
    ("B", 1L, 49.0),
    ("D", 2L, 1.0) // never matches
  ).toDF("sym", "qt", "quote_px")

  private val expected = Set(
    ("A", 10L, 100.0, Some(8L), Some(99.5)),
    ("A", 20L, 101.0, Some(20L), Some(100.5)), // inclusive ≤
    ("A", 35L, 99.0, Some(30L), Some(98.5)),
    ("B", 15L, 50.0, Some(1L), Some(49.0)),
    ("B", 16L, 51.0, Some(1L), Some(49.0)),
    ("C", 5L, 7.0, None, None))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Double, Option[Long], Option[Double])].collect().toSet

  test("native as-of join matches hand-computed fixture (incl. no-match null pad)") {
    val out = AsOf.join(trades, quotes, Seq("sym"), "t", "qt")
    assert(out.columns.toSeq === Seq("sym", "t", "trade_px", "qt", "quote_px"))
    assert(canon(out) === expected)
  }

  test("right-side columns are nullable in the public schema (null-pad visible to optimizer)") {
    val out = AsOf.join(trades, quotes, Seq("sym"), "t", "qt")
    // pre-fix the Project rebuilt right columns from rPlan.output with
    // nullable=false, letting the optimizer fold isNull(padded) → false
    assert(out.schema("qt").nullable && out.schema("quote_px").nullable, out.schema.treeString)
    val unmatched = out.filter($"quote_px".isNull)
    assert(unmatched.select("sym").as[String].collect().toSeq === Seq("C"))
  }

  test("plan uses AsOfJoinExec with one exchange per side") {
    val plan = AsOf.join(trades, quotes, Seq("sym"), "t", "qt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native exec missing:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 2, plan)
  }

  test("native ≡ window-union fallback on a randomized workload") {
    val rng = new scala.util.Random(17)
    val lRows = for { s <- Seq("x", "y", "z"); _ <- 1 to 60 }
      yield (s, rng.nextInt(1000).toLong, rng.nextInt(100) / 1.0)
    val rRows = for { s <- Seq("x", "y", "w"); _ <- 1 to 40 }
      yield (s, rng.nextInt(1000).toLong, rng.nextInt(100) / 1.0)
    // dedup times per key: as-of ties within a side are order-ambiguous
    val l = lRows.toDF("sym", "t", "trade_px").dropDuplicates("sym", "t")
    val r = rRows.toDF("sym", "qt", "quote_px").dropDuplicates("sym", "qt")
    val native = canon(AsOf.join(l, r, Seq("sym"), "t", "qt"))
    val fb = canon(AsOf.fallback(l, r, Seq("sym"), "t", "qt"))
    assert(native === fb)
    assert(native.nonEmpty)
  }

  test("reference J6 shape: previous close before each prediction date") {
    // the two-table general case of full_stock_pipeline.py:397-399
    val history = Seq(("A", 1L, 10.0), ("A", 3L, 12.0), ("A", 7L, 11.0))
      .toDF("sym", "hd", "close")
    val preds = Seq(("A", 2L), ("A", 3L), ("A", 9L)).toDF("sym", "pd")
    val out = AsOf.join(preds, history, Seq("sym"), "pd", "hd")
      .select("sym", "pd", "close").as[(String, Long, Double)].collect().toSet
    assert(out === Set(("A", 2L, 10.0), ("A", 3L, 12.0), ("A", 9L, 11.0)))
  }
}
