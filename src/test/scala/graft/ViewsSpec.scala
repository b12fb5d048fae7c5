package graft

import graft.serve.Views
import org.apache.spark.sql.functions._

/** The ten dashboard loaders (data_loader.py:29-235) against sf0.001:
  * shape, bounds, and internal consistency.
  */
class ViewsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("companyList: one row per user, labeled") {
    val cl = Views.companyList(spark, dir)
    assert(cl.count() > 0)
    assert(cl.columns.toSeq === Seq("user_id", "label"))
    assert(cl.count() === cl.select("user_id").distinct().count())
  }

  test("stockData: range-bounded single-symbol series with indicators") {
    val anyUser = Views.companyList(spark, dir).head().getLong(0)
    val sd = Views.stockData(spark, dir, anyUser, "2024-01-01", "2024-01-31")
    assert(sd.count() > 0)
    assert(sd.select("user_id").distinct().count() === 1)
    for (c <- Seq("sma_14", "ema_14", "rsi_14", "bb_mid"))
      assert(sd.columns.contains(c))
  }

  test("topGainers/topLosers: ≤10 rows, ordered, disjoint ends") {
    val g = Views.topGainers(spark, dir).collect()
    val l = Views.topLosers(spark, dir).collect()
    assert(g.length <= 10 && l.length <= 10)
    val gPct = g.map(_.getAs[Double]("pct_change"))
    assert(gPct.sameElements(gPct.sortBy(-_)), "gainers desc")
    assert(gPct.head >= l.map(_.getAs[Double]("pct_change")).head)
  }

  test("marketBehavior covers every trading day once") {
    val mb = Views.marketBehavior(spark, dir)
    assert(mb.count() === mb.select("d").distinct().count())
  }

  test("highVolatility and tradingPatterns are bounded top-k") {
    assert(Views.highVolatility(spark, dir).count() <= 10)
    assert(Views.tradingPatterns(spark, dir).count() <= 100)
  }

  test("companyNews: latest-5 slice for a symbol") {
    val anyUser = Views.companyList(spark, dir).head().getLong(0)
    val news = Views.companyNews(spark, dir, anyUser).collect()
    assert(news.length <= 5 && news.nonEmpty)
  }

  test("stockPredictions/newsAnalysis slice their input tables") {
    val preds = graft.ml.PricePredictor.predictNextDay(spark, dir)
    val anyUser = preds.head().getLong(0)
    assert(Views.stockPredictions(preds, anyUser).count() === 1)
  }
}
