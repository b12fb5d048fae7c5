package graft.serve

import graft.Tables
import graft.functions.Indicators
import graft.operators.DailySeries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference dashboard's ten loaders (dashboard/utils/data_loader.py:
  * 29-235) as named DataFrame views over the engine's series model
  * (user_id = symbol, DailySeries = price history).
  *
  * Serving notes: the reference caches each loader for 1h
  * (`@st.cache_data(ttl=3600)`); the Spark-native equivalents of that
  * tier are `df.cache()` on hot views or precomputed gold tables — the
  * view functions below are the gold-table definitions. Every view is
  * bounded (top-k or per-key slice): nothing here collects an unbounded
  * result to the driver.
  */
object Views {

  /** data_loader.py:23-40 — company dropdown list (A5). */
  def companyList(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .withColumn("label", concat(lit("User ("), col("user_id"), lit(")")))
      .orderBy("user_id")

  /** data_loader.py:43-57 — one symbol's series in a date range, with
    * the dashboard's indicator columns (indicators.py). */
  def stockData(spark: SparkSession, dir: String, userId: Long,
                start: String, end: String): DataFrame = {
    val w = Indicators.series("user_id", "d")
    DailySeries(spark, dir)
      .filter(col("user_id") === userId && col("d").between(start, end))
      .withColumn("sma_14", Indicators.sma(col("close"), w, 14))
      .withColumn("ema_14", Indicators.ema(spark, col("close"), w, 14))
      .withColumn("rsi_14", Indicators.rsi(col("close"), w, 14))
      .withColumn("bb_mid", Indicators.bollinger(col("close"), w, 20)._1)
      .orderBy("d")
  }

  /** data_loader.py:60-80 — latest prediction per symbol (from the
    * PricePredictor output table). */
  def stockPredictions(predictions: DataFrame, userId: Long): DataFrame =
    predictions.filter(col("user_id") === userId)
      .orderBy(col("d").desc).limit(1)

  /** data_loader.py:83-103 — latest 5 "news" items (events) for a symbol (O4). */
  def companyNews(spark: SparkSession, dir: String, userId: Long): DataFrame =
    Tables.events(spark, dir)
      .filter(col("user_id") === userId)
      .orderBy(col("ts").desc, col("event_id").desc)
      .select("event_id", "event_type", "value", "event_date")
      .limit(5)

  /** data_loader.py:110-120 — patterns view capped at 100 (J4+O6). */
  def tradingPatterns(spark: SparkSession, dir: String): DataFrame = {
    val w = Indicators.series("user_id", "d")
    DailySeries(spark, dir)
      .withColumn("c1", lag(col("close"), 1).over(w))
      .withColumn("c2", lag(col("close"), 2).over(w))
      .filter(col("c1").isNotNull && col("c2").isNotNull)
      .withColumn("pattern",
        when(col("close") > col("c1") && col("c1") > col("c2"), "Bullish Trend")
          .when(col("close") < col("c1") && col("c1") < col("c2"), "Bearish Trend")
          .otherwise("Neutral"))
      .filter(col("pattern") =!= "Neutral")
      .select("user_id", "d", "pattern")
      .orderBy(col("d").desc, col("user_id"))
      .limit(100)
  }

  private def latestChange(spark: SparkSession, dir: String): DataFrame = {
    val w = Indicators.series("user_id", "d")
    val latest = Window.partitionBy("user_id").orderBy(col("d").desc)
    DailySeries(spark, dir)
      .withColumn("pct_change", Indicators.pctChange(col("close"), w))
      .withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1 && col("pct_change").isNotNull)
      .select("user_id", "d", "close", "pct_change")
  }

  /** data_loader.py:138-154 — top-10 gainers on the latest day (J5+O1). */
  def topGainers(spark: SparkSession, dir: String): DataFrame =
    latestChange(spark, dir).orderBy(col("pct_change").desc, col("user_id")).limit(10)

  /** data_loader.py:157-175 — top-10 losers. */
  def topLosers(spark: SparkSession, dir: String): DataFrame =
    latestChange(spark, dir).orderBy(col("pct_change").asc, col("user_id")).limit(10)

  /** data_loader.py:201-213 — market-wide daily average (A2). */
  def marketBehavior(spark: SparkSession, dir: String): DataFrame =
    DailySeries(spark, dir)
      .groupBy("d")
      .agg(avg("close").as("avg_close"), count(lit(1)).as("n_users"))
      .orderBy("d")

  /** data_loader.py:218-232 — top-10 intraday volatility (O3). */
  def highVolatility(spark: SparkSession, dir: String): DataFrame = {
    val latest = Window.partitionBy("user_id").orderBy(col("d").desc)
    DailySeries(spark, dir)
      .filter(col("low") > 0)
      .withColumn("pct_range", (col("high") - col("low")) / col("low") * 100)
      .withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1)
      .select("user_id", "d", "pct_range")
      .orderBy(col("pct_range").desc, col("user_id"))
      .limit(10)
  }

  /** data_loader.py:125-135 — per-symbol sentiment/analysis rollup slice
    * (over the NewsStockAnalysis output). */
  def newsAnalysis(analysis: DataFrame, userId: Long): DataFrame =
    analysis.filter(col("user_id") === userId).orderBy(col("d").desc).limit(30)
}
