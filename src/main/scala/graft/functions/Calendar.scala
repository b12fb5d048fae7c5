package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar column functions.
  *
  * P18 — "last trading day": weekend dates fold back to Friday.
  * Reference: full_stock_pipeline.py:51-57 (repeated at 160-166, 242-247).
  * Pure `Column` logic — no UDF, stays in codegen.
  */
object Calendar {
  /** Spark `dayofweek`: 1=Sunday .. 7=Saturday.
    * Saturday -> -1 day (Friday); Sunday -> -2 days (Friday). */
  def lastTradingDay(d: Column): Column =
    when(dayofweek(d) === 7, date_sub(d, 1))
      .when(dayofweek(d) === 1, date_sub(d, 2))
      .otherwise(d)

  /** P19 — next-day shift (prediction target date).
    * Reference: analyze_news_stock_patterns.py:217. */
  def nextDay(d: Column): Column = date_add(d, 1)
}
