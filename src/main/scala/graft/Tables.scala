package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-first readers over the driver-generated star schema
  * (TESTDATA.md). One parquet file per table under the sf dir.
  *
  * Scale notes (100 TB design):
  *  - Every reader is a plain parquet scan: Catalyst pushes filters and
  *    prunes columns into the scan, and on a partitioned lake
  *    (`partitionBy(date)`) partition pruning is automatic. Nothing here
  *    materializes or collects.
  *  - `region`/`nation` are bounded dims (25/5 rows at any SF) — always
  *    broadcast-joined (see `broadcast(...)` at call sites).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events.ts` arrives in one of two physical parquet types depending on
    * the generator vintage: TIMESTAMP(NANOS) (Spark 4 reads it only as a raw
    * nanosecond Long under `spark.sql.legacy.parquet.nanosAsLong=true`) or
    * TIMESTAMP(MICROS) (native TimestampType). Engine contract is the ns
    * Long — every consumer sorts/windows/sessionizes on it — so we
    * normalize here, at the single read chokepoint, and derive:
    *  - `ts` (ns Long, kept for total ordering),
    *  - `event_date` (DATE, UTC) for daily rollups,
    *  - `ts_sec` (epoch seconds, BIGINT) for oracle-safe output.
    * Integer `div`/`unix_micros` everywhere — double math corrupts
    * 1e18-scale longs. The DuckDB oracle side (`epoch_ns(ts)`) is
    * precision-agnostic, so only this Spark-side read needs to care. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEvents(load(spark, dir, "events"))

  /** Time-range events scan: the predicate is applied to the RAW parquet
    * column, in the raw column's own type, BEFORE the ns-Long
    * normalization — so it reaches the parquet reader as a pushed filter
    * (row-group + page pruning). Filtering the derived `ts` instead would
    * wrap the column in `unix_micros(...) * 1000` and read the full scan.
    * On a 100 TB events lake that is the difference between reading one
    * day and reading the decade. [fromSec, untilSec) are UTC epoch secs. */
  def eventsBetween(spark: SparkSession, dir: String,
                    fromSec: Long, untilSec: Long): DataFrame = {
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    val raw = load(spark, dir, "events")
    val filtered = raw.schema("ts").dataType match {
      case dt @ (TimestampType | TimestampNTZType) =>
        // foldable literals: constant-folded before pushdown, so the scan
        // sees plain `ts >= TIMESTAMP '...'` bounds in the column's type
        raw.filter(col("ts") >= timestamp_seconds(lit(fromSec)).cast(dt) &&
                   col("ts") <  timestamp_seconds(lit(untilSec)).cast(dt))
      case _ =>
        raw.filter(col("ts") >= lit(fromSec * 1000000000L) &&
                   col("ts") <  lit(untilSec * 1000000000L))
    }
    normalizeEvents(filtered)
  }

  private def normalizeEvents(raw: DataFrame): DataFrame = {
    val ns = raw.schema("ts").dataType match {
      // The micros vintage surfaces as TIMESTAMP or (isAdjustedToUTC=false
      // parquet metadata) TIMESTAMP_NTZ; under the engine-wide UTC session
      // timezone the NTZ→TZ cast is the identity on the underlying micros.
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)) * lit(1000L))
      case _ => raw // already a ns Long (nanosAsLong path)
    }
    ns.withColumn("ts_sec", expr("ts div 1000000000"))
      .withColumn("event_date", to_date(timestamp_seconds(expr("ts div 1000000000"))))
  }
}
