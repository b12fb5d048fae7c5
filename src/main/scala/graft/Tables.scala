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

  /** `events.ts` is parquet TIMESTAMP(NANOS): Spark 4 reads it only as a
    * raw nanosecond Long (`spark.sql.legacy.parquet.nanosAsLong=true`,
    * set by Verify/Bench). We derive the columns every consumer needs:
    *  - `ts` (ns Long, kept for total ordering),
    *  - `event_date` (DATE, UTC) for daily rollups,
    *  - `ts_sec` (epoch seconds, BIGINT) for oracle-safe output.
    * Integer `div` everywhere — double math corrupts 1e18-scale longs. */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts_sec", expr("ts div 1000000000"))
      .withColumn("event_date", to_date(timestamp_seconds(expr("ts div 1000000000"))))
}
