package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-first file sources (SURVEY.md §2.1).
  *
  * The reference's HTTP fetchers (S1/S10/S12) are connector-layer code
  * that lands files; the engine's sources start at the landed files:
  *
  *  - S4: JSON scan with a filename-derived key column — the reference
  *    parses `symbol` out of `{symbol}_{yyyymmdd}.json` names
  *    (full_stock_pipeline.py:203); we recover it relationally with
  *    `input_file_name()` + `regexp_extract`, which stays inside the
  *    scan stage (no extra pass).
  *  - S6: vectorized parquet scan (Tables).
  *  - S9: CSV with header validation against an expected column list
  *    (fetch_tech_companies.py:37-41) — schema drift is an explicit
  *    error at read time, not a downstream surprise.
  *
  * Scale: explicit schemas skip Spark's whole-file schema inference
  * pass (which reads every byte of 100 TB before the query even
  * starts); date-partitioned layouts prune at the directory level.
  */
object Sources {

  /** S4 — JSON scan + key column recovered from the file name. */
  def jsonWithFilenameKey(spark: SparkSession, path: String, schema: StructType,
                          keyCol: String, keyPattern: String): DataFrame =
    spark.read.schema(schema).json(path)
      .withColumn(keyCol, regexp_extract(input_file_name(), keyPattern, 1))

  /** S9 — CSV source with strict header validation. */
  def csvValidated(spark: SparkSession, path: String, expected: Seq[String]): DataFrame = {
    val df = spark.read.option("header", "true").option("inferSchema", "false").csv(path)
    val missing = expected.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"CSV header mismatch: missing ${missing.mkString(", ")} (got ${df.columns.mkString(", ")})")
    df.select(expected.map(col): _*)
  }
}
