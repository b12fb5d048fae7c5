package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are built from the registry populated by
  * [[Queries]] (relational surface) and [[QueriesText]] (LLM-pipeline
  * surface). Every oracle-backed entry is hash-compared against DuckDB
  * by the driver at sf0.01; oracle-less entries (signature-based ops,
  * UDF sentiment) get rows-only checks and are fixture-verified in
  * src/test/scala instead.
  */
object SparkEntry {

  private def all: Map[String, (Queries.Q, Option[String])] = {
    QueriesText.init()
    Queries.registry.toMap
  }

  /** Flagship query on sf0.001; driver smoke-checks rows>0.
    * (Kept off the `events` table: the driver's own SparkSession may
    * not carry the nanosAsLong config that table needs.) */
  def entry(spark: SparkSession): DataFrame =
    Queries.registry("q_join_enrich")._1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, (fn, _)) => name -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, (_, Some(sql))) => name -> sql }
}
