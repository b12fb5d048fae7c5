package graft.functions

import org.apache.spark.sql.SparkSession

/** Detects whether a GraftExtensions native expression is registered in
  * the session that will EXECUTE the plan.
  *
  * Resolution must run against the plan's own session
  * (`df.sparkSession`), never `SparkSession.active`: in a multi-session
  * application the active session can differ from the one the DataFrame
  * belongs to, which would either skip the native path needlessly or —
  * worse — emit a `call_function` the executing session never
  * registered, failing at analysis time.
  */
object NativeFns {
  def has(spark: SparkSession, fn: String): Boolean =
    try spark.catalog.functionExists(fn)
    catch { case _: Throwable => false }
}
