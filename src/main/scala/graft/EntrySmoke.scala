package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: replicate the driver's flagship smoke — a PLAIN session
  * (no nanosAsLong, no extensions) calling [[SparkEntry.entry]] and
  * requiring rows > 0.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    require(n > 0, "flagship query returned no rows")
    spark.stop()
  }
}
