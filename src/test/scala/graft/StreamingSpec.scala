package graft

import graft.streaming.IncrementalIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Structured Streaming incremental ingest: AvailableNow drain of a raw
  * JSON zone with keyed dedup + merge, exactly-once across restarts.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("symbol", StringType), StructField("trade_date", StringType),
    StructField("close", DoubleType)))

  test("availableNow drain → dedup → merge; second drain is incremental") {
    val root = Files.createTempDirectory("graft-stream").toString
    val raw = s"$root/raw"; val target = s"$root/hist"; val ckpt = s"$root/ckpt"
    new java.io.File(raw).mkdirs()

    def land(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(s"$raw/$name"),
        lines.mkString("\n").getBytes)

    land("b1.json", Seq(
      """{"symbol":"AAPL","trade_date":"2024-01-05","close":101.5}""",
      """{"symbol":"AAPL","trade_date":"2024-01-05","close":101.5}""", // dup in batch
      """{"symbol":"MSFT","trade_date":"2024-01-05","close":402.0}"""))
    val q1 = IncrementalIngest.run(spark, raw, schema, target, ckpt,
      Seq("symbol", "trade_date"))
    q1.awaitTermination()
    val after1 = spark.read.parquet(target)
    assert(after1.count() === 2, "in-batch dup collapsed")

    // second landing: one update (AAPL revised) + one new symbol
    land("b2.json", Seq(
      """{"symbol":"AAPL","trade_date":"2024-01-05","close":105.0}""",
      """{"symbol":"GOOG","trade_date":"2024-01-05","close":155.0}"""))
    val q2 = IncrementalIngest.run(spark, raw, schema, target, ckpt,
      Seq("symbol", "trade_date"))
    q2.awaitTermination()
    val rows = spark.read.parquet(target)
      .as[(String, String, Double)].collect()
      .map { case (s, d, c) => ((s, d), c) }.toMap
    assert(rows.size === 3)
    assert(rows(("AAPL", "2024-01-05")) === 105.0, "DO-UPDATE applied incrementally")
    assert(rows(("MSFT", "2024-01-05")) === 402.0, "untouched row preserved")
  }

  test("windowed streaming aggregation shape compiles against a rate-like frame") {
    // semantics of window+watermark verified on a batch frame (same expr)
    val df = Seq(
      ("2024-01-01 00:00:05", "u1", 1.0),
      ("2024-01-01 00:00:25", "u1", 2.0),
      ("2024-01-01 00:01:05", "u1", 3.0)).toDF("ts_s", "user", "value")
      .select(to_timestamp($"ts_s").as("ts"), $"user", $"value")
    val out = df.groupBy(window($"ts", "1 minute"), $"user")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .select($"user", $"n", $"sum_value").orderBy("n")
      .as[(String, Long, Double)].collect()
    assert(out.toSeq === Seq(("u1", 1L, 3.0), ("u1", 2L, 3.0)))
  }
}
