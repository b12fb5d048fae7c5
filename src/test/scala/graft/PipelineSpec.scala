package graft

import graft.jobs.Pipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** E1 end-to-end: full pipeline over sf0.001 into a temp lake; every
  * output table keyed-unique; re-running the whole pipeline (same day
  * re-processed) changes nothing — the reference's ON CONFLICT
  * idempotence, at pipeline granularity.
  */
class PipelineSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("full E1 run produces keyed tables; rerun is idempotent") {
    val lakeRoot = Files.createTempDirectory("graft-lake").toString
    val lake = Pipeline.run(spark, sfDir, lakeRoot)

    def snapshot(path: String, keys: Seq[String]): (Long, Long) = {
      val df = spark.read.parquet(path)
      val n = df.count()
      val k = df.select(keys.map(col): _*).distinct().count()
      (n, k)
    }
    val tables = Seq(
      lake.history -> Seq("user_id", "d"),
      lake.patterns -> Seq("user_id", "d", "pattern"),
      lake.analysis -> Seq("user_id", "d"),
      lake.predictions -> Seq("user_id", "d"))
    val first = tables.map { case (p, keys) =>
      val (n, k) = snapshot(p, keys)
      assert(n > 0, s"$p is empty")
      assert(n === k, s"$p has duplicate keys")
      p -> n
    }.toMap

    // rerun the whole pipeline over the same input
    Pipeline.run(spark, sfDir, lakeRoot)
    tables.foreach { case (p, keys) =>
      val (n, k) = snapshot(p, keys)
      assert(n === first(p), s"$p row count changed on rerun")
      assert(n === k)
    }
  }

  test("patterns only contain the four defined categories") {
    val lakeRoot = Files.createTempDirectory("graft-lake2").toString
    val lake = Pipeline.run(spark, sfDir, lakeRoot)
    val pats = spark.read.parquet(lake.patterns)
      .select("pattern").distinct().collect().map(_.getString(0)).toSet
    assert(pats.subsetOf(Set("Bullish Trend", "Bearish Trend", "Golden Cross", "Death Cross")))
  }
}
