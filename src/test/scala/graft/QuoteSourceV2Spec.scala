package graft

import org.apache.spark.sql.functions._

/** DSv2 connector: schema, determinism, filter pushdown (generation
  * actually restricted, not post-filtered), and column pruning.
  */
class QuoteSourceV2Spec extends SparkSpec {
  import spark.implicits._

  private def quotes = spark.read.format("graft.sources.QuoteSourceV2")
    .option("symbols", "20").option("days", "10").option("start", "2024-01-01")
    .load()

  test("reads symbols × days deterministic rows") {
    assert(quotes.count() === 200)
    val a = quotes.orderBy("symbol", "trade_date").collect()
    val b = quotes.orderBy("symbol", "trade_date").collect()
    assert(a.sameElements(b), "re-scan must regenerate identical rows")
    val r = quotes.filter($"high" < $"low").count()
    assert(r === 0, "high >= low invariant")
  }

  test("symbol equality and date range push into the scan") {
    val filtered = quotes
      .filter($"symbol" === "SYM0003" &&
        $"trade_date" >= "2024-01-03" && $"trade_date" <= "2024-01-05")
    assert(filtered.count() === 3)
    val scanDesc = filtered.queryExecution.executedPlan.toString
    assert(scanDesc.contains("pushed=[") && scanDesc.contains("EqualTo(symbol,SYM0003)"),
      s"pushdown missing from scan description:\n$scanDesc")
    // partition planning honored the filters: only one symbol generated
    assert(filtered.select("symbol").distinct().count() === 1)
  }

  test("conflicting symbol equalities yield the empty intersection, not last-wins") {
    // x = a AND x = b is unsatisfiable; claiming both filters as pushed
    // is only correct if the scan actually produces zero rows
    val contradictory = quotes.filter($"symbol" === "SYM0003" && $"symbol" === "SYM0004")
    assert(contradictory.count() === 0)
    // repeated identical equality stays satisfiable
    val same = quotes.filter($"symbol" === "SYM0003" && $"symbol" === "SYM0003")
    assert(same.count() === 10)
  }

  test("streaming scan honors the pushed symbol equality") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val root = java.nio.file.Files.createTempDirectory("graft-qstream-sym").toString
    val q = spark.readStream.format("graft.sources.QuoteSourceV2")
      .option("symbols", "5").option("days", "4").option("start", "2024-01-01")
      .load()
      .filter($"symbol" === "SYM0002")
      .writeStream.format("parquet").option("path", s"$root/out")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$root/out")
    assert(got.count() === 4)
    assert(got.select("symbol").distinct().as[String].collect().toSeq === Seq("SYM0002"))
  }

  test("column pruning reaches the reader") {
    val pruned = quotes.select("symbol", "close")
    val desc = pruned.queryExecution.executedPlan.toString
    assert(desc.contains("cols=[symbol,close]"), s"pruning not visible:\n$desc")
    assert(pruned.columns.toSeq === Seq("symbol", "close"))
    assert(pruned.count() === 200)
  }

  test("streaming read: availableNow drains all days, restart resumes after committed offset") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val root = java.nio.file.Files.createTempDirectory("graft-qstream").toString
    val ckpt = s"$root/ckpt"; val out = s"$root/out"
    def stream(days: Int) = spark.readStream.format("graft.sources.QuoteSourceV2")
      .option("symbols", "5").option("days", days.toString)
      .option("start", "2024-01-01").load()
    def drain(days: Int): Unit = {
      val q = stream(days).writeStream.format("parquet").option("path", out)
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
    }
    drain(4)
    assert(spark.read.parquet(out).count() === 20) // 5 symbols × 4 days

    // feed advances to 6 days: restart delivers ONLY the 2 new days
    drain(6)
    val all = spark.read.parquet(out)
    assert(all.count() === 30, "exactly the unconsumed days appended")
    assert(all.groupBy("trade_date").count().count() === 6)
  }

  test("connector feeds the engine: daily rollup over generated quotes") {
    val top = quotes.groupBy("symbol")
      .agg(round(avg("close"), 2).as("avg_close"))
      .orderBy(desc("avg_close")).limit(3)
    assert(top.count() === 3)
  }
}
