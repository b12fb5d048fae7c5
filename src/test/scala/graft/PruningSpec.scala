package graft

import org.apache.spark.sql.functions._

/** Dynamic partition pruning — the third pruning tier after static
  * partition pruning (IoSpec: date-partitioned sinks) and filter/column
  * pushdown (QuoteSourceV2Spec, PlanAudit): when a date-partitioned
  * fact joins a FILTERED dim, the partitions to scan are only known at
  * runtime from the dim's rows, and Spark must inject a dynamic
  * pruning subquery into the fact scan. At 100 TB this is the
  * difference between scanning one day's folder and scanning the lake.
  */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  test("fact scan is dynamically pruned by the filtered dim side of a join") {
    val root = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    // fact: 30 date partitions × 200 rows
    val facts = (for { d <- 1 to 30; i <- 1 to 200 }
      yield (f"2024-01-$d%02d", i.toLong, i * 1.0)).toDF("d", "id", "v")
    facts.write.partitionBy("d").parquet(s"$root/facts")
    // dim: one row per date, only 2 dates marked active. The flag is a
    // string equality (not a bare boolean) because the DPP rule only
    // fires behind a "likely selective" predicate (EqualTo/In/Like...)
    // on the dim side.
    val dim = (1 to 30).map(d => (f"2024-01-$d%02d", if (d <= 2) "on" else "off"))
      .toDF("d", "status")
    dim.write.parquet(s"$root/dim")

    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    // force the DPP path regardless of size estimates on this tiny fixture
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "100")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    // keep the partition column a string so the join key needs no cast
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    try {
      val joined = spark.read.parquet(s"$root/facts")
        .join(broadcast(spark.read.parquet(s"$root/dim").filter($"status" === "on")), "d")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected a dynamic pruning subquery in the fact scan:\n${plan.take(2000)}")
      assert(joined.count() === 400) // 2 active dates × 200 rows
    } finally {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
      spark.conf.unset("spark.sql.sources.partitionColumnTypeInference.enabled")
    }
  }

  test("runtime bloom filter prunes fact rows behind a selective dim join") {
    // The row-level sibling of DPP: when the fact is NOT partitioned on
    // the join key, InjectRuntimeFilter builds a bloom filter from the
    // filtered dim and applies might_contain at the fact scan — at
    // 100 TB this cuts the shuffle ahead of the join instead of the
    // partitions behind it.
    val root = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    (1 to 200000).map(i => (i % 1000, i.toLong)).toDF("k", "v")
      .write.parquet(s"$root/facts")
    (0 until 1000).map(k => (k, if (k < 3) "on" else "off")).toDF("k", "status")
      .write.parquet(s"$root/dim")

    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // the fact side must look big enough to be worth filtering
      // (defaults to 10GB; this fixture is ~2MB)
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      // force the non-broadcast join path (broadcast joins filter
      // inline; the bloom filter targets shuffle joins)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = spark.read.parquet(s"$root/facts")
        .join(spark.read.parquet(s"$root/dim").filter($"status" === "on"), "k")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"expected a runtime bloom filter on the fact side:\n${plan.take(1500)}")
      assert(joined.count() === 600) // 3 live keys × 200 rows each
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("static partition pruning: date-range predicate touches only matching folders") {
    val root = java.nio.file.Files.createTempDirectory("graft-spp").toString
    val facts = (for { d <- 1 to 10; i <- 1 to 50 }
      yield (f"2024-02-$d%02d", i.toLong)).toDF("d", "id")
    facts.write.partitionBy("d").parquet(s"$root/facts")
    val pruned = spark.read.parquet(s"$root/facts").filter($"d" >= "2024-02-09")
    // the scan's partition filters carry the predicate (pruning at
    // planning time, no data files outside the range are read)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-02-09"), scan.take(800))
    assert(pruned.count() === 100)
  }

  test("q_lake_slice: the registered lake query's one-day predicate is a PartitionFilter") {
    // the 100 TB layout story on the driver's own data: the EventsLake
    // copy is partitioned by event_date, so the day filter prunes
    // DIRECTORIES at planning time (PartitionFilters, and an empty
    // PushedFilters data-filter set — nothing left to push), unlike
    // q_time_slice's row-group pushdown on the flat file
    val df = SparkEntry.queries("q_lake_slice")(spark, "/root/testdata/sf0.001")
    // sparkPlan, not executedPlan: AQE wraps the executed tree and hides
    // the scan from collectLeaves until materialization
    val scan = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "event_date")),
      s"expected an event_date PartitionFilter, got: ${scan.partitionFilters}")
    // only the one day's directory survives pruning
    assert(scan.selectedPartitions.partitionCount === 1,
      s"expected 1 pruned partition dir, got ${scan.selectedPartitions.partitionCount}")
    assert(df.count() > 0, "the sliced day must contain rows")
  }

  test("lake retention: expire drops only pre-cutoff partitions, idempotently") {
    val root = java.nio.file.Files.createTempDirectory("graft-expire").toString
    graft.jobs.EventsLake.build(spark, "/root/testdata/sf0.001", s"$root/events")
    val allDates = spark.read.parquet(s"$root/events")
      .select("event_date").distinct()
      .as[java.sql.Date].collect().map(_.toString).sorted
    assert(allDates.length > 2, s"fixture too small: $allDates")
    val cutoff = allDates(allDates.length / 2)
    val dropped = graft.jobs.EventsLake.expire(spark, s"$root/events", cutoff)
    assert(dropped === allDates.filter(_ < cutoff).toSeq)
    // survivors intact, expired days gone — metadata-only, no rewrite
    val after = spark.read.parquet(s"$root/events")
      .select("event_date").distinct()
      .as[java.sql.Date].collect().map(_.toString).sorted
    assert(after.toSeq === allDates.filter(_ >= cutoff).toSeq)
    // idempotent: a second expire is a no-op
    assert(graft.jobs.EventsLake.expire(spark, s"$root/events", cutoff) === Seq.empty)
    // retained rows byte-identical to a fresh filter of the source
    val kept = spark.read.parquet(s"$root/events").count()
    val expected = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_date") >= cutoff).count()
    assert(kept === expected)
  }
}
