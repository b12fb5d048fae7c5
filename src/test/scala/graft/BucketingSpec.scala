package graft

import org.apache.spark.sql.functions._

/** Bucketing for co-located joins (brief: "repartition/bucketing for
  * co-located joins"): two tables bucketed by the join key join with
  * ZERO shuffle exchanges — the lake-layout decision that turns every
  * downstream key-join/aggregation into a map-side operation at 100 TB.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans no shuffle exchange") {
    // (warehouse dir is a static conf — set at session build in SparkSpec)
    // disable broadcast so the join strategy decision is about
    // partitioning, not size
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 10000).map(i => (i.toLong % 500, i.toLong, i * 1.5))
        .toDF("k", "id", "v")
      val dim = (0L until 500L).map(k => (k, s"name_$k")).toDF("k", "name")
      facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("graft_facts_bucketed")
      dim.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("graft_dim_bucketed")

      val joined = spark.table("graft_facts_bucketed")
        .join(spark.table("graft_dim_bucketed"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 10000)

      // contrast: the same join over unbucketed parquet shuffles both sides
      val flat = java.nio.file.Files.createTempDirectory("graft-flat").toString
      facts.write.parquet(s"$flat/facts")
      dim.write.parquet(s"$flat/dim")
      val unbucketed = spark.read.parquet(s"$flat/facts")
        .join(spark.read.parquet(s"$flat/dim"), "k")
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_facts_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_dim_bucketed")
    }
  }

  test("snapshot diff of co-bucketed snapshots plans no shuffle exchange") {
    // the 100 TB diff story: both lake versions bucketed by the key →
    // the full outer join diffs bucket-locally, zero exchanges
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val v1 = (0L until 2000L).map(k => (k, s"a$k", k * 1.0)).toDF("k", "a", "b")
      val v2 = (10L until 2010L).map(k =>
        (k, if (k % 7 == 0) s"CHANGED$k" else s"a$k", k * 1.0)).toDF("k", "a", "b")
      v1.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_snap_v1")
      v2.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_snap_v2")
      val delta = graft.operators.SnapshotDiff.diff(
        spark.table("graft_snap_v1"), spark.table("graft_snap_v2"), Seq("k"))
      assert(!delta.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "co-bucketed snapshot diff must not shuffle")
      val counts = delta.groupBy("change").count()
        .as[(String, Long)].collect().toMap
      assert(counts === Map("added" -> 10L, "removed" -> 10L,
        "changed" -> (10L until 2000L).count(k => k % 7 == 0).toLong))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_snap_v1")
      spark.sql("DROP TABLE IF EXISTS graft_snap_v2")
    }
  }
}
