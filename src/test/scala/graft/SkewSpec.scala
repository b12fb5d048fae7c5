package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted aggregation/join equivalence on a deliberately skewed
  * fixture (one key holds ~90% of rows).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    val rng = new scala.util.Random(3)
    val hot = Seq.fill(900)(("hot", rng.nextInt(100) / 10.0))
    val cold = Seq.fill(100)((s"k${rng.nextInt(20)}", rng.nextInt(100) / 10.0))
    (hot ++ cold).toDF("k", "v")
  }

  test("saltedAggregate ≡ plain groupBy sum/count") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .as[(String, Double, Long)].collect().map(r => (r._1, math.rint(r._2 * 100), r._3)).toSet
    val salted = Skew.saltedAggregate(skewed, Seq("k"), "v")
      .as[(String, Double, Long)].collect().map(r => (r._1, math.rint(r._2 * 100), r._3)).toSet
    assert(salted === plain)
  }

  test("saltedJoin ≡ plain join on skewed keys") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n")).as[(String, String, Long)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n")).as[(String, String, Long)].collect().toSet
    assert(salted === plain)
  }

  test("saltedJoin rejects join types the replication scheme can't honor") {
    val dim = Seq(("hot", "H")).toDF("k", "label")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, Seq("k"), joinType = "full")
    }
    assert(e.getMessage.contains("inner/left"))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, Seq("k"), joinType = "right")
    }
  }

  test("salt actually spreads the hot key across buckets") {
    val withSalt = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col): _*), lit(16)))
    val buckets = withSalt.filter($"k" === "hot")
      .select("__salt").distinct().count()
    assert(buckets >= 8, s"hot key landed in only $buckets/16 buckets")
  }

  test("AQE splits the skewed partition of a shuffle join (runtime re-plan)") {
    // Salting (above) is the manual fix; AQE's OptimizeSkewedJoin is
    // the runtime one — the hot partition is split into advisory-sized
    // slices and the other side's partition replicated, no code change.
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // payload must be row-dependent (a constant would fold to after
      // the join) and incompressible, so the hot shuffle partition has
      // real bytes behind it
      val big = spark.range(20000)
        .select(when($"id" < 19000, "hot").otherwise(concat(lit("k"), $"id" % 50)).as("k"),
          md5(concat(lit("payload"), $"id")).as("payload"))
      val dim = (Seq("hot") ++ (0 until 50).map("k" + _)).toDF("k")
        .withColumn("tag", lit(1))
      val joined = big.join(dim, "k")
      // execute THIS DataFrame's QueryExecution (count() would build a
      // fresh one and leave this AQE plan unfinalized)
      assert(joined.collect().length === 20000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"expected a skew-split shuffle read in the final AQE plan:\n${plan.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
