package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Banded range join ≡ naive theta join on a randomized workload, and
  * the plan stays an equi-join (no nested-loop/cartesian).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val (points, intervals) = {
    val rng = new scala.util.Random(29)
    val ps = for { k <- Seq("a", "b"); i <- 1 to 300 }
      yield (k, rng.nextInt(10000).toLong, i.toLong)
    val is = for { k <- Seq("a", "b", "c"); i <- 1 to 40 } yield {
      val s = rng.nextInt(9000).toLong
      (k, s, s + 50 + rng.nextInt(500), i.toLong)
    }
    (ps.toDF("k", "p", "pid"), is.toDF("k", "s", "e", "iid"))
  }

  test("banded result ≡ naive theta join") {
    val banded = RangeJoin.pointInInterval(points, intervals, Seq("k"), "p", "s", "e", 256)
      .select("k", "pid", "iid").as[(String, Long, Long)].collect().toSet
    val naive = points.join(intervals, Seq("k"))
      .filter($"p" >= $"s" && $"p" <= $"e")
      .select("k", "pid", "iid").as[(String, Long, Long)].collect().toSet
    assert(banded === naive)
    assert(banded.nonEmpty)
  }

  test("bucket width is correctness-neutral") {
    val w1 = RangeJoin.pointInInterval(points, intervals, Seq("k"), "p", "s", "e", 16)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val w2 = RangeJoin.pointInInterval(points, intervals, Seq("k"), "p", "s", "e", 4096)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(w1 === w2)
  }

  test("plan is an equi-join, not a nested loop") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RangeJoin.pointInInterval(points, intervals, Seq("k"), "p", "s", "e", 256)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
        plan.contains("BroadcastHashJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
