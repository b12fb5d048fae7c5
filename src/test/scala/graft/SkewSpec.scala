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
}
