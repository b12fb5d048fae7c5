package graft

import org.apache.spark.sql.functions._

/** Error bounds for the sketch operators against exact answers on
  * sf0.001 — HLL++ distinct within its configured rsd, GK quantiles
  * within rank tolerance.
  */
class SketchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 3×rsd of exact") {
    val r = Tables.lineitem(spark, dir)
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("a"),
        count_distinct(col("l_orderkey")).as("e"))
      .head()
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e <= 0.06, s"approx $a vs exact $e")
  }

  test("approx_percentile p50 close to exact median") {
    val df = Tables.lineitem(spark, dir)
    val approx = df.select(expr("approx_percentile(l_extendedprice, 0.5, 10000)"))
      .head().getDouble(0)
    val exact = df.select(percentile(col("l_extendedprice"), lit(0.5)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact <= 0.01, s"p50 approx $approx vs $exact")
  }

  test("q_sketch_profile approx distincts bounded by exact per group") {
    val out = Queries.registry("q_sketch_profile")._1(spark, dir).collect()
    assert(out.nonEmpty)
    val exact = Tables.lineitem(spark, dir).groupBy("l_returnflag")
      .agg(count_distinct(col("l_orderkey")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    out.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val e = exact(r.getAs[String]("l_returnflag"))
      assert(math.abs(approx - e) / e <= 0.06)
      assert(r.getAs[Double]("p99_price") >= r.getAs[Double]("p50_price"))
    }
  }
}
