package graft

import graft.plans.CosineSimilarity
import org.apache.spark.sql.functions._

/** The custom Catalyst surface: native cosine expression (eval +
  * codegen parity with the HOF form), SQL registration through
  * SparkSessionExtensions, and the self-cosine optimizer rule.
  */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
    (2L, Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),
    (3L, Seq(1.0, 1.0, 0.0), Seq(1.0, 0.0, 0.0))).toDF("id", "a", "b")

  test("graft_cosine is registered via extensions and usable from SQL") {
    df.createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT id, graft_cosine(a, b) AS c FROM vecs ORDER BY id")
      .as[(Long, Double)].collect()
    assert(math.abs(got(0)._2 - 1.0) < 1e-12)
    assert(math.abs(got(1)._2 - 0.0) < 1e-12)
    assert(math.abs(got(2)._2 - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("native expression ≡ HOF formulation bit-for-bit") {
    val hof = {
      val dot = aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val na = sqrt(aggregate(zip_with($"a", $"a", (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      val nb = sqrt(aggregate(zip_with($"b", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      dot / (na * nb)
    }
    val rows = df.select(call_function("graft_cosine", $"a", $"b").as("n"), hof.as("h"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n === h) }
  }

  test("interpreted eval matches codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = CosineSimilarity(
      Literal.create(Seq(3.0, 4.0), ArrayType(DoubleType)),
      Literal.create(Seq(4.0, 3.0), ArrayType(DoubleType)))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 24.0 / 25.0) < 1e-12)
  }

  test("SelfCosineRule rewrites cos(x, x) to the one-accumulator form, bit-identically") {
    // must be file-backed: a local Seq relation is eagerly folded into a
    // LocalRelation before user rules can be observed
    val p = java.nio.file.Files.createTempDirectory("graft-plans").toString + "/v"
    // include degenerate vectors: empty and zero-norm must stay NaN
    // after the rewrite (folding to literal 1.0 would change them)
    df.select($"id", $"a").unionByName(
      Seq((90L, Seq.empty[Double]), (91L, Seq(0.0, 0.0))).toDF("id", "a"))
      .write.parquet(p)
    val filed = spark.read.parquet(p)
    val q = filed.select($"id", call_function("graft_cosine", col("a"), col("a")).as("c"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_self_cosine"), s"rule did not fire:\n$optimized")
    assert(!optimized.contains("graft_cosine("), s"binary form survived:\n$optimized")
    // the rewrite must match the un-rewritten loop on every row,
    // including the ±1-ulp sqrt rounding (cos((1,1,0),(1,1,0)) is
    // 0.9999999999999998, NOT 1.0) and NaN for degenerate vectors. In
    // the self case dot == |a|² == |b|² bit-exactly, so the binary
    // loop's result is na / (sqrt(na) * sqrt(na)).
    def binaryLoop(v: Seq[Double]): Double = {
      val na = v.foldLeft(0.0)((acc, x) => acc + x * x)
      na / (math.sqrt(na) * math.sqrt(na))
    }
    val vecs = Map(1L -> Seq(1.0, 2.0, 3.0), 2L -> Seq(1.0, 0.0, 0.0),
      3L -> Seq(1.0, 1.0, 0.0), 90L -> Seq.empty[Double], 91L -> Seq(0.0, 0.0))
    val got = q.orderBy("id").as[(Long, Double)].collect()
    assert(got.length === vecs.size)
    got.foreach { case (id, c) =>
      assert(java.lang.Double.doubleToLongBits(c) ===
        java.lang.Double.doubleToLongBits(binaryLoop(vecs(id))), s"id=$id: $c")
    }
    // (1,1,0) really exercises the ulp case, and degenerates stay NaN
    assert(got.find(_._1 == 3L).get._2 === 0.9999999999999998)
    assert(got.filter(_._1 >= 90L).forall(_._2.isNaN))
  }

  test("graft_ema window aggregate ≡ HOF ema bit-for-bit, O(n) incremental") {
    import graft.functions.Indicators
    val rng = new scala.util.Random(9)
    val series = (for { k <- Seq("A", "B"); t <- 0 until 50 }
      yield (k, t, math.rint(rng.nextDouble() * 10000) / 100))
      .toDF("sym", "t", "close")
    val w = Indicators.series("sym", "t").rowsBetween(Long.MinValue, 0)
    val both = series
      .withColumn("native", call_function("graft_ema", col("close"), lit(14)).over(w))
      .withColumn("hof", Indicators.emaHof(col("close"), Indicators.series("sym", "t"), 14))
    val rows = both.select("native", "hof").as[(Double, Double)].collect()
    assert(rows.length === 100)
    rows.foreach { case (n, h) => assert(n === h) }
  }

  test("graft_ema refuses to merge partial states (order-sensitivity guard)") {
    import graft.plans.EmaAggregate
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = intercept[UnsupportedOperationException] {
      val agg = EmaAggregate(Literal(1.0), Literal(14))
      agg.merge(EmaAggregate.State(seeded = true, 1.0), EmaAggregate.State(seeded = true, 2.0))
    }
    assert(e.getMessage.contains("order-sensitive"))
  }

  test("null vector → null similarity (both paths)") {
    val d = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val r = d.select(call_function("graft_cosine", $"a", $"b")).collect().head
    assert(r.isNullAt(0))
  }
}
