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

  test("SelfCosineRule folds cos(x, x) to 1.0 without running the loop") {
    // must be file-backed: a local Seq relation is eagerly folded into a
    // LocalRelation before user rules can be observed
    val p = java.nio.file.Files.createTempDirectory("graft-plans").toString + "/v"
    df.write.parquet(p)
    val filed = spark.read.parquet(p)
    val q = filed.select(call_function("graft_cosine", col("a"), col("a")).as("c"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_cosine"), s"rule did not fire:\n$optimized")
    // cos(x,x) on (1,1,0) is 0.99999... if the loop actually runs —
    // exact 1.0 proves the fold, not luck
    assert(q.as[Double].collect().toSeq === Seq.fill(3)(1.0))
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
