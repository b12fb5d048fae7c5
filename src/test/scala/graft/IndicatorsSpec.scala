package graft

import graft.functions.Indicators
import org.apache.spark.sql.functions._

/** Fixture checks for the technical indicators against hand-computed
  * pandas semantics (indicators.py:1-27): SMA min_periods nulls, EMA
  * adjust=False recursion, RSI when-split, Bollinger sample stddev,
  * and the W3 partial-frame deviation. Tolerance 1e-9.
  */
class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private val closes = Seq(10.0, 11.0, 12.0, 11.5, 13.0, 12.5, 14.0, 15.0)
  private def series = closes.zipWithIndex
    .map { case (c, i) => ("A", i, c) }
    .toDF("sym", "t", "close")
  private val w = Indicators.series("sym", "t")

  private def colVals(c: org.apache.spark.sql.Column): Seq[Option[Double]] =
    series.select(c.as("v")).orderBy("t"). // single partition, ordered
      collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  test("prev = pandas shift(1)") {
    assert(colVals(Indicators.prev(col("close"), w)) ===
      None +: closes.dropRight(1).map(Some(_)))
  }

  test("pctChange matches pandas pct_change*100") {
    val got = colVals(Indicators.pctChange(col("close"), w))
    val want = None +: closes.sliding(2).map { case Seq(p, c) => Some((c - p) / p * 100) }.toSeq
    got.zip(want).foreach {
      case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9)
      case (g, e) => assert(g === e)
    }
  }

  test("sma(3) nulls below min_periods, mean after") {
    val got = colVals(Indicators.sma(col("close"), w, 3))
    assert(got.take(2) === Seq(None, None))
    got.drop(2).zipWithIndex.foreach { case (Some(g), i) =>
      val e = closes.slice(i, i + 3).sum / 3
      assert(math.abs(g - e) < 1e-9, s"sma[$i]")
    }
  }

  test("movingAvgPartial emits from row 1 (SQL AVG over short frame)") {
    val got = colVals(Indicators.movingAvgPartial(col("close"), w, 3))
    val e0 = closes.head
    val e1 = closes.take(2).sum / 2
    assert(math.abs(got.head.get - e0) < 1e-9 && math.abs(got(1).get - e1) < 1e-9)
  }

  test("ema(span) = pandas ewm(span, adjust=False).mean()") {
    val span = 3
    val alpha = 2.0 / (span + 1)
    val expected = closes.tail.scanLeft(closes.head)((acc, x) => x * alpha + acc * (1 - alpha))
    val got = colVals(Indicators.ema(col("close"), w, span))
    got.zip(expected).zipWithIndex.foreach { case ((Some(g), e), i) =>
      assert(math.abs(g - e) < 1e-9, s"ema[$i]: $g vs $e")
    }
  }

  test("rsi: all-gains window → 100; mixed matches closed form") {
    val got = colVals(Indicators.rsi(col("close"), w, 3))
    // rows 0-2: deltas (null,1,1) → avg_loss 0 → rsi 100
    assert(got(1).get === 100.0 && got(2).get === 100.0)
    // row 3: deltas in frame = (1, 1, -0.5): gain avg 2/3, loss avg 1/6
    val rs = (2.0 / 3) / (1.0 / 6)
    assert(math.abs(got(3).get - (100 - 100 / (1 + rs))) < 1e-9)
  }

  test("bollinger uses sample stddev (ddof=1)") {
    val (mid, up, _) = Indicators.bollinger(col("close"), w, 3)
    val gotMid = colVals(mid)
    val gotUp = colVals(up)
    val i = 4 // frame rows 2..4 = (12.0, 11.5, 13.0)
    val xs = closes.slice(2, 5)
    val m = xs.sum / 3
    val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / 2)
    assert(math.abs(gotMid(i).get - m) < 1e-9)
    assert(math.abs(gotUp(i).get - (m + 2 * sd)) < 1e-9)
  }

  test("emaByKey single-pass ≡ window-HOF ema bit-for-bit (multi-key)") {
    val rng = new scala.util.Random(5)
    val df = (for { k <- Seq("A", "B", "C"); t <- 0 until 40 }
      yield (k, t, math.rint(rng.nextDouble() * 10000) / 100))
      .toDF("sym", "t", "close")
    val viaWindow = df.withColumn("ema",
      Indicators.ema(col("close"), Indicators.series("sym", "t"), 14))
      .select("sym", "t", "ema")
    val viaPass = Indicators.emaByKey(df, "sym", Seq("t"), "close", 14)
      .select("sym", "t", "ema")
    val joined = viaWindow.as("w").join(viaPass.as("p"), Seq("sym", "t"))
      .select(col("w.ema").as("we"), col("p.ema").as("pe"))
      .as[(Double, Double)].collect()
    assert(joined.length === 120)
    joined.foreach { case (w, p) => assert(w === p) }
  }

  test("macd = ema(fast) - ema(slow); stochasticK bounded in [0,100]") {
    val m = colVals(Indicators.macd(col("close"), w, 3, 5))
    val e3 = colVals(Indicators.ema(col("close"), w, 3))
    val e5 = colVals(Indicators.ema(col("close"), w, 5))
    m.indices.foreach { i =>
      assert(math.abs(m(i).get - (e3(i).get - e5(i).get)) < 1e-12)
    }
    val k = colVals(Indicators.stochasticK(col("close"), w, 3))
    assert(k.head === None) // first frame is degenerate (single value)
    k.flatten.foreach(v => assert(v >= 0 && v <= 100))
    // row 2 frame (10,11,12): close=12 is the max → %K = 100
    assert(math.abs(k(2).get - 100.0) < 1e-12)
  }

  test("fixed-point bollinger in q_w10 ≡ stddev_samp library form within 1e-9") {
    import org.apache.spark.sql.expressions.Window
    val df = series.withColumn("c6", round(col("close") * 1000000).cast("long"))
    val f = w.rowsBetween(-2, 0)
    val s = sum(col("c6")).over(f).cast("double")
    val q = sum(col("c6") * col("c6")).over(f).cast("double")
    val n = count(lit(1)).over(f).cast("double")
    val sdFixed = when(n > 1,
      sqrt(greatest(q - s * s / n, lit(0.0)) / (n - lit(1.0))) / lit(1000000.0))
    val sdLib = stddev_samp(col("close")).over(f)
    val diffs = df.select(abs(coalesce(sdFixed, lit(0.0)) - coalesce(sdLib, lit(0.0))).as("e"))
      .agg(max("e")).as[Double].collect().head
    assert(diffs < 1e-9)
  }
}
