package graft

import graft.operators.Profile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Log-histogram quantile sketch: relative-error bound vs brute-force
  * rank percentiles over a fixture stressing both bucket regimes,
  * exact merge linearity, partition-layout invariance, the artifact
  * lifecycle (fold ≡ one-shot, replay no-op), and the loud-fail
  * guards (negative values, re-init mismatch, colliding batch key). */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  // skewed long-tail + dense linear-regime cluster + zeros + a huge
  // outlier, across two groups of very different size
  private val fixture: Seq[(String, Long)] =
    (1L to 500L).map(i => ("a", i * i % 97)) ++        // linear regime, repeats
    (1L to 300L).map(i => ("a", 1000L + i * 37)) ++    // log regime, spread
    Seq(("a", 0L), ("a", 0L), ("a", 123456789012L)) ++ // zeros + huge outlier
    (1L to 7L).map(i => ("b", i * 1000L))              // tiny group

  private def df(parts: Int = 4): DataFrame =
    fixture.toDF("g", "v").repartition(parts)

  private val qs = Seq(100, 2500, 5000, 7500, 9000, 9900, 10000)

  /** Brute-force rank percentile with the same integer rank rule:
    * value at rank ⌈q_bp·n/10000⌉ in sorted order. */
  private def exact(g: String, qBp: Int): Long = {
    val vs = fixture.filter(_._1 == g).map(_._2).sorted
    val rank = (qBp.toLong * vs.size + 9999) / 10000
    vs((rank - 1).toInt max 0)
  }

  test("estimates honor the 2^-mbits relative bound at every quantile (both regimes)") {
    val est = Profile.quantileLookup(
        Profile.logHistogram(df(), "g", "v", mbits = 6), qs, mbits = 6)
      .as[(String, Int, Long, Long)].collect()
    assert(est.length === qs.size * 2)
    est.foreach { case (g, qBp, e, n) =>
      val x = exact(g, qBp)
      assert(n === fixture.count(_._1 == g))
      assert(e <= x && x * 64 < (e + 1) * 65,
        s"($g, $qBp): est $e vs exact $x outside the 2^-6 bound")
      // linear regime is EXACT (bucket = value)
      if (x < 64) assert(e === x, s"($g, $qBp): linear regime must be exact")
    }
  }

  test("merge of disjoint shards ≡ one-shot build (linearity, exact frames)") {
    val whole = Profile.logHistogram(df(), "g", "v", mbits = 6)
    val sh1 = Profile.logHistogram(df().filter(col("v") % 2 === 0), "g", "v", mbits = 6)
    val sh2 = Profile.logHistogram(df().filter(col("v") % 2 =!= 0), "g", "v", mbits = 6)
    val merged = Profile.mergeLogHistogram(sh1, sh2)
    assert(merged.as[(String, Int, Long, Long)].collect().sorted.toSeq
      === whole.as[(String, Int, Long, Long)].collect().sorted.toSeq)
  }

  test("bucket counts and estimates are identical at any partition layout") {
    def run(parts: Int) = Profile.quantileLookup(
        Profile.logHistogram(df(parts), "g", "v", mbits = 6), qs, mbits = 6)
      .as[(String, Int, Long, Long)].collect().sorted.toSeq
    assert(run(1) === run(13))
  }

  test("negative values fail loudly — never bucketed as two's-complement bits") {
    val bad = Seq(("a", 5L), ("a", -3L)).toDF("g", "v")
    val e = intercept[Exception] {
      Profile.logHistogram(bad, "g", "v", mbits = 6).collect()
    }
    assert(e.getMessage != null)
  }

  test("psiFromLogHistograms: exactly zero on identical sketches, shifted-band positive under an octave shift") {
    val sk = Profile.logHistogram(df(), "g", "v", mbits = 6)
    // identical sketches: p = q in every bucket → every term is 0.0
    // EXACTLY (no smoothing asymmetry, no fp residue)
    val sameTerms = Profile.psiFromLogHistograms(sk, sk)
      .select(col("term")).as[Double].collect()
    assert(sameTerms.nonEmpty && sameTerms.forall(_ === 0.0))
    // one octave up (v*2): every log bucket moves → PSI far above the
    // 0.25 "shifted" band in every group
    val shifted = Profile.logHistogram(
      df().select(col("g"), (col("v") * 2).as("v")), "g", "v", mbits = 6)
    val drift = Profile.psiFromLogHistograms(sk, shifted)
      .groupBy("g").agg(sum(col("term")).as("psi"))
      .as[(String, Double)].collect().toMap
    assert(drift.keySet === Set("a", "b"))
    assert(drift.values.forall(_ > 0.25), s"drift too small: $drift")
  }

  test("fractional value columns are rejected, not silently truncated") {
    val dbl = Seq(("a", 5.75)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Profile.logHistogram(dbl, "g", "v", mbits = 6)
    }
    assert(e.getMessage.contains("integral fixed-point"))
  }

  test("artifact: fold of two batches + replayed redelivery ≡ one-shot sketch") {
    val root = java.nio.file.Files.createTempDirectory("graft-quant-spec").toString
    try {
      Profile.initQuantileArtifact(spark, root, mbits = 6)
      Profile.quantileIngestBatch(df().filter(col("v") % 2 === 0), "g", "v", root, 0L)
      Profile.quantileIngestBatch(df().filter(col("v") % 2 =!= 0), "g", "v", root, 1L)
      // at-least-once redelivery of batch 0: a no-op, not a double-count
      Profile.quantileIngestBatch(df().filter(col("v") % 2 === 0), "g", "v", root, 0L)
      val served = Profile.readQuantileArtifact(spark, root)
        .as[(String, Int, Long, Long)].collect().sorted.toSeq
      val oneShot = Profile.logHistogram(df(), "g", "v", mbits = 6)
        .as[(String, Int, Long, Long)].collect().sorted.toSeq
      assert(served === oneShot)
      val est = Profile.quantileArtifactLookup(spark, root, qs)
        .as[(String, Int, Long, Long)].collect().sorted.toSeq
      val direct = Profile.quantileLookup(
          Profile.logHistogram(df(), "g", "v", mbits = 6), qs, mbits = 6)
        .as[(String, Int, Long, Long)].collect().sorted.toSeq
      assert(est === direct)
    } finally rmTree(root)
  }

  test("artifact guards: re-init mismatch and colliding batch key fail loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-quant-guard").toString
    try {
      Profile.initQuantileArtifact(spark, root, mbits = 6)
      Profile.initQuantileArtifact(spark, root, mbits = 6) // same dims: no-op
      val reinit = intercept[IllegalArgumentException] {
        Profile.initQuantileArtifact(spark, root, mbits = 8)
      }
      assert(reinit.getMessage.contains("different dimensions"))
      Profile.quantileIngestBatch(df().filter(col("v") % 2 === 0), "g", "v", root, 0L)
      val collide = intercept[IllegalArgumentException] {
        Profile.quantileIngestBatch(df().filter(col("v") % 2 =!= 0), "g", "v", root, 0L)
      }
      assert(collide.getMessage.contains("DIFFERENT contribution"))
    } finally rmTree(root)
  }
}
