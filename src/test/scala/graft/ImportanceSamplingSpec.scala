package graft

import graft.operators.ImportanceSampling
import org.apache.spark.sql.functions._

/** DSIR importance weights: target-like docs outrank off-target docs,
  * weights are layout-independent, and Gumbel-top-k selection is
  * deterministic and exp(w)-biased.
  */
class ImportanceSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq.tabulate(20)(i =>
    (1000L + i, s"alpha beta gamma delta token$i")).toDF("doc_id", "text")
  private val raw = (Seq.tabulate(10)(i => (i.toLong, s"alpha beta gamma delta extra$i")) ++
    Seq.tabulate(10)(i => (100L + i, s"zeta eta theta iota other$i"))).toDF("doc_id", "text")

  test("target-like docs outweigh off-target docs") {
    val w = ImportanceSampling.weights(raw, target, 64)
      .as[(Long, Double)].collect().toMap
    val like = (0L until 10L).map(w)
    val unlike = (100L until 110L).map(w)
    assert(like.min > unlike.max,
      s"expected clear separation, got like=$like unlike=$unlike")
  }

  test("weights are layout-independent") {
    val a = ImportanceSampling.weights(raw, target, 64)
      .as[(Long, Double)].collect().toSet
    val b = ImportanceSampling.weights(raw.repartition(7), target.coalesce(1), 64)
      .as[(Long, Double)].collect().toSet
    assert(a === b)
  }

  test("gumbelTopK is deterministic, returns k rows, and biases to high weights") {
    val w = ImportanceSampling.weights(raw, target, 64)
    val s1 = ImportanceSampling.gumbelTopK(w, 8).select("doc_id").as[Long].collect().toSeq
    val s2 = ImportanceSampling.gumbelTopK(w, 8).select("doc_id").as[Long].collect().toSeq
    assert(s1 === s2)
    assert(s1.size === 8)
    // weight gap here is large vs Gumbel noise scale: the sample should
    // be dominated by the target-like half
    assert(s1.count(_ < 100L) >= 6)
  }

  test("frozen model: scoreWithModel ≡ weights when fit on the same corpora; meta guards") {
    val path = java.nio.file.Files.createTempDirectory("graft-dsir").toString + "/model"
    ImportanceSampling.saveModel(target, raw, 64, path)
    val frozen = ImportanceSampling.scoreWithModel(raw, path, 64)
      .as[(Long, Double)].collect().toSet
    val fresh = ImportanceSampling.weights(raw, target, 64)
      .as[(Long, Double)].collect().toSet
    assert(frozen === fresh)
    // a NEW batch scores against the frozen boundary without refit
    val batch = Seq((500L, "alpha beta gamma delta fresh"),
      (501L, "zeta eta theta iota fresh")).toDF("doc_id", "text")
    val scored = ImportanceSampling.scoreWithModel(batch, path, 64)
      .as[(Long, Double)].collect().toMap
    assert(scored(500L) > scored(501L), s"frozen boundary lost: $scored")
    // probing with the wrong bucket count fails loudly
    intercept[IllegalArgumentException] {
      ImportanceSampling.scoreWithModel(batch, path, 128)
    }
  }

  test("bucketDrift: exactly 0 on identical corpora, rises past the refit line on shift") {
    import graft.operators.ImportanceSampling.bucketDrift
    val same = bucketDrift(raw, raw, 64).select("psi").as[Double].head()
    assert(same === 0.0, s"identical corpora must have zero PSI, got $same")
    // target is the alpha-flavored half; the mixed raw corpus is a
    // real distribution shift — well past the 0.25 refit convention
    val shifted = bucketDrift(target, raw, 64).select("psi").as[Double].head()
    assert(shifted > 0.25, s"expected drift above the refit line, got $shifted")
  }

  test("a doc equal to the whole-target distribution beats a uniform outsider") {
    // sanity on the smoothing direction: unseen-in-target buckets pull
    // weights down, so a pure-outsider doc has negative weight
    val w = ImportanceSampling.weights(raw, target, 64).as[(Long, Double)].collect().toMap
    assert((100L until 110L).forall(i => w(i) < 0.0))
  }
}
