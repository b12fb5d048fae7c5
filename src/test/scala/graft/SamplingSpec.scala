package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling / source mixing: rate accuracy,
  * partition-layout independence, and mix proportions.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 20000L)
    .map(i => (i, Seq("en", "de", "fr")(((i * 7) % 3).toInt)))
    .toDF("doc_id", "lang")

  test("stratified keeps ~rate per stratum and drops unlisted strata") {
    val out = Sampling.stratified(docs, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.1))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("fr"))
    val nEn = docs.filter($"lang" === "en").count().toDouble
    val nDe = docs.filter($"lang" === "de").count().toDouble
    assert(math.abs(byLang("en") / nEn - 0.5) < 0.03)
    assert(math.abs(byLang("de") / nDe - 0.1) < 0.03)
  }

  test("membership is independent of partition layout") {
    val a = Sampling.stratified(docs.repartition(2), "lang", "doc_id", Map("en" -> 0.3))
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratified(docs.repartition(17), "lang", "doc_id", Map("en" -> 0.3))
      .select("doc_id").as[Long].collect().toSet
    assert(a === b, "same rows must survive under any partitioning")
  }

  test("weightedMix approximates target proportions without upsampling") {
    val out = Sampling.weightedMix(docs, "lang", "doc_id",
      Map("en" -> 0.6, "de" -> 0.4))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val total = byLang.values.sum
    assert(math.abs(byLang("en") / total - 0.6) < 0.05)
    assert(math.abs(byLang("de") / total - 0.4) < 0.05)
    // no stratum exceeds its available rows
    assert(byLang("en") <= docs.filter($"lang" === "en").count())
  }
}
