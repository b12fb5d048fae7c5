package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation sampling for training-data pipelines: stratified
  * downsampling and weighted source mixing.
  *
  * Determinism: membership is decided by a hash of the ROW KEY, not a
  * per-partition RNG — the same row makes the same cut regardless of
  * partition layout, retries, or cluster size (Spark's `sample`/
  * `sampleBy` are seed-stable only for a fixed partitioning, which a
  * 100 TB job cannot promise). The uniform is derived from md5 — not
  * the fastest hash, but ENGINE-portable: the first 60 bits of
  * md5(key || ':' || salt) parse identically in any SQL engine, so a
  * sampling decision can be audited (and oracle-checked) outside
  * Spark. Swap [[unit]] to xxhash64 if per-row hash cost ever shows
  * up against a 100 TB scan (it is ~ns-level either way).
  */
object Sampling {

  /** Uniform in [0, 1): first 15 hex chars of md5 (60 bits) / 2^60. */
  private def unit(keyCol: Column, salt: Int): Column =
    conv(substring(md5(concat(keyCol.cast("string"), lit(":"), lit(salt.toString))), 1, 15),
      16, 10).cast("long").cast("double") / 1152921504606846976.0

  /** Keep each row of stratum s with probability rates(s) —
    * key-hash-deterministic. Strata missing from `rates` are dropped. */
  def stratified(df: DataFrame, stratumCol: String, keyCol: String,
                 rates: Map[String, Double], salt: Int = 42): DataFrame = {
    val rate = rates.foldLeft(lit(-1.0)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.withColumn("__rate", rate)
      .filter(unit(col(keyCol), salt) < col("__rate"))
      .drop("__rate")
  }

  /** Temperature-flattened source mixing — the mT5/XLM-R recipe for
    * multilingual/multi-source corpora: target source shares ∝ n_s^α,
    * α < 1 flattening the distribution (upweights small sources
    * relative to their natural share) without ever upsampling. Rates
    * derive from observed counts exactly like [[weightedMix]] (the
    * O(#sources) count collect is the only driver work; membership is
    * per-row hash arithmetic).
    *
    * α = 0.5 (the common setting) computes weights via `sqrt`, not
    * `pow`: IEEE 754 requires sqrt to be correctly rounded but not
    * pow, so only the sqrt form is guaranteed byte-identical across
    * engines — which is what lets q_sample_temperature carry a
    * value-exact DuckDB oracle. */
  def temperatureMix(df: DataFrame, sourceCol: String, keyCol: String,
                     alpha: Double = 0.5, salt: Int = 42): DataFrame = {
    val counts = df.groupBy(sourceCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    require(counts.nonEmpty, "empty input")
    val w = counts.map { case (s, n) =>
      s -> (if (alpha == 0.5) math.sqrt(n) else math.pow(n, alpha))
    }
    // same largest-feasible-total scaling as weightedMix, with the op
    // order mirrored exactly by the oracle SQL (FP-sensitive)
    val total = w.map { case (s, ws) => counts(s) / ws }.min
    val rates = w.map { case (s, ws) => s -> math.min(1.0, total * ws / counts(s)) }
    stratified(df, sourceCol, keyCol, rates, salt)
  }

  /** Take EXACTLY min(k, n_s) rows per stratum, chosen by hash rank —
    * the "n docs per language / per source" curation cut where a
    * probabilistic rate (± binomial noise) isn't acceptable. Survivors
    * are the k smallest md5(key:salt) digests per stratum: layout- and
    * retry-independent, and auditable in any SQL engine (same
    * row_number the oracle runs). One shuffle on the stratum column;
    * the per-stratum sort spills fine, but for a stratum that is a
    * large fraction of 100 TB prefer [[stratified]] with rate k/n (the
    * sortless form) or pre-filter with an approximate digest-threshold
    * pass so only ~k rows per stratum reach this exact rank. */
  def exactKPerStratum(df: DataFrame, stratumCol: String, keyCol: String,
                       k: Int, salt: Int = 42): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(":" + salt))), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Leakage-safe train/val/test assignment: the split is a hash of
    * the GROUP key (domain, source, near-dup cluster id...), so every
    * row of a group lands in the SAME split — the property that keeps
    * near-duplicates and same-source documents from straddling the
    * train/eval boundary. Pure per-row arithmetic (no shuffle, no
    * state); fractions are group-weighted, so they hold over groups,
    * not rows — exact row fractions require per-group sizing, which
    * is what [[weightedMix]] does when that matters more. */
  def assignSplit(df: DataFrame, groupCol: String,
                  trainFrac: Double = 0.8, valFrac: Double = 0.1,
                  salt: Int = 42): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      s"bad split fractions ($trainFrac, $valFrac)")
    val u = unit(col(groupCol), salt)
    df.withColumn("split",
      when(u < trainFrac, lit("train"))
        .when(u < trainFrac + valFrac, lit("val"))
        .otherwise(lit("test")))
  }

  /** Mix sources to target proportions: compute per-source keep rates
    * from the observed counts so the OUTPUT approximates `weights`
    * (scaled to the largest feasible total without upsampling). */
  def weightedMix(df: DataFrame, sourceCol: String, keyCol: String,
                  weights: Map[String, Double], salt: Int = 42): DataFrame = {
    val counts = df.groupBy(sourceCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val w = weights.filter { case (s, _) => counts.contains(s) }
    require(w.nonEmpty, "no overlap between weights and observed sources")
    // largest total T with T*w_s <= n_s for all s
    val total = w.map { case (s, ws) => counts(s) / ws }.min
    val rates = w.map { case (s, ws) => s -> math.min(1.0, total * ws / counts(s)) }
    stratified(df, sourceCol, keyCol, rates, salt)
  }
}
