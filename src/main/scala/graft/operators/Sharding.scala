package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic shard planning for training-data export: the step
  * between a curated corpus and the data loader. Two policies:
  *
  *  - [[assign]]: fixed shard COUNT, docs spread by a key hash — the
  *    classic "globally shuffled shards" layout (every shard is an
  *    IID-ish sample of the corpus).
  *  - [[sizeBudgeted]]: fixed shard SIZE (a token/byte budget per
  *    shard), docs packed in hash order by cumulative size — what a
  *    loader with a fixed sequence-budget per file wants.
  *
  * Determinism: both derive order and placement from md5 of the row
  * key, never from partition layout or an RNG — the same doc lands in
  * the same shard at the same position on any cluster size, any retry
  * (same rationale as [[Sampling]]; and md5 keeps the plan replayable
  * by any SQL engine for audit).
  *
  * Scale note: [[sizeBudgeted]] needs a GLOBAL cumulative sum, which
  * naively is a single-partition window — a scale-killer. It instead
  * uses the two-phase form: bucket rows by the hash prefix, cumulate
  * the tiny per-bucket totals for bucket offsets, then cumulate
  * within buckets only (a partitioned window), and add the offset.
  * Equivalent to the global window, but every shuffle is keyed by the
  * 256-way bucket — no partition ever sees more than ~1/256 of the
  * data. (Same decomposition TPC-style engines use for scalable
  * running totals.)
  */
object Sharding {

  /** 60-bit md5 order key — engine-portable (see Sampling.unit). */
  private def orderKey(keyCol: Column): Column =
    conv(substring(md5(keyCol.cast("string")), 1, 15), 16, 10).cast("long")

  /** Hash-spread assignment: adds `shard` (0..nShards-1) and the
    * within-shard order key `pos_key`. */
  def assign(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    val h = orderKey(col(keyCol))
    df.withColumn("pos_key", h)
      .withColumn("shard", (h % nShards).cast("int"))
  }

  /** Size-budgeted packing: docs ordered by md5(key), each shard takes
    * consecutive docs until `target` units of `sizeCol` are consumed.
    * A shard can overshoot by at most one doc (the one that crosses
    * the boundary belongs to the shard it STARTS in). Adds `shard`.
    *
    * `buckets` is the parallelism of the two-phase cumulative sum;
    * 256 hash-prefix buckets keep the offset table broadcastable while
    * bounding any single window partition to ~0.4% of the corpus.
    */
  def sizeBudgeted(df: DataFrame, keyCol: String, sizeCol: String,
                   target: Long, buckets: Int = 256): DataFrame = {
    require(target > 0, "target must be positive")
    require(buckets >= 1 && buckets <= 256, "buckets must be in 1..256 (one hex-byte prefix)")
    val h = md5(col(keyCol).cast("string"))
    val withKeys = df
      .withColumn("__h", h)
      // RANGE bucket (prefix-division, not modulo): bucket order must
      // equal global __h order for the two-phase cumsum to reassemble
      // the global one (fixed-width lowercase hex sorts numerically).
      // floor() before the int cast: Spark's `/` is always a DOUBLE
      // divide, and a fractional bucket id would silently ignore
      // `buckets` (every prefix its own group)
      .withColumn("__bucket",
        floor(conv(substring(col("__h"), 1, 2), 16, 10).cast("int") * buckets / 256).cast("int"))
    // phase 1: per-bucket totals (tiny: `buckets` rows), running offset.
    // The offset is a ≤256-row prefix sum — computed as a broadcast
    // triangle join (sum of all STRICTLY-smaller buckets' totals)
    // rather than a global window: an empty-partition window would
    // move "all" data to one partition and WARN on every execution
    // (Spark 4 folds a literal partitionBy right back to empty), and
    // at ≤256×256 pairs the join is free. Identical agg subtrees on
    // both sides share one exchange under AQE.
    val totals = withKeys.groupBy("__bucket")
      .agg(sum(col(sizeCol)).as("__btotal"))
    val offsets = totals.as("a")
      .join(broadcast(totals.as("b")),
        col("b.__bucket") < col("a.__bucket"), "left")
      .groupBy(col("a.__bucket").as("__bucket"))
      .agg(coalesce(sum(col("b.__btotal")), lit(0L)).as("__offset"))
    // phase 2: within-bucket running sum + bucket offset = global
    // cumulative size BEFORE this row; shard = which budget bin the
    // row starts in
    // tiebreak duplicate keys (same md5) on size, then on a FULL-ROW
    // fingerprint (xxhash64 over every input column), so the running
    // sum — hence any boundary-straddling shard assignment — is
    // deterministic across runs even when same-key rows differ in
    // non-key columns; rows still tied after that are identical in
    // every column and genuinely interchangeable
    val fp = xxhash64(df.columns.map(col): _*)
    val wb = Window.partitionBy("__bucket").orderBy(col("__h"), col(sizeCol), col("__fp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withKeys
      .withColumn("__fp", fp)
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn("__before", col("__offset") + coalesce(sum(col(sizeCol)).over(wb), lit(0L)))
      .withColumn("shard", (col("__before") / target).cast("int"))
      .drop("__h", "__bucket", "__offset", "__before", "__fp")
  }
}
