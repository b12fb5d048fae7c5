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

  /** md5(key:salt) — the one salted row-key digest every operator in
    * this file derives decisions from. */
  private def saltedHash(keyCol: Column, salt: Int): Column =
    md5(concat(keyCol.cast("string"), lit(":"), lit(salt.toString)))

  /** Uniform in [0, 1): first 15 hex chars of md5 (60 bits) / 2^60. */
  private def unit(keyCol: Column, salt: Int): Column =
    conv(substring(saltedHash(keyCol, salt), 1, 15), 16, 10)
      .cast("long").cast("double") / 1152921504606846976.0

  /** Order-preserving bucket of a hex digest's first byte: bucket
    * boundaries align with the digest sort order, so bucketing a
    * hash-ordered stream keeps buckets contiguous. Shared by the
    * two-phase cumulative sums here ([[shuffleDeterministic]],
    * [[tokenBudgetMix]]'s running totals) — one formula, one place
    * to change it. */
  private def prefixBucket(h: Column, n: Int): Column =
    floor(conv(substring(h, 1, 2), 16, 10).cast("int") * n / 256).cast("int")

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
    * row_number the oracle runs).
    *
    * Skew shape (r16 verdict #1): the stratum is often skewed BY THE
    * OPERATOR'S PURPOSE — a per-domain crawl cap exists precisely
    * because megasites exist — so a single `row_number` window over
    * the stratum would sort one megasite's billions of rows in ONE
    * task. This runs the associative two-phase form instead: the
    * digest's leading byte salts each stratum into `subparts`
    * order-preserving subpartitions (md5 is uniform, so each holds
    * ~n_s/subparts rows), phase 1 keeps the k smallest (digest, key)
    * per (stratum, subpart), and phase 2 ranks the ≤ subparts·k
    * survivors per stratum. Top-k under a total order is associative,
    * so the result is BIT-IDENTICAL to the single-window form — the
    * oracle replays the plain per-stratum row_number unchanged — while
    * no task ever sorts more than ~1/subparts of one stratum. */
  def exactKPerStratum(df: DataFrame, stratumCol: String, keyCol: String,
                       k: Int, salt: Int = 42, subparts: Int = 64): DataFrame = {
    require(k > 0, "k must be positive")
    require(subparts >= 1 && subparts <= 256, "subparts must be in 1..256")
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("__sub"))
      .orderBy(col("__h"), col(keyCol))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", saltedHash(col(keyCol), salt))
      .withColumn("__sub", prefixBucket(col("__h"), subparts))
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k)
      .withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= k)
      .drop("__h", "__sub", "__rn")
  }

  /** Exact per-group rank — row_number in (value, tie) order plus the
    * group size — computed SKEW-SAFELY: `floor(value·B)` buckets are
    * order-preserving for any numeric value (monotone), so the global
    * (value, tie) order within a group equals (bucket, value, tie)
    * order; per-(group, bucket) counts cumulate through the broadcast
    * triangle join (the [[shuffleDeterministic]] two-phase pattern)
    * and the only window is within one (group, bucket). No task ever
    * sorts more than one bucket of one group — the per-group rank
    * transforms (percent_rank normalization, ntile banding) stop
    * serializing a dominant group (one language can be half a web
    * corpus) onto a single window task. BIT-IDENTICAL to the plain
    * `row_number over (partition by group order by value, tie)`.
    *
    * `buckets` balance is tuned for values in [0, 1] (quality
    * scores); other ranges stay CORRECT (monotone quantization; a
    * double→long saturation collision still sorts right inside its
    * bucket) but may concentrate buckets — AND can explode the
    * (group, bucket) side-table cardinality (dollar-range values ×
    * 256 is millions of distinct floors), so for arbitrary-range
    * values use [[withExactRankScaled]], which clamps the bucket id
    * into [0, buckets) against the observed global range. NULL ranks
    * first and NaN ranks last, exactly like the ascending window
    * (r17 review: a plain floor would DROP null rows at the bucket
    * equi-join and misfile NaN into bucket 0) — each gets its own
    * sentinel bucket aligned with Spark's null-first / NaN-greatest
    * sort order. NULL GROUP KEYS rank too (r17 advice: the joins are
    * null-safe `<=>`, matching the window form's null-as-a-group
    * partitioning). The (group × bucket) side tables broadcast only
    * under a hard row bound (r17 advice: a high-cardinality group
    * column must not OOM the driver) — past it the planner
    * shuffle-joins them, same result.
    * Adds `__rn` (1-based rank, long) and `__n` (group size, long). */
  def withExactRank(df: DataFrame, groupCol: String, valueCol: String,
                    tieCol: String, buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= 65536, "buckets must be in 2..65536")
    exactRankByBucket(df, groupCol, valueCol, tieCol,
      floor(col(valueCol) * buckets).cast("long"))
  }

  /** [[withExactRank]] for values of ARBITRARY range: buckets are
    * equi-width over the observed global [min, max] of `valueCol`
    * (one cheap agg over the FINITE values only, so a NaN or ±Infinity
    * extreme cannot poison the scale), clamped into [0, buckets) —
    * monotone, so the
    * bit-identity contract is unchanged, and the side tables stay
    * ≤ groups × (buckets + 2) rows no matter the value range
    * (±Infinity clamps into the edge buckets; an all-null/NaN or
    * constant column degenerates to one bucket per group = the plain
    * window, still exact). */
  def withExactRankScaled(df: DataFrame, groupCol: String, valueCol: String,
                          tieCol: String, buckets: Int = 256,
                          pinned: Boolean = false): DataFrame = {
    require(buckets >= 2 && buckets <= 65536, "buckets must be in 2..65536")
    // pin the input: the scale agg + the rank core's two consumers
    // would otherwise re-expand the caller's lineage three times —
    // for the winsorize/robustOutliers callers that lineage includes
    // joins over the full frame (q_robust_outliers measured 3.4×
    // slower unpinned). Callers that already pinned say so (r18
    // verdict #8: a second localCheckpoint re-copies the blocks for
    // nothing)
    val src = if (pinned) df else Checkpoints.pin(df)
    // scale over the FINITE values only: NaN/±Infinity rows still rank
    // (sentinels / edge-bucket clamps) but must not poison the width.
    // The same single pass counts the distinct groups — the side
    // tables are ≤ groups × (buckets + 2) rows, which lets the rank
    // core decide its broadcast bound WITHOUT a counts.count() job
    // (r18 verdict #8: that decision was a fourth driver action per
    // profiling query)
    val finite = when(col(valueCol).cast("double").between(
      Double.MinValue, Double.MaxValue), col(valueCol).cast("double"))
    val bounds = src.agg(min(finite), max(finite),
      count_distinct(col(groupCol))).head()
    // +1: count_distinct skips a NULL group key, which ranks too
    val sideRowsAtMost = (bounds.getLong(2) + 1L) * (buckets + 2L)
    val bucketExpr =
      if (bounds.isNullAt(0) || bounds.isNullAt(1)
          || !(bounds.getDouble(0) < bounds.getDouble(1)))
        lit(0L) // degenerate range: one finite bucket, exact either way
      else {
        val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
        val step = (hi - lo) / buckets
        least(lit(buckets - 1L), greatest(lit(0L),
          floor((col(valueCol) - lit(lo)) / lit(step)).cast("long")))
      }
    exactRankByBucket(src, groupCol, valueCol, tieCol, bucketExpr,
      Some(sideRowsAtMost))
  }

  /** The two-phase exact-rank core with a CALLER-SUPPLIED monotone
    * bucket expression — for value distributions the equi-width
    * bucketing of [[withExactRankScaled]] cannot balance (heavy ties:
    * a document-frequency column where half the keys share df = 1
    * lands half the rows in one bucket whatever the width). The caller
    * promises `finiteBucket` is a pure function of the row that is
    * MONOTONE in the (valueCol, tieCol) sort order; equal sort keys
    * must bucket equally (any function of the sort-key prefix
    * qualifies). Output contract identical to [[withExactRank]]:
    * `__rn` bit-equal to `row_number() over (partition by group order
    * by value, tie)`, plus `__n`. */
  private[graft] def withExactRankMonotone(df: DataFrame, groupCol: String,
      valueCol: String, tieCol: String, finiteBucket: Column): DataFrame =
    exactRankByBucket(df, groupCol, valueCol, tieCol, finiteBucket)

  /** The shared two-phase exact-rank core: sentinel buckets for
    * NULL/NaN around the caller's monotone `finiteBucket`, per-
    * (group, bucket) counts cumulated through the triangle join, the
    * only window within one (group, bucket). `sideRowsAtMost` is the
    * caller's upper bound on the (group × bucket) side-table
    * cardinality — when provided, the broadcast decision needs no
    * counts.count() job (a conservative over-estimate just falls back
    * to the planner's shuffle join, bit-identical output). */
  private def exactRankByBucket(df: DataFrame, groupCol: String,
      valueCol: String, tieCol: String, finiteBucket: Column,
      sideRowsAtMost: Option[Long] = None): DataFrame = {
    val withB = df.withColumn("__qb",
      when(col(valueCol).isNull, lit(Long.MinValue))
        .when(isnan(col(valueCol).cast("double")), lit(Long.MaxValue))
        .otherwise(finiteBucket))
    // pinned: (group, bucket)-sized, consumed three times (both sides
    // of the triangle join + the totals) — without the pin each
    // consumer re-expands the caller's value derivation, which for
    // quality scores is a corpus tokenization
    val counts = Checkpoints.pin(
      withB.groupBy(groupCol, "__qb").agg(count(lit(1)).as("__bn")))
    // broadcast bound (r17 advice): the side tables are (groups ×
    // buckets) rows — a few-group caller (lang) broadcasts kilobytes,
    // a per-domain caller would ship millions of rows to every task
    // AND pin them on the driver; past the bound the planner picks a
    // shuffle join, bit-identical output
    val maybeBcast: DataFrame => DataFrame =
      if (sideRowsAtMost.getOrElse(counts.count()) <= (1L << 20)) broadcast else identity
    val offsets = counts.as("a")
      .join(maybeBcast(counts.as("b")),
        col(s"a.$groupCol") <=> col(s"b.$groupCol")
          && col("b.__qb") < col("a.__qb"), "left")
      .groupBy(col(s"a.$groupCol").as(groupCol), col("a.__qb").as("__qb"))
      .agg(coalesce(sum(col("b.__bn")), lit(0L)).as("__offset"))
    val totals = counts.groupBy(groupCol).agg(sum(col("__bn")).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("__qb"))
      .orderBy(col(valueCol), col(tieCol))
    withB.as("l")
      .join(maybeBcast(offsets.as("o")),
        col(s"l.$groupCol") <=> col(s"o.$groupCol")
          && col("l.__qb") === col("o.__qb"))
      .join(maybeBcast(totals.as("t")),
        col(s"l.$groupCol") <=> col(s"t.$groupCol"))
      .select(withB.columns.map(c => col(s"l.$c"))
        :+ col("o.__offset") :+ col("t.__n"): _*)
      .withColumn("__rn", col("__offset") + row_number().over(w))
      .drop("__qb", "__offset")
  }

  /** SQL ntile(k) reconstructed from [[withExactRank]]'s (`__rn`,
    * `__n`): the first n mod k tiles take ⌈n/k⌉ rows, the rest ⌊n/k⌋
    * — exact integer arithmetic, identical to Spark's and DuckDB's
    * ntile over the same total order. */
  def ntileOfRank(rn: Column, n: Column, k: Int): Column = {
    require(k >= 1, s"k must be positive, got $k")
    // exact integer floor-div: (a − a % b) is exactly divisible, so
    // the double division is exact (no ⌊a/b⌋-vs-rounding drift at
    // 2^40-row groups the way a plain double a/b would risk)
    def fdiv(a: Column, b: Column): Column = ((a - a % b) / b).cast("long")
    val q = fdiv(n, lit(k.toLong))
    val rem = n % k
    val cut = rem * (q + 1) // rows covered by the ⌈n/k⌉-sized tiles
    when(rn - 1 < cut, fdiv(rn - 1, q + 1) + 1)
      .otherwise(rem + fdiv(rn - 1 - cut, q) + 1) // q ≥ 1 here: n ≥ k
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

  /** Reproducible global training-order shuffle — the loader step
    * between packing ([[Packing]]/[[Sharding]]) and export: training
    * wants the corpus in a fixed pseudo-random order, and that order
    * must be REPRODUCIBLE (same corpus + seed → same order, on any
    * cluster, after any retry) so a run can resume mid-epoch and an
    * ablation can replay the exact data order.
    *
    * The permutation is md5(key:salt) order (ties broken by key — a
    * total order). Emitted as (shard, pos): `shard` is an
    * ORDER-PRESERVING hash-prefix range (shard boundaries align with
    * the permutation, so shard files concatenate into the global
    * order) and `pos` is the exact global 0-based position.
    *
    * Scale shape: never a global sort partition — per-shard counts
    * cumulate through a broadcast triangle join (the two-phase
    * cumulative sum of [[Sharding.sizeBudgeted]]), and the only sort
    * is the within-shard window, each shard ~1/nShards of the corpus
    * writing its own file. One shuffle on the shard key. */
  def shuffleDeterministic(df: DataFrame, keyCol: String,
                           nShards: Int = 64, salt: Int = 42): DataFrame = {
    require(nShards >= 1 && nShards <= 256, "nShards must be in 1..256")
    val withH = df
      .withColumn("__h", saltedHash(col(keyCol), salt))
      .withColumn("shard", prefixBucket(col("__h"), nShards))
    val counts = withH.groupBy("shard").agg(count(lit(1)).as("__n"))
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")), col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(coalesce(sum(col("b.__n")), lit(0L)).as("__offset"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__h"), col(keyCol))
    withH.join(broadcast(offsets), Seq("shard"))
      .withColumn("pos", col("__offset") + row_number().over(w) - 1)
      .drop("__h", "__offset")
  }

  /** Materialize [[shuffleDeterministic]]'s permutation as the export
    * artifact: one parquet dir per shard (`shard=` hive layout), rows
    * inside each shard file in ascending `pos` — so a loader reading
    * shard dirs in order streams the corpus in the exact global
    * training order, and any shard can be re-read independently for a
    * mid-epoch resume. One shuffle (repartition by shard) + a
    * shard-local sort; the write preserves task row order, which IS
    * pos order after sortWithinPartitions. Deterministic: same corpus
    * + seed → byte-identical shards (SamplingSpec). */
  def writeShuffled(df: DataFrame, keyCol: String, outPath: String,
                    nShards: Int = 64, salt: Int = 42): Unit =
    shuffleDeterministic(df, keyCol, nShards, salt)
      .repartition(col("shard"))
      .sortWithinPartitions(col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(outPath)

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

  /** TOKEN-budget mixture composition — the DoReMi-style domain-weights
    * contract: each source contributes AT MOST `budgets(source)` units
    * of `sizeCol` (tokens), filled by documents in deterministic
    * md5(key) order. Rate-based mixing ([[weightedMix]]) controls
    * DOCUMENT proportions; training mixtures are specified in TOKENS,
    * and doc-length skew between sources makes the two materially
    * different. The doc that straddles its source's boundary is kept
    * (it STARTS inside the budget — same convention as
    * [[Sharding.sizeBudgeted]]); sources absent from `budgets` drop.
    *
    * Scale shape: the per-source running total reuses the two-phase
    * cumulative sum — 256 hash-prefix buckets per source, per-
    * (source, bucket) totals cumulated by a broadcast triangle join,
    * within-bucket window only — so no partition ever holds more than
    * ~1/256 of one source; budgets broadcast. Deterministic across
    * layout/retries via the same full-row-fingerprint tiebreak. */
  def tokenBudgetMix(df: DataFrame, sourceCol: String, keyCol: String,
                     sizeCol: String, budgets: Map[String, Long],
                     buckets: Int = 256): DataFrame =
    withRunningBefore(df, sourceCol, keyCol, sizeCol, budgets, buckets)
      .filter(col("__before") < col("__budget"))
      .drop("__before", "__budget", "__total")

  /** [[tokenBudgetMix]] with EPOCH upsampling — the full domain-weights
    * contract: a source whose budget EXCEEDS its data repeats (up to
    * `maxEpochs` passes) until the token budget fills, the way small
    * high-weight domains are actually trained. Adds an `epoch` column
    * (0-based pass index). No second running sum is needed: a doc's
    * global position is the closed form epoch × sourceTotal +
    * within-epoch position, so repeats are a per-row sequence explode
    * against a broadcast per-source total — cost scales with the
    * EMITTED rows, and maxEpochs hard-bounds the blowup a tiny source
    * with a huge budget could cause. Epoch count is exact integer
    * arithmetic (⌊(budget−1)/total⌋+1, capped), identical in any
    * engine. */
  def tokenBudgetMixEpochs(df: DataFrame, sourceCol: String, keyCol: String,
                           sizeCol: String, budgets: Map[String, Long],
                           maxEpochs: Int = 4, buckets: Int = 256): DataFrame = {
    require(maxEpochs >= 1, "maxEpochs must be at least 1")
    val base = withRunningBefore(df, sourceCol, keyCol, sizeCol, budgets, buckets)
    val nEp = least(lit(maxEpochs.toLong),
      floor((col("__budget") - 1) / col("__total")).cast("long") + 1)
    // nEp is 0 for a zero budget (the "drop this source" config) —
    // guard it, because sequence(0, −1) DESCENDS ([0, −1]) and the
    // epoch −1 rows would then pass the budget filter unconditionally
    base
      .withColumn("epoch",
        explode(when(nEp > 0, sequence(lit(0L), nEp - 1))
          .otherwise(array().cast("array<long>"))))
      .filter(col("epoch") * col("__total") + col("__before") < col("__budget"))
      .drop("__before", "__budget", "__total")
  }

  /** Shared stage of the token-budget mixers: annotates each row of a
    * budgeted source with `__before` (the exact total of `sizeCol`
    * over all earlier rows of its source in md5(key) order),
    * `__budget`, and `__total` (the source's full size — derived from
    * the same bucket totals, so it costs no extra corpus scan). The
    * per-source running total is the two-phase cumulative sum
    * (per-(source, bucket) totals cumulated by a broadcast triangle
    * join + a within-bucket window), so no partition ever holds more
    * than ~1/256 of one source. */
  private def withRunningBefore(df: DataFrame, sourceCol: String, keyCol: String,
                                sizeCol: String, budgets: Map[String, Long],
                                buckets: Int): DataFrame = {
    require(budgets.nonEmpty, "empty budgets")
    require(buckets >= 1 && buckets <= 256, "buckets must be in 1..256")
    val spark = df.sparkSession
    import spark.implicits._
    val h = md5(col(keyCol).cast("string"))
    val withKeys = df
      .withColumn("__h", h)
      .withColumn("__bucket", prefixBucket(col("__h"), buckets))
    val totals = withKeys.groupBy(sourceCol, "__bucket")
      .agg(sum(col(sizeCol)).as("__btotal"))
    val offsets = totals.as("a")
      .join(broadcast(totals.as("b")),
        col(s"a.$sourceCol") === col(s"b.$sourceCol")
          && col("b.__bucket") < col("a.__bucket"), "left")
      .groupBy(col(s"a.$sourceCol").as(sourceCol), col("a.__bucket").as("__bucket"))
      .agg(coalesce(sum(col("b.__btotal")), lit(0L)).as("__offset"))
    val fp = xxhash64(df.columns.map(col): _*)
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol, "__bucket")
      .orderBy(col("__h"), col(sizeCol), col("__fp"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val budgetDf = broadcast(budgets.toSeq.toDF(sourceCol, "__budget"))
    val srcTotals = totals.groupBy(sourceCol).agg(sum(col("__btotal")).as("__total"))
    withKeys
      .withColumn("__fp", fp)
      .join(broadcast(offsets), Seq(sourceCol, "__bucket"))
      .withColumn("__before", col("__offset") + coalesce(sum(col(sizeCol)).over(wb), lit(0L)))
      .join(budgetDf, Seq(sourceCol))
      .join(broadcast(srcTotals), Seq(sourceCol))
      .drop("__h", "__bucket", "__offset", "__fp")
  }
}
