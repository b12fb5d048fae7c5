package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.PipelineModel

/** The persisted, growth-refreshed lifecycle of the price-prediction
  * models — the artifact tier the ML family was missing (r17 verdict
  * #1: ranks, PPR memos, postings, vectors, sketches and the linkage
  * catalog all serve from versioned standing state, while every
  * pipeline run refit and re-scored from scratch; the predict stage
  * was the E1 pipeline's single largest fixed cost). The reference
  * itself persists its fitted (model, scaler) pair with joblib
  * (analyze_news_stock_patterns.py:140-145) and serves predictions by
  * LOADING it (:150-156) — this is that train-once/score-many split
  * under the house publication protocol.
  *
  * Layout under one meta-checked root:
  * {{{
  *   meta.json             feat_version, written once (loud on mismatch)
  *   tick.json             advisory last-tick (count, fp) — the
  *                         in-place-change-mid-growth-window witness
  *   models/v_<n>/primary/   fitted assemble→scale→LR PipelineModel
  *   models/v_<n>/residual/  fitted residual-correction PipelineModel
  *   models/v_<n>/meta.json  train_rows baseline, written LAST
  *   models/CURRENT          atomic serving pointer ([[graft.sources.VersionedRoot]])
  * }}}
  *
  * Contracts, each the established house protocol:
  *  - [[refresh]] fits BOTH stages on the caller's training frame and
  *    publishes a complete `v_<n>` behind the atomic `CURRENT` swap
  *    with served-identity GC; the version meta records `train_rows`
  *    — the exact training-frame count, which is simultaneously the
  *    growth baseline AND the staleness witness a serving gate can
  *    check exactly (q_ml_served's oracle pins it).
  *  - [[maybeRefresh]] is the drift loop: refit on growth past
  *    `growthPct`, on any non-growth content change (fingerprint),
  *    on an in-place change mid-growth-window (last-tick identity),
  *    or on per-feature distribution drift past `psiBound` (the
  *    served version's fit-time histogram vs the frame — re-running
  *    L-BFGS per unchanged day is wasted work; never refitting
  *    serves a model blind to new regimes). The tick costs ONE
  *    aggregation of the feature frame (count + XOR + histogram
  *    buckets in the same pass), never a fit.
  *  - serving ([[servedModels]]/[[scoreServed]]) is a model LOAD plus
  *    a distributed `transform` — no training pass at all, and
  *    Spark-native ML persistence makes the loaded model score
  *    bit-identically to the fit that was saved (MlSpec pins it).
  *    Loud when nothing has been published.
  *  - single writer per artifact, readers any time.
  */
object ModelArtifact {

  private val What = "model artifact"

  /** The feature columns whose distributions the drift tick monitors
    * (the [[PricePredictor.featuresOf]] numeric recipe, label
    * included — label drift is exactly the regime change a served
    * regression must not ride through). */
  private val HistCols = Seq("close", "prev_close", "pct_change", "vol", "label")

  /** Equi-width buckets per monitored column. 10 finite buckets plus
    * one null/NaN bucket — the conventional PSI bucketing
    * ([[graft.operators.Profile.psi]] bands: <0.1 stable, >0.25
    * shifted). */
  private val HistBuckets = 10

  /** The training frame's identity in ONE aggregation: exact row
    * count plus the house count+XOR content fingerprint's XOR half
    * (order- and layout-independent). The count alone was the r18
    * first cut — and a DO-UPDATE history merge can change VALUES
    * without changing the count, which a count-only witness would
    * serve a superseded fit against forever (r18 review). */
  private def frameIdentity(feats: DataFrame): (Long, Long) = {
    val fp = graft.operators.Profile.contentFingerprint(feats)
    val i = fp.indexOf('x')
    (fp.substring(0, i).toLong, fp.substring(i + 1).toLong)
  }

  /** Finite view of a monitored column: null for NULL and NaN and
    * ±Infinity (they count in the null/NaN bucket, and must not
    * poison the equi-width scale — the [[graft.operators.Sampling
    * .withExactRankScaled]] rule). */
  private def finiteD(c: String) = {
    val d = col(c).cast("double")
    when(!isnan(d) && d.between(Double.MinValue, Double.MaxValue), d)
  }

  /** The bucket-count expressions for one column under FIXED edges —
    * shared by the fit-time histogram and the tick's re-count so the
    * two sides can never bucket differently. Emits HistBuckets finite
    * buckets (clamped into [0, B), degenerate lo >= hi range → all
    * finite mass in bucket 0) plus the null/NaN bucket. */
  private def bucketCountCols(c: String, lo: Double, hi: Double): Seq[Column] = {
    val d = finiteD(c)
    val b =
      if (!(lo < hi)) lit(0L)
      else {
        val step = (hi - lo) / HistBuckets
        least(lit(HistBuckets - 1L), greatest(lit(0L),
          floor((d - lit(lo)) / lit(step)).cast("long")))
      }
    (0 until HistBuckets).map(i =>
      sum(when(d.isNotNull && b === i, 1L).otherwise(0L))) :+
      sum(when(d.isNull, 1L).otherwise(0L))
  }

  /** Fit-time histogram meta fields for every monitored column:
    * `h_<col>_lo` / `h_<col>_hi` (IEEE-754 bits of the observed
    * finite range) and `h_<col>_b0..b<B-1>` / `h_<col>_bn` counts.
    * Two aggregations over the pinned frame (edges, then counts) —
    * fit-time cost beside the L-BFGS solves, not tick cost. */
  private def histogramFields(feats: DataFrame): Seq[(String, Long)] = {
    val boundCols = HistCols.flatMap(c => Seq(min(finiteD(c)), max(finiteD(c))))
    val bounds = feats.agg(boundCols.head, boundCols.tail: _*).head()
    val edges = HistCols.zipWithIndex.map { case (c, i) =>
      val lo = if (bounds.isNullAt(2 * i)) 0.0 else bounds.getDouble(2 * i)
      val hi = if (bounds.isNullAt(2 * i + 1)) 0.0 else bounds.getDouble(2 * i + 1)
      (c, lo, hi)
    }
    val countCols = edges.flatMap { case (c, lo, hi) => bucketCountCols(c, lo, hi) }
    val counts = feats.agg(countCols.head, countCols.tail: _*).head()
    edges.zipWithIndex.flatMap { case ((c, lo, hi), ci) =>
      val base = ci * (HistBuckets + 1)
      Seq(s"h_${c}_lo" -> java.lang.Double.doubleToLongBits(lo),
        s"h_${c}_hi" -> java.lang.Double.doubleToLongBits(hi)) ++
        (0 until HistBuckets).map(b => s"h_${c}_b$b" -> counts.getLong(base + b)) :+
        (s"h_${c}_bn" -> counts.getLong(base + HistBuckets))
    }
  }

  /** The fixed-bucketing PSI between a stored fit-time histogram and
    * the tick's re-count — Σ (p−q)·ln(p/q), Laplace-smoothed over the
    * FIXED bucket count exactly like [[graft.operators.Profile.psi]]
    * (empty buckets contribute their small nonzero smoothing term,
    * never ±∞). */
  private def psiOf(fit: IndexedSeq[Long], cur: IndexedSeq[Long]): Double = {
    val nb = fit.length
    val (tb, tc) = (fit.sum.toDouble, cur.sum.toDouble)
    (0 until nb).map { i =>
      val p = (fit(i) + 1.0) / (tb + nb)
      val q = (cur(i) + 1.0) / (tc + nb)
      (p - q) * math.log(p / q)
    }.sum
  }

  /** Does this version meta carry the full histogram tier for every
    * monitored column? (Pre-r19 versions don't — the tick skips PSI
    * until the next refit publishes one.) */
  private def hasHistogram(vmeta: Map[String, Long]): Boolean =
    HistCols.forall { c =>
      vmeta.contains(s"h_${c}_lo") && vmeta.contains(s"h_${c}_hi") &&
        (0 until HistBuckets).forall(b => vmeta.contains(s"h_${c}_b$b")) &&
        vmeta.contains(s"h_${c}_bn")
    }

  /** Write the feature-schema version meta once — [[graft.operators
    * .Profile.initArtifact]] semantics: re-init is a no-op when equal,
    * loud when different (a model fitted on one feature recipe must
    * never be served against another's frame). */
  def init(spark: SparkSession, path: String): Unit =
    graft.operators.Profile.initArtifact(spark, path, What,
      Seq("feat_version" -> 1L))

  private def modelsRoot(path: String) = s"$path/models"

  /** Fit primary + residual on `feats` (a [[PricePredictor.features]]
    * frame) into a fresh version and swap the serving pointer.
    * Returns the published version name. Loud on an empty frame — a
    * zero-row fit would crash inside the solver with a message that
    * points nowhere. */
  def refresh(spark: SparkSession, path: String, feats: DataFrame): String = {
    graft.sources.IndexMeta.read(spark, s"$path/meta.json", What)
    val root = modelsRoot(path)
    val served = graft.sources.VersionedRoot.resolve(spark, root, What)
    val newName = graft.sources.VersionedRoot.nextVersion(spark, root)
    // one materialization feeds the identity agg and both fits' passes
    val pinned = graft.operators.Checkpoints.pin(feats)
    val (n, fp) = frameIdentity(pinned)
    require(n > 0,
      s"$What at $path: refusing to fit on an empty training frame")
    val primary = PricePredictor.fitPrimary(pinned)
    val residual = PricePredictor.fitResidual(primary, pinned)
    PricePredictor.saveModels(primary, residual, s"$root/$newName")
    // meta LAST: the completeness marker VersionedRoot keys on. It
    // carries the fit frame's full drift witness: count + XOR content
    // fingerprint (exact identity) AND the per-feature equi-width
    // histogram (the PSI baseline the tick compares against — r18
    // advice: without a distribution witness, sub-bound growth mixed
    // with in-place corrections served a superseded fit with no bound
    // in time)
    graft.sources.IndexMeta.write(spark, s"$root/$newName/meta.json",
      Seq("feat_version" -> 1L, "train_rows" -> n, "train_fp" -> fp) ++
        histogramFields(pinned))
    graft.sources.VersionedRoot.publish(spark, root, newName, served)
    newName
  }

  /** The drift loop — refit when any of four staleness witnesses
    * trips, each closing a failure shape the previous ones miss:
    *
    *  1. GROWTH: the frame grew at least `growthPct` percent past the
    *     served version's `train_rows` (the standing-state growth
    *     trade every artifact family makes).
    *  2. NON-GROWTH CONTENT CHANGE: same or fewer rows, different
    *     count+XOR fingerprint — this frame derives from DO-UPDATE
    *     merges that can retract or correct values in place, and a
    *     count-only witness would serve a fit on superseded values
    *     forever (r18 review).
    *  3. IN-PLACE CHANGE MID-GROWTH-WINDOW: the frame's count equals
    *     the PREVIOUS tick's but its fingerprint differs — a
    *     correction landing while cur sits in (train_rows, growth
    *     bound), which rule 2 cannot see because cur > train_rows
    *     (r18 advice: without this, a correction during stalled
    *     sub-bound growth was served indefinitely — unbounded in
    *     TIME, not just one bound in count). The last tick's
    *     (count, fp) lives in `tick.json` at the artifact root;
    *     advisory state — unreadable/missing just widens the window
    *     back to rules 1/2/4 until the next clean tick.
    *  4. DISTRIBUTION DRIFT: PSI between the served version's
    *     fit-time per-feature histogram and the current frame's
    *     counts (same stored edges, fixed-bucket Laplace smoothing)
    *     exceeds `psiBound` on ANY monitored column — the covariate/
    *     label shift trigger that catches sub-bound growth whose DATA
    *     moved (the reference refits unconditionally every run; this
    *     is the tick-cheap equivalent). Pre-r19 versions without a
    *     stored histogram skip this rule until their next refit.
    *
    * The remaining honest blind window: sub-bound net growth whose
    * in-place corrections arrive in the SAME tick as the growth and
    * whose distributional shift stays under `psiBound` — it rides at
    * most until the growth bound, the contract every artifact family
    * makes. Loud on a missing/invalid artifact; None only for "empty
    * training frame" or "fresh enough". Tick cost: ONE aggregation of
    * `feats` (count + XOR + all histogram buckets in the same pass)
    * plus the advisory tick-file write — never a fit. */
  def maybeRefresh(spark: SparkSession, path: String, feats: DataFrame,
                   growthPct: Int = 10, psiBound: Double = 0.25): Option[String] = {
    require(growthPct >= 1 && growthPct <= 1000,
      s"growthPct must be in 1..1000, got $growthPct")
    require(psiBound > 0, s"psiBound must be positive, got $psiBound")
    graft.sources.IndexMeta.read(spark, s"$path/meta.json", What)
    val root = modelsRoot(path)
    val served = graft.sources.VersionedRoot.resolve(spark, root, What)
    val vmeta = served.map(r => graft.sources.IndexMeta
      .read(spark, s"$r/meta.json", s"$What version"))
    // ONE pass over the frame: identity (count + XOR, formula-equal to
    // Profile.contentFingerprint's default) and, when the served
    // version stored a histogram, every bucket re-count under the
    // STORED edges
    val histMeta = vmeta.filter(hasHistogram)
    val withH = feats.select(feats.columns.map(col) :+
      xxhash64(feats.columns.map(col): _*).as("__h"): _*)
    val aggCols = Seq(count(lit(1)), coalesce(expr("bit_xor(__h)"), lit(0L))) ++
      histMeta.toSeq.flatMap { m =>
        HistCols.flatMap { c =>
          bucketCountCols(c,
            java.lang.Double.longBitsToDouble(m(s"h_${c}_lo")),
            java.lang.Double.longBitsToDouble(m(s"h_${c}_hi")))
        }
      }
    val row = withH.agg(aggCols.head, aggCols.tail: _*).head()
    val (cur, fp) = (row.getLong(0), row.getLong(1))
    if (cur == 0L) return None // nothing to fit — never publish from nothing
    val prevTick = readTick(spark, path)
    val stale = vmeta match {
      case None => true
      case Some(m) =>
        val fitRows = m.getOrElse("train_rows", 0L)
        val psiStale = histMeta.exists { hm =>
          HistCols.zipWithIndex.exists { case (c, ci) =>
            val fit = (0 until HistBuckets).map(b => hm(s"h_${c}_b$b")) :+ hm(s"h_${c}_bn")
            val curCounts = (0 to HistBuckets).map(b => row.getLong(2 + ci * (HistBuckets + 1) + b))
            psiOf(fit, curCounts) > psiBound
          }
        }
        graft.sources.VersionedRoot.grewPast(cur, fitRows, growthPct) ||
          (cur <= fitRows && !m.get("train_fp").contains(fp)) ||
          prevTick.exists { case (pn, pfp) => pn == cur && pfp != fp } ||
          psiStale
    }
    val out = if (stale) Some(refresh(spark, path, feats)) else None
    writeTick(spark, path, cur, fp)
    out
  }

  /** Last tick's (count, fp) — advisory: a missing or torn tick file
    * (crash mid-write) reads as absent and the next tick rewrites it;
    * the cost of losing one is one missed rule-3 detection, bounded
    * by rules 1/2/4. */
  private def readTick(spark: SparkSession, path: String): Option[(Long, Long)] =
    scala.util.Try {
      val m = graft.sources.IndexMeta.read(spark, s"$path/tick.json", s"$What tick")
      (m("last_n"), m("last_fp"))
    }.toOption

  private def writeTick(spark: SparkSession, path: String, n: Long, fp: Long): Unit =
    graft.sources.IndexMeta.write(spark, s"$path/tick.json",
      Seq("last_n" -> n, "last_fp" -> fp))

  /** JVM-level memo of loaded model pairs, keyed by the RESOLVED
    * version dir PLUS the version meta's fit identity (train_rows,
    * train_fp): a published `v_<n>` is immutable (supersession
    * publishes a new name behind the CURRENT swap), but the PATH
    * alone is reusable — an artifact root deleted and re-stood-up in
    * the same JVM republishes `v_1` at the identical absolute path
    * (r19 review), and a path-keyed cache would silently serve the
    * previous artifact's fit. The identity fields ride the key, so a
    * recreated root misses the cache (its fingerprint differs) at
    * the cost of one tiny meta read per serve. The cache exists
    * because a long-lived scoring service must not pay Spark ML's
    * many-small-parquet-files load on every request (measured
    * ~1.8 s/replay on q_e1_pipeline's predict stage, the bulk of its
    * r18 regression). Bounded: cleared wholesale past a small cap —
    * models are immutable on disk, a re-load is always correct. */
  private val loadedModels =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), (PipelineModel, PipelineModel)]()

  /** The served (primary, residual) pair — a memoized model load of
    * the version `CURRENT` names, no training. Loud when nothing has
    * been published (a silently refit model would hide a broken
    * refresh schedule behind correct-looking predictions). */
  def servedModels(spark: SparkSession, path: String): (PipelineModel, PipelineModel) = {
    graft.sources.IndexMeta.read(spark, s"$path/meta.json", What)
    val res = graft.sources.VersionedRoot.resolve(spark, modelsRoot(path), What)
      .getOrElse(sys.error(
        s"$What at $path has no published version — run refresh"))
    val vmeta = graft.sources.IndexMeta.read(spark, s"$res/meta.json", s"$What version")
    if (loadedModels.size > 16) loadedModels.clear()
    loadedModels.computeIfAbsent(
      (res, vmeta.getOrElse("train_rows", 0L), vmeta.getOrElse("train_fp", 0L)),
      _ => PricePredictor.loadModels(res))
  }

  /** The served version's meta (feat_version, train_rows) — what a
    * serving gate checks exactly: `train_rows` equal to the current
    * frame's count proves the served model is the one fitted on THIS
    * frame, i.e. the growth trigger superseded every stale vintage. */
  def servedVersionMeta(spark: SparkSession, path: String): Map[String, Long] = {
    graft.sources.IndexMeta.read(spark, s"$path/meta.json", What)
    val res = graft.sources.VersionedRoot.resolve(spark, modelsRoot(path), What)
      .getOrElse(sys.error(
        s"$What at $path has no published version — run refresh"))
    graft.sources.IndexMeta.read(spark, s"$res/meta.json", s"$What version")
  }

  /** Score a feature frame with the SERVED models — the
    * train-once/score-many serving surface: load + distributed
    * transform, zero training passes. */
  def scoreServed(feats: DataFrame, path: String): DataFrame = {
    val (primary, residual) = servedModels(feats.sparkSession, path)
    PricePredictor.scoreNextDay(feats, primary, residual)
  }
}
