package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *  - [[maybeRefresh]] is the drift loop: refit only when the
  *    training frame grew at least `growthPct` percent past what the
  *    served version was fitted on ([[graft.sources.VersionedRoot
  *    .grewPast]] — re-running L-BFGS per unchanged day is wasted
  *    work; never refitting serves a model blind to new regimes).
  *    The tick costs ONE count of the feature frame — an aggregation,
  *    never a fit (the fit is the multi-pass solve the trigger
  *    exists to avoid).
  *  - serving ([[servedModels]]/[[scoreServed]]) is a model LOAD plus
  *    a distributed `transform` — no training pass at all, and
  *    Spark-native ML persistence makes the loaded model score
  *    bit-identically to the fit that was saved (MlSpec pins it).
  *    Loud when nothing has been published.
  *  - single writer per artifact, readers any time.
  */
object ModelArtifact {

  private val What = "model artifact"

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
    // meta LAST: the completeness marker VersionedRoot keys on
    graft.sources.IndexMeta.write(spark, s"$root/$newName/meta.json",
      Seq("feat_version" -> 1L, "train_rows" -> n, "train_fp" -> fp))
    graft.sources.VersionedRoot.publish(spark, root, newName, served)
    newName
  }

  /** The drift loop — refit when the training frame GREW at least
    * `growthPct` percent past the served version's `train_rows` (the
    * standing-state growth trade every artifact family makes), and
    * ALSO when the frame's content changed WITHOUT net growth (same
    * or fewer rows, different fingerprint): unlike the other
    * families' immutable fingerprint-guarded batches, this frame
    * derives from DO-UPDATE merges that can retract or correct values
    * in place, and a count-only witness would serve a fit on
    * superseded values forever (r18 review). The one window that
    * still rides until the bound: sub-bound NET GROWTH mixed with
    * in-place updates — the same "at most one growth bound behind"
    * contract, now stated over content. Loud on a missing/invalid
    * artifact; None only for "empty training frame" or "fresh
    * enough". Tick cost: one aggregation of `feats` (count + XOR in
    * the same pass). */
  def maybeRefresh(spark: SparkSession, path: String, feats: DataFrame,
                   growthPct: Int = 10): Option[String] = {
    require(growthPct >= 1 && growthPct <= 1000,
      s"growthPct must be in 1..1000, got $growthPct")
    graft.sources.IndexMeta.read(spark, s"$path/meta.json", What)
    val (cur, fp) = frameIdentity(feats)
    if (cur == 0L) return None // nothing to fit — never publish from nothing
    val root = modelsRoot(path)
    val served = graft.sources.VersionedRoot.resolve(spark, root, What)
    val stale = served match {
      case None => true
      case Some(r) =>
        val vmeta = graft.sources.IndexMeta
          .read(spark, s"$r/meta.json", s"$What version")
        val fitRows = vmeta.getOrElse("train_rows", 0L)
        graft.sources.VersionedRoot.grewPast(cur, fitRows, growthPct) ||
          (cur <= fitRows && !vmeta.get("train_fp").contains(fp))
    }
    if (stale) Some(refresh(spark, path, feats)) else None
  }

  /** The served (primary, residual) pair — a model load of the
    * version `CURRENT` names, no training. Loud when nothing has been
    * published (a silently refit model would hide a broken refresh
    * schedule behind correct-looking predictions). */
  def servedModels(spark: SparkSession, path: String): (PipelineModel, PipelineModel) = {
    graft.sources.IndexMeta.read(spark, s"$path/meta.json", What)
    val res = graft.sources.VersionedRoot.resolve(spark, modelsRoot(path), What)
      .getOrElse(sys.error(
        s"$What at $path has no published version — run refresh"))
    PricePredictor.loadModels(res)
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
