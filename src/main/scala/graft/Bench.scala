package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Timing forces FULL materialization of every output row via
  * `queryExecution.toRdd.foreach` — `count()` would let Catalyst prune
  * all projection work (VERDICT r1). Failures are reported per query in
  * an explicit "errors" field and excluded from the total rather than
  * masquerading as fast runs.
  *
  * Harness contract (learned the hard way over r1–r6, see VERDICT r6):
  * the round driver keeps only the LAST ~2000 chars of stdout and a
  * hard wall-clock budget. So this main is built to ALWAYS leave a
  * parseable record:
  *  - ONE mandatory timed pass per query (no sf0.001 warmup sweep, no
  *    unconditional min-of-3 — r6's 108 queries × 4 executions blew
  *    the budget and recorded nothing);
  *  - the compact JSON line is re-printed after EVERY query, so even a
  *    mid-run kill leaves the last complete line with
  *    done/of + queries_omitted accounting;
  *  - log level ERROR, so no late WARN can evict the final line from
  *    the tail capture;
  *  - extra noise-reduction passes (min-of-N) run ONLY while the
  *    wall-clock budget has headroom. The budget is sized from the
  *    MEASURED mandatory-pass elapsed ([[measuredBudget]]): the r13
  *    fix scaled a guess (~2.5 s/query) with registry size, but the
  *    real cold cost on the noisy host ran past it and left 111/163
  *    queries single-sample while the prose claimed the floor was met
  *    (r14 verdict #1). Measuring removes the guess: pass 2 always
  *    has room for a full second sample of every query, whatever this
  *    host's speed today. SPARK_GRAFT_BUDGET_S pins the budget
  *    exactly when set (the driver's kill-window cap);
  *  - bench_full.json is rewritten after every pass, so a mid-run
  *    kill keeps the freshest full-precision record too.
  */
object Bench {

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  private def jnum(v: Double): String =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** The compact one-line JSON record. Pure and deterministic so the
    * formatting — which silently lost every round's numbers for five
    * rounds when it overflowed the 2000-char tail capture — is unit
    * tested (BenchLineSpec). Values rounded to 3 decimals; if the full
    * per-query map exceeds `budget` chars, only the SLOWEST queries
    * that fit are kept, with the omitted count and their summed
    * seconds reported. `of` is the total number of registered queries
    * so a partial record (mid-run kill) is self-describing via
    * done &lt; of. */
  def compactLine(times: Seq[(String, Double)], errors: Seq[(String, String)],
                  sf: String, of: Int, budget: Int = 1700,
                  canary: Seq[(String, Double)] = Nil,
                  cold: Seq[String] = Nil): String = {
    val total = times.map(_._2).sum
    val done = times.size + errors.size
    // host-load canary fields (cold/warm q_rollup timings) ride in the
    // headline so cross-round perf judgment no longer requires digging
    // bench_snapshots; negative = not measured, omitted from the line
    // cold-sample accounting (r13 verdict: a single-sample number must
    // be VISIBLY cold): cold_n = how many queries still carry only
    // their one plan-compile-inflated sample, with up to 12 named so a
    // regression-looking number can be traced to starvation without
    // digging bench_full.json (which carries the full samples map).
    // Empty once the ≥2-sample floor is met — the normal end state.
    val coldPart =
      if (cold.isEmpty) ""
      else s""","cold_n":${cold.size},"cold":${cold.sorted.take(12).map(jstr).mkString("[", ",", "]")}"""
    val can = canary.collect { case (k, v) if v >= 0 => s""","${k}":${jnum(v)}""" }.mkString + coldPart
    def line(qs: Seq[(String, Double)], omitted: Int, omittedSec: Double,
             errs: Seq[(String, String)], errsOmitted: Int): String = {
      val body = qs.sortBy(_._1)
        .map { case (k, v) => s"${jstr(k)}:${jnum(v)}" }.mkString("{", ",", "}")
      val omit = if (omitted > 0) s""","queries_omitted":$omitted,"omitted_sec":${jnum(omittedSec)}""" else ""
      val es = errs.map { case (k, v) => s"${jstr(k)}:${jstr(v.take(120))}" }
        .mkString("{", ",", "}")
      val eo = if (errsOmitted > 0) s""","errors_omitted":$errsOmitted""" else ""
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","done":$done,"of":$of,"queries":$body$omit,"errors":$es$eo,"sf":${jstr(sf)}$can}"""
    }
    val full = line(times, 0, 0.0, errors, 0)
    if (full.length <= budget) full
    else {
      // over budget: first cap the errors section at a third of the
      // line budget (the systemic-failure shape — every query erroring
      // on a bad sf dir — would otherwise overflow the line by itself;
      // a few messages diagnose it as well as 116 copies), then keep
      // the largest prefix of SLOWEST queries that fits beside them
      def esLen(k: Int): Int = errors.take(k)
        .map { case (n, v) => jstr(n).length + jstr(v.take(120)).length + 2 }.sum
      val eKeep = (errors.length to 0 by -1).find(esLen(_) <= budget / 3).getOrElse(0)
      val errsKept = errors.take(eKeep)
      val bySlow = times.sortBy(-_._2)
      (bySlow.length to 0 by -1).view
        .map(n => bySlow.take(n))
        .map(kept => line(kept, times.size - kept.size,
          total - kept.map(_._2).sum, errsKept, errors.size - eKeep))
        .find(_.length <= budget)
        .getOrElse(line(Nil, times.size, total, Nil, errors.size))
    }
  }

  /** Re-sample priority for the noise-reduction passes: queries with the
    * FEWEST samples first (a single cold, plan-compile-inflated sample is
    * the thing min-of-N repairs), slowest-first within a tier, and
    * never-timed (errored) queries ahead of everything so a transient
    * failure gets its retry before polish. Pure — pinned by
    * BenchLineSpec. */
  def resampleOrder(names: Seq[String], samples: String => Int,
                    time: String => Option[Double]): Seq[String] =
    names.sortBy(n => (samples(n), -time(n).getOrElse(Double.MaxValue)))

  /** The wall budget, decided AFTER the mandatory pass from its
    * measured elapsed — not from a per-query guess (r14 verdict: the
    * 2.5 s/query estimate under-ran the host's real ~2.2 s/query cold
    * cost + startup, so pass 2 got ~12 s and 111/163 queries stayed
    * single-sample). pass1 × 2.2 + 60 funds a complete second pass —
    * warm re-runs cost at most what cold ones did, the 0.9 cutoff
    * needs 10% slack, and the +60 absorbs the end-canary and write-out
    * — while the static floor keeps tiny registries from starving.
    * The env pin wins outright when set: the round driver owns the
    * kill window, and a measured budget must never run past it. Pure —
    * pinned by BenchLineSpec. */
  def measuredBudget(staticFloor: Double, envBudget: Option[Double],
                     pass1Elapsed: Double): Double =
    envBudget.getOrElse(math.max(staticFloor, pass1Elapsed * 2.2 + 60.0))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    // ERROR, not WARN: a WARN flood near the kill point (e.g. r6's
    // WindowExec warnings) can evict the final JSON line from the
    // driver's 2000-char tail capture
    spark.sparkContext.setLogLevel("ERROR")
    // MLlib fits (intentional zero regParam — the reference trains
    // plain OLS) WARN through their own log4j loggers, which
    // setLogLevel does not cover; pin them here rather than as a
    // library-wide side effect in PricePredictor
    try {
      Seq("org.apache.spark.ml.util.Instrumentation",
        "org.apache.spark.ml.regression.LinearRegression").foreach(
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          _, org.apache.logging.log4j.Level.ERROR))
    } catch { case _: Throwable => () }

    val t00 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t00) / 1e9
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // The real budget is decided AFTER the mandatory pass from its
    // measured cost (measuredBudget — the r14 verdict's fix for the
    // starved second sample); the static floor alone gates nothing
    // before then because pass 1 is unconditional anyway.
    val staticFloor = math.max(300.0, ordered.size * 2.5)
    val envBudget = sys.env.get("SPARK_GRAFT_BUDGET_S").map(_.toDouble)
    // Drift guard: full report to stderr; on an unconformable vintage
    // leave ONE parseable stdout record (the driver machine-reads the
    // tail) instead of 124 identical per-query failures, then die.
    // The guard itself must never kill the bench without a record: a
    // regeneration that DELETES a table file makes the report's
    // spark.read throw AnalysisException — exactly the
    // zero-stdout-records failure the guard exists to prevent.
    val drifted = try SchemaReport.assertConformable(spark, sfDir, throwOnDrift = false)
      catch { case e: Throwable => Seq(s"schema report failed: ${e.getMessage.take(160)}") }
    if (drifted.nonEmpty) {
      println(compactLine(Nil,
        Seq("__schema_drift__" ->
          s"unconformable column(s) ${drifted.mkString(", ")} in $sfDir"),
        sfDir, ordered.size))
      spark.stop()
      sys.exit(1)
    }
    // Host-load canary: one fixed cheap query timed FIRST, recorded in
    // the bench_full.json header. This host's neighbor contention swings
    // wall time 3-4×; cross-round comparisons divide by the canary to
    // tell a plan regression from a noisy host.
    val canary = try {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_rollup")(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    } catch { case _: Throwable => -1.0 }
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val samples = scala.collection.mutable.HashMap[String, Int]().withDefaultValue(0)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def coldNames: Seq[String] = ordered.map(_._1).filter(samples(_) < 2)
    def emit(warm: Double = -1.0): Unit =
      println(compactLine(times.toSeq, errors.toSeq, sfDir, ordered.size,
        canary = Seq("canary_cold" -> canary, "canary_warm" -> warm),
        cold = coldNames))

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        val sec = (System.nanoTime() - t0) / 1e9
        // count SUCCESSFUL timings only: a failed attempt must not
        // demote the query's resample priority (retries are bounded by
        // the pass count, so a permanently-broken query costs at most
        // one attempt per pass)
        samples(name) += 1
        times(name) = times.get(name).fold(sec)(math.min(_, sec))
        errors.remove(name)
      } catch {
        case e: Throwable if !times.contains(name) =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        case _: Throwable => () // keep the pass-1 number over a flaky retry
      }

    // full-precision record for humans — to a FILE, never to stdout,
    // where a long line could pollute the tail capture. Rewritten
    // after every pass (cheap, a few KB) so a mid-run kill keeps the
    // freshest samples map, not just the compact line.
    var pass = 1
    def writeFull(budget: Double, canaryEnd: Double = -1.0): Unit = try {
      val all = times.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${jstr(k)}:${jnum(v)}" }.mkString("{", ",", "}")
      val samp = ordered.map(_._1)
        .map(n => s"${jstr(n)}:${samples(n)}").mkString("{", ",", "}")
      // per-stage E1 wall times (jobs/Pipeline.runTimed, set when
      // q_e1_pipeline ran this JVM): the pipeline is the bench's
      // slowest query, and a stage map localizes a regression to
      // ingest/merge/patterns/news/ML instead of "it got slower"
      def stageJson(field: String, stages: Seq[(String, Double)]): String =
        if (stages.isEmpty) ""
        else s""","$field":${stages.map { case (k, v) => s"${jstr(k)}:${jnum(v)}" }.mkString("{", ",", "}")}"""
      val stagePart = stageJson("e1_stages", graft.jobs.Pipeline.lastStageSeconds) +
        stageJson("e1_day_stages", graft.jobs.Pipeline.lastDayStageSeconds)
      val p = java.nio.file.Paths.get("bench_full.json")
      java.nio.file.Files.write(p,
        s"""{"passes":$pass,"elapsed_sec":${jnum(elapsed)},"budget_s":${jnum(budget)},"canary_q_rollup":${jnum(canary)},"canary_q_rollup_warm":${jnum(canaryEnd)},"queries":$all,"samples":$samp$stagePart}\n""".getBytes("UTF-8"))
    } catch { case _: Throwable => () }

    // mandatory pass: one execution per query, record re-emitted after
    // each so any kill point still leaves a complete JSON line behind
    ordered.foreach { case (name, fn) => runOnce(name, fn); emit() }
    val budgetS = measuredBudget(staticFloor, envBudget, elapsed)
    writeFull(budgetS)

    // optional noise-reduction passes (the host shows 3-20× wall-time
    // swings from neighbor contention): spend whatever budget remains
    // on FEWEST-SAMPLES-FIRST, slowest-first within a tier — min-of-N
    // only repairs the total where a query still carries its one cold
    // (plan-compile-inflated) sample or where noise dominates. The old
    // full-pass gate (elapsed < 0.5×budget) meant a loaded host —
    // exactly when noise is worst — never got a second sample at all;
    // plain slowest-first then burned pass 3 re-running warmed heavies
    // while the cheap tail stayed cold. Budget is re-checked before
    // every query so a slow re-run can never push past the driver's
    // kill; errored queries sort first so a transient failure gets its
    // retry before polish.
    // Pass 2 is ALWAYS entered (the ≥2-samples floor the scaled budget
    // exists to fund — fewest-samples-first means the still-cold tail
    // drains before any third sample), with a slightly higher per-query
    // cutoff so a loaded host still reaches the floor; passes 3+ are
    // pure polish and keep the conservative gates.
    while (pass < 4 && (pass == 1 || elapsed < budgetS * 0.8)) {
      pass += 1
      val cutoff = if (pass == 2) 0.9 else 0.85
      val byName = ordered.toMap
      val it = resampleOrder(ordered.map(_._1), samples, times.get)
        .map(n => n -> byName(n)).iterator
      while (it.hasNext && elapsed < budgetS * cutoff) {
        val (name, fn) = it.next()
        runOnce(name, fn); emit()
      }
      writeFull(budgetS)
    }

    // warm end-canary: the start canary folds JVM/codegen warmup into
    // its number (≈6 s even on a calm host); this one re-times the same
    // fixed query with everything warm, so start≫end = warmup,
    // end≫calm-baseline (~0.5 s) = genuine neighbor load. Budget-gated:
    // the resample loop may run to 85% of the wall budget, and on the
    // loaded host where a canary matters most it could take seconds —
    // never risk the driver's kill landing before the record is written
    val canaryEnd = if (elapsed >= budgetS * 0.92) -1.0 else try {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_rollup")(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    } catch { case _: Throwable => -1.0 }

    writeFull(budgetS, canaryEnd)
    emit(warm = canaryEnd)
    spark.stop()
  }
}
