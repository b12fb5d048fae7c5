package graft

import org.scalatest.Tag

/** Tag for registry-wide slow suites. Included in a plain `sbt test`
  * (the gate the sweep was promoted into after round 11's one-off run);
  * exclude it in the fast dev loop with
  * `sbt "testOnly * -- -l graft.SlowSweep"`. */
object SlowSweep extends Tag("graft.SlowSweep")

/** The registry-wide drift-invariance sweep, promoted from round 11's
  * one-off evidence (COVERAGE.md) into CI: EVERY registered query runs
  * against sf0.001 and against the fully drifted copy of it
  * ([[DriftFixture]]), and the outputs must match row-for-row. Row
  * order is normalized (sorted render) because not every registered
  * query ends in a total ORDER BY; values must be byte-identical.
  * All failures are collected before asserting so one regression
  * doesn't hide another.
  */
class DriftSweepSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  test("every registered query returns identical rows on the fully drifted vintage", SlowSweep) {
    val driftDir = DriftFixture.drifted(spark, src)
    val diffs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val base = fn(spark, src).collect().map(_.toString).sorted.toSeq
        val drift = fn(spark, driftDir).collect().map(_.toString).sorted.toSeq
        if (base.isEmpty) Some(s"$name: empty result on the base dir")
        else if (drift != base) {
          val firstDiff = base.zipAll(drift, "<missing>", "<missing>")
            .find { case (b, d) => b != d }
            .map { case (b, d) => s"base=$b drifted=$d" }
            .getOrElse("<row sets differ>")
          Some(s"$name: ${base.size} base vs ${drift.size} drifted rows; first diff: $firstDiff")
        } else None
      } catch {
        case e: Throwable =>
          Some(s"$name: threw ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries are not drift-invariant:\n" + diffs.mkString("\n"))
  }
}
