package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The bench record's formatting lost every round's numbers for five
  * rounds (the one-line JSON overflowed the driver's 2000-char tail
  * capture) because nothing tested it. These specs pin the contract:
  * the line always fits the budget, always parses, and when queries
  * must be omitted it keeps the SLOWEST ones and accounts for the rest.
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  // deterministic synthetic workload: 120 queries, long-ish names,
  // full-precision doubles — the shape that overflowed r1-r5
  private val times: Seq[(String, Double)] =
    (0 until 120).map(i => (f"q_synthetic_operator_name_$i%03d", 0.0311 * ((i * 37) % 91) + i / 997.0))

  test("full map fits when small") {
    val line = Bench.compactLine(times.take(10), Nil, "/root/testdata/sf0.1", of = 10)
    assert(line.length <= 1700)
    val node = mapper.readTree(line)
    assert(node.get("queries").size() === 10)
    assert(node.get("done").asInt() === 10)
    assert(node.get("of").asInt() === 10)
    assert(!node.has("queries_omitted"))
  }

  test("120-query line stays under the tail budget and parses") {
    val line = Bench.compactLine(times, Seq("q_bad" -> "boom"), "/root/testdata/sf0.1", of = 121)
    assert(line.length <= 1700, s"line was ${line.length} chars")
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() === "total")
    assert(node.get("unit").asText() === "sec")
    assert(node.get("done").asInt() === 121)
    assert(node.get("errors").get("q_bad").asText() === "boom")
    // total must be the sum over ALL queries, not just the kept ones
    assert(math.abs(node.get("value").asDouble() - times.map(_._2).sum) < 0.01)
  }

  test("omission keeps the slowest queries and accounts for the rest") {
    val line = Bench.compactLine(times, Nil, "/root/testdata/sf0.1", of = 120)
    val node = mapper.readTree(line)
    val q = node.get("queries")
    val kept = q.fieldNames().asScala.map(k => k -> q.get(k).asDouble()).toMap
    assert(kept.nonEmpty && kept.size < 120)
    val omitted = node.get("queries_omitted").asInt()
    assert(omitted === 120 - kept.size)
    // every kept query is at least as slow as every omitted one
    val keptMin = kept.values.min
    val omittedTimes = times.filterNot { case (k, _) => kept.contains(k) }
    assert(omittedTimes.forall(_._2 <= keptMin + 1e-9))
    assert(math.abs(node.get("omitted_sec").asDouble() - omittedTimes.map(_._2).sum) < 0.01)
  }

  test("partial mid-run record is self-describing (done < of)") {
    val line = Bench.compactLine(times.take(77), Nil, "/root/testdata/sf0.1", of = 120)
    val node = mapper.readTree(line)
    assert(node.get("done").asInt() === 77)
    assert(node.get("of").asInt() === 120)
    assert(line.length <= 1700)
  }

  test("pathological case: even one query over budget degrades to an empty map, still parses") {
    val line = Bench.compactLine(Seq(("q" * 2000, 1.0)), Nil, "sf", of = 1, budget = 300)
    assert(line.length > 0)
    val node = mapper.readTree(line)
    assert(node.get("queries_omitted").asInt() === 1)
  }

  test("systemic failure (all 116 queries erroring) still fits and parses") {
    // the exact shape the always-leave-a-record contract targets: a
    // bad SPARK_GRAFT_SF_DIR fails every query with a long message
    val errs = (0 until 116).map(i =>
      (f"q_synthetic_operator_name_$i%03d",
        s"[PATH_NOT_FOUND] Path does not exist: file:/no/such/dir/table_$i.parquet ... " + "x" * 80))
    val line = Bench.compactLine(Nil, errs, "/no/such/dir", of = 116)
    assert(line.length <= 1700, s"line is ${line.length} chars")
    val node = mapper.readTree(line)
    assert(node.get("done").asInt() === 116)
    val kept = node.get("errors").size()
    assert(kept > 0, "at least one error message survives for diagnosis")
    assert(node.get("errors_omitted").asInt() === 116 - kept)
  }

  test("canary fields ride the headline; negative (unmeasured) ones are omitted") {
    val both = Bench.compactLine(times.take(5), Nil, "sf", of = 5,
      canary = Seq("canary_cold" -> 6.25, "canary_warm" -> 0.51))
    val node = mapper.readTree(both)
    assert(math.abs(node.get("canary_cold").asDouble() - 6.25) < 1e-9)
    assert(math.abs(node.get("canary_warm").asDouble() - 0.51) < 1e-9)
    val coldOnly = mapper.readTree(Bench.compactLine(times.take(5), Nil, "sf", of = 5,
      canary = Seq("canary_cold" -> 6.25, "canary_warm" -> -1.0)))
    assert(coldOnly.has("canary_cold") && !coldOnly.has("canary_warm"))
    // the 120-query overflow shape still fits the tail budget with canaries
    val big = Bench.compactLine(times, Nil, "/root/testdata/sf0.1", of = 120,
      canary = Seq("canary_cold" -> 6.25, "canary_warm" -> 0.51))
    assert(big.length <= 1700, s"line is ${big.length} chars")
    assert(mapper.readTree(big).has("canary_warm"))
  }

  test("cold-sample accounting: cold_n + capped names ride the line, absent when floor met") {
    val cold = (0 until 20).map(i => f"q_cold_$i%02d")
    val node = mapper.readTree(Bench.compactLine(times.take(10), Nil, "sf", of = 10,
      cold = cold))
    assert(node.get("cold_n").asInt() === 20)
    assert(node.get("cold").size() === 12, "named cold queries cap at 12")
    assert(node.get("cold").get(0).asText() === "q_cold_00", "cold names are sorted")
    // floor met → no cold fields at all (the normal end state)
    val done = mapper.readTree(Bench.compactLine(times.take(10), Nil, "sf", of = 10))
    assert(!done.has("cold_n") && !done.has("cold"))
    // the 120-query overflow shape still fits the tail budget with a
    // full cold list AND canaries aboard
    val big = Bench.compactLine(times, Nil, "/root/testdata/sf0.1", of = 120,
      canary = Seq("canary_cold" -> 6.25, "canary_warm" -> 0.51),
      cold = (0 until 120).map(i => f"q_name_number_$i%03d"))
    assert(big.length <= 1700, s"line is ${big.length} chars")
    assert(mapper.readTree(big).get("cold_n").asInt() === 120)
  }

  test("resampleOrder: fewest samples first, slowest within tier, errored ahead of all") {
    val names = Seq("cheap_warm", "heavy_warm", "cold_slow", "cold_fast", "errored")
    val samples = Map("cheap_warm" -> 2, "heavy_warm" -> 2, "cold_slow" -> 1,
      "cold_fast" -> 1, "errored" -> 1)
    val time = Map("cheap_warm" -> 0.3, "heavy_warm" -> 12.0, "cold_slow" -> 2.5,
      "cold_fast" -> 0.9) // errored: never timed
    val order = Bench.resampleOrder(names, samples, time.get)
    assert(order === Seq("errored", "cold_slow", "cold_fast", "heavy_warm", "cheap_warm"))
  }

  test("measuredBudget: funds a full second pass off the measured pass 1, env pin wins outright") {
    // the r14 shape: 163 queries, pass 1 measured at 355 s on the
    // noisy host (the 2.5 s/query guess gave 407.5 s total and left
    // pass 2 ~12 s). The measured budget must leave pass 2 at least a
    // full pass-1-sized slice under the 0.9 cutoff.
    val b = Bench.measuredBudget(407.5, None, 355.0)
    assert(b * 0.9 - 355.0 >= 355.0, s"pass 2 headroom ${b * 0.9 - 355.0} under budget $b")
    // a fast host keeps the static floor (no artificial shrink)
    assert(Bench.measuredBudget(300.0, None, 40.0) === 300.0)
    // the env pin is exact — the driver owns the kill window
    assert(Bench.measuredBudget(407.5, Some(120.0), 355.0) === 120.0)
  }

  test("mixed times + many errors stays within budget and accounts for both") {
    val errs = (0 until 60).map(i => (f"q_err_$i%03d", "boom " + "y" * 100))
    val line = Bench.compactLine(times.take(56), errs, "/root/testdata/sf0.1", of = 116)
    assert(line.length <= 1700, s"line is ${line.length} chars")
    val node = mapper.readTree(line)
    assert(node.get("done").asInt() === 116)
    val qKept = node.get("queries").size()
    val eKept = node.get("errors").size()
    assert(qKept > 0, "capping errors must leave room for some timings")
    assert(qKept + (if (node.has("queries_omitted")) node.get("queries_omitted").asInt() else 0) === 56)
    assert(eKept + (if (node.has("errors_omitted")) node.get("errors_omitted").asInt() else 0) === 60)
  }
}
