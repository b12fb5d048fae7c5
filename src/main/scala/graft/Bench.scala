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
  */
object Bench {
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
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup at the smallest SF: JIT + codegen compilation for
    // every query's operator graph, so the timed pass measures
    // steady-state execution rather than first-call compilation.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).queryExecution.toRdd.foreach(_ => ())
        catch { case _: Throwable => () }
      }

    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // three timed passes per query, min taken: the host shows 3-4× wall
    // time swings from neighbor contention (a round-6 bench recorded a
    // 0.5 s query at 10.3 s), and the min measures the engine rather
    // than the noisiest scheduling window
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val passes = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
          (System.nanoTime() - t0) / 1e9
        }
        times(name) = passes.min
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    def jnum(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = times.values.sum

    // The harness captures only the LAST ~2000 chars of output, so the
    // final line MUST be a complete JSON object well under that budget
    // or the run records no numbers at all. Values are rounded to 3
    // decimals; if the full per-query map still doesn't fit, keep the
    // slowest queries that do and report how much was omitted. The full
    // map is printed on its own line first for human inspection.
    def line(qs: Map[String, Double], omitted: Int, omittedSec: Double): String = {
      val body = qs.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${jstr(k)}:${jnum(v)}" }.mkString("{", ",", "}")
      val omit = if (omitted > 0) s""","queries_omitted":$omitted,"omitted_sec":${jnum(omittedSec)}""" else ""
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$body$omit,"errors":$es,"sf":${jstr(sfDir)}}"""
    }
    val fullLine = line(times.toMap, 0, 0.0)
    val budget = 1700
    val compact =
      if (fullLine.length <= budget) fullLine
      else {
        val bySlow = times.toSeq.sortBy(-_._2)
        // largest prefix of slowest queries whose line fits the budget
        val keep = (bySlow.length to 1 by -1).view
          .map(n => bySlow.take(n))
          .find(kept => line(kept.toMap, times.size - kept.size,
            total - kept.map(_._2).sum).length <= budget)
          .getOrElse(bySlow.take(1))
        line(keep.toMap, times.size - keep.size, total - keep.map(_._2).sum)
      }
    if (compact ne fullLine) println(fullLine)
    println(compact)
    spark.stop()
  }
}
