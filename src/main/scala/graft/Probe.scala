package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual registered queries at SPARK_GRAFT_SF_DIR
  * (default sf0.1) with the same session config as [[Bench]], printing
  * per-query seconds and, with -explain, the formatted physical plan.
  *
  *   sbt "runMain graft.Probe q_dedup_ngram q_text_stats"
  *   sbt "runMain graft.Probe -explain q_dedup_ngram"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("-explain")
    val names = args.filterNot(_.startsWith("-"))
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
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; have ${SparkEntry.queries.keys.toSeq.sorted.mkString(",")}"))
      if (explain) {
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan
        var md5s = 0; var hofs = 0; var nodes = 0
        plan.foreach { op =>
          op.expressions.foreach(_.foreach { e =>
            nodes += 1
            val n = e.getClass.getSimpleName
            if (n == "Md5") md5s += 1
            if (n == "ArrayTransform" || n == "ArrayAggregate" || n == "ArrayFilter") hofs += 1
          })
        }
        println(s"PLAN $name md5Exprs=$md5s hofExprs=$hofs exprNodes=$nodes")
      }
      val c0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      val cold = (System.nanoTime() - c0) / 1e9
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      println(f"PROBE $name cold=$cold%.3f warm=${(System.nanoTime() - t0) / 1e9}%.3f s")
      if (args.contains("-show")) fn(spark, sfDir).show(20, truncate = false)
    }
    spark.stop()
  }
}
