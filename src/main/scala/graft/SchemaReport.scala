package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: one-screen drift report of the ACTUAL testdata schemas
  * against the engine's canonical expectations — run this first thing
  * each round, before anything else touches the data:
  *
  *   sbt "runMain graft.SchemaReport /root/testdata/sf0.001"
  *
  * Per column it prints ok (exact), equiv (interchangeable flavor, e.g.
  * TIMESTAMP vs TIMESTAMP_NTZ), cast (value-preserving drift that
  * [[Tables]] conforms silently), or DRIFT (unconformable — queries
  * would fail; extend Tables.canon/castable deliberately). The
  * events.ts vintage is reported separately since [[Tables]] normalizes
  * it outside the conform map. Exit code 1 iff any DRIFT row.
  */
object SchemaReport {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings")) {
      val actual = spark.read.parquet(s"$dir/$t.parquet").schema
      println(s"== $t")
      actual.fields.foreach { f =>
        val status = Tables.driftStatus(t, f.name, f.dataType)
        if (status == "DRIFT") bad += 1
        println(f"  ${f.name}%-18s ${f.dataType.simpleString}%-16s $status")
      }
      // canon columns absent from the file are drift too (conform throws)
      Tables.canonColumns(t).filterNot(actual.fieldNames.contains).foreach { n =>
        bad += 1
        println(f"  $n%-18s ${"<absent>"}%-16s MISSING")
      }
    }
    println(if (bad == 0) "NO UNCONFORMABLE DRIFT" else s"$bad UNCONFORMABLE COLUMN(S)")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
