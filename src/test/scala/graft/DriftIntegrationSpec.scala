package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end proof that query RESULTS are testdata-vintage-invariant:
  * rewrite a copy of sf0.001 with every value-preserving physical drift
  * the conform layer claims to absorb, run real registered queries
  * against both directories, and diff collected rows. This is the
  * integration companion to TablesSpec's unit pins — it would catch a
  * future query that bypasses the [[Tables]] chokepoint or hardcodes a
  * physical type. (Drifts chosen are exactly value-preserving on this
  * data: quantities are integer-valued ≤ 50 so float holds them
  * exactly, ship/order dates are midnight-only so DATE round-trips.)
  */
class DriftIntegrationSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  private var createdDir: Option[String] = None
  override def afterAll(): Unit = {
    createdDir.foreach { d =>
      val p = java.nio.file.Paths.get(d)
      if (Files.exists(p)) {
        val s = Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
        finally s.close()
      }
    }
    super.afterAll()
  }

  private lazy val driftDir: String = {
    val dir = Files.createTempDirectory("drift-sf").toString
    createdDir = Some(dir)
    Seq("region", "nation", "customer", "supplier", "part",
        "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // documents: narrow the char counter (values are small ints)
    spark.read.parquet(s"$src/documents.parquet")
      .withColumn("n_chars", col("n_chars").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // lineitem: float quantity, wide linenumber, DATE shipdate
    spark.read.parquet(s"$src/lineitem.parquet")
      .withColumn("l_quantity", col("l_quantity").cast("float"))
      .withColumn("l_linenumber", col("l_linenumber").cast("bigint"))
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // orders: DATE orderdate, narrow orderkey is NOT safe — keep keys
    spark.read.parquet(s"$src/orders.parquet")
      .withColumn("o_orderdate", col("o_orderdate").cast("date"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // events: flip the micros vintage to the raw ns-Long vintage (the
    // round-9-era physical shape) — the opposite branch of normalizeEvents
    spark.read.parquet(s"$src/events.parquet")
      .withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // A cross-section of the registry: lineitem agg, date surface, events
  // windows/sessions, dim joins, merges-free ORDER-stable outputs only.
  private val queries = Seq(
    "q_agg_summary", "q_dates", "q_sessionize", "q_join_enrich",
    "q_latest_events", "q_time_slice", "q_market_behavior",
    "q_w_lineitem_supplier", "q_asof_lookup", "q_text_stats",
    "q_dedup_exact")

  queries.foreach { q =>
    test(s"$q returns identical rows on the drifted vintage") {
      val fn = SparkEntry.queries(q)
      val base = fn(spark, src).collect().toSeq
      val drift = fn(spark, driftDir).collect().toSeq
      assert(base.nonEmpty, s"$q returned nothing on the base dir")
      assert(drift === base)
    }
  }
}
