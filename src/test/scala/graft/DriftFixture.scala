package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Shared drifted-testdata fixture: a copy of an sf directory rewritten
  * with every value-preserving physical drift the conform layer claims
  * to absorb (float quantities, widened linenumber, DATE ship/order
  * dates, narrowed n_chars, events.ts flipped to the raw ns-Long
  * vintage — drifts chosen to be exactly value-preserving on this
  * data: quantities are integer-valued ≤ 50 so float holds them
  * exactly, ship/order dates are midnight-only so DATE round-trips).
  * Built once per (JVM, source dir), deleted on JVM exit; used by the
  * fast 11-query [[DriftIntegrationSpec]] and the registry-wide
  * [[DriftSweepSpec]].
  */
object DriftFixture {

  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private lazy val cleanupHook: Unit = sys.addShutdownHook {
    dirs.values.forEach { d =>
      val p = java.nio.file.Paths.get(d)
      if (Files.exists(p)) {
        val s = Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
        finally s.close()
      }
    }
  }

  /** The drifted copy of `src`, writing it on first use. */
  def drifted(spark: SparkSession, src: String): String = {
    cleanupHook
    dirs.computeIfAbsent(src, { _ =>
      val dir = Files.createTempDirectory("drift-sf").toString
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
    })
  }
}
