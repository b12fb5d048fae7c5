package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional Z-order clustering so that
  * min/max file statistics prune on EVERY clustered column, not just a
  * lexicographic leading one.
  *
  * At 100 TB the sort order of data inside files IS the index: parquet
  * readers skip whole files/row-groups whose [min,max] bounds miss the
  * predicate. A lexicographic sort gives that power to the first column
  * only; interleaving the bits of several bucketized columns (the
  * Z-curve, as popularized by Delta/Iceberg OPTIMIZE ZORDER) gives
  * every clustered column locality proportional to its bit share.
  *
  * Everything here is plain column arithmetic (shift/and/or) — fully
  * codegen'd, no UDFs — and the layout pass is one range-repartition
  * (a single shuffle) over the data.
  */
object Layout {

  /** Interleave the low `bits` bits of each (already 0-based, bounded)
    * bucket id: bit i of column j lands at position i*d + j. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && bits * buckets.size <= 63,
      s"z-value would overflow a long: $bits bits x ${buckets.size} cols")
    val d = buckets.size
    (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * d + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Equal-width bucket id in [0, 2^bits) for `c` over [lo, hi]. */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1 << bits
    val w = if (hi > lo) (hi - lo) / n else 1.0
    least(greatest(floor((c.cast("double") - lit(lo)) / lit(w)), lit(0L)), lit(n - 1L))
      .cast("long")
  }

  /** Z-value column over numeric `cols`, bucketized by their global
    * min/max (one tiny aggregate job to fetch the bounds). */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 10): Column = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    interleave(cols.zipWithIndex.map { case (c, i) =>
      bucketize(col(c), bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1), bits)
    }, bits)
  }

  /** Rewrite `df` into `nFiles` z-ordered parquet files at `path`: one
    * range-repartition on the z-value (contiguous z-ranges per file),
    * sorted within each file so row-group stats are tight too. */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
                  nFiles: Int, bits: Int = 10): Unit = {
    val z = zvalue(df, cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
