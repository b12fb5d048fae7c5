package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match each point row to the interval rows
  * containing it, per key.
  *
  * Naive formulation is a theta join (`p >= start AND p <= end`) which
  * Spark plans as BroadcastNestedLoop/cartesian — O(points × intervals)
  * and a flagged plan at any scale. This operator BANDS the domain:
  * intervals explode to the fixed-width buckets they overlap, points
  * map to their bucket, and the match becomes an EQUI-join on
  * (key, bucket) + a residual containment filter. Cost is
  * O(points + intervals × avg_buckets_per_interval + true_matches) —
  * the standard spatial/temporal binning trick.
  *
  * `bucketWidth` should be on the order of the typical interval length:
  * too small explodes intervals, too large degrades selectivity (the
  * residual filter does more work). Both are correctness-neutral.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth))
    val i = intervals
      .withColumn("__b0", floor(col(startCol) / bucketWidth))
      .withColumn("__b1", floor(col(endCol) / bucketWidth))
      // one row per overlapped bucket
      .withColumn("__bucket", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b0", "__b1")
    p.join(i, keys :+ "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
