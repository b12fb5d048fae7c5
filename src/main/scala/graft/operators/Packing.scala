package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window sequence packing: place documents into fixed-
  * capacity bins (training batches of ≤ `capacity` tokens) with the
  * greedy NEXT-FIT rule — a bin closes the moment a document doesn't
  * fit, a document never splits, and a document larger than the
  * capacity gets a bin of its own. This is the loader-side packing
  * step after [[Chunker]] (which splits long docs) and differs from
  * [[Sharding.sizeBudgeted]] (which balances cumulative size across a
  * fixed shard count and lets shard totals straddle the budget):
  * here the capacity is a HARD bound per bin.
  *
  * Distribution: packing is inherently sequential, so it runs
  * sequentially only WITHIN a shard — rows hash-partition by shard,
  * sort within partitions by (shard, id), and a single streaming
  * iterator pass assigns bins, resetting state at every shard
  * boundary (several shards may share a Spark partition; one shard
  * never spans two). No group is ever materialized — pure iterator
  * fold over spill-sorted input — so a shard may exceed executor
  * memory. At 100 TB, pick `shards` so per-shard output files land
  * near the target file size.
  *
  * Determinism: shard = id mod shards and processing order = id are
  * both layout-independent (and engine-portable: the oracle replays
  * the identical fold as a recursive CTE).
  */
object Packing {

  /** Pack (id, size) rows into next-fit bins per shard. Output:
    * shard, id, bin (1-based within shard), n_tokens. */
  def nextFitPack(df: DataFrame, idCol: String, sizeCol: String,
                  shards: Int, capacity: Long): DataFrame = {
    require(shards > 0 && capacity > 0, s"bad packing params ($shards, $capacity)")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        pmod(col(idCol).cast("long"), lit(shards.toLong)).as("shard"),
        col(idCol).cast("long").as("id"),
        col(sizeCol).cast("long").as("size"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = -1L
        var bin = 0L
        var fill = 0L
        it.map { case (shard, id, size) =>
          if (shard != curShard) { curShard = shard; bin = 1L; fill = size }
          else if (fill + size <= capacity) fill += size
          else { bin += 1L; fill = size }
          (shard, id, bin, size)
        }
      }
      .toDF("shard", "id", "bin", "n_tokens")
  }
}
