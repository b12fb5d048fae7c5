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

  /** Materialize packed bins into the LOADER artifact: one row per
    * (shard, bin) carrying the concatenated text plus the boundary
    * metadata a trainer needs to reset attention/position state at
    * document edges — doc ids in pack order and the token OFFSET where
    * each document starts (exclusive prefix sums of the token counts).
    * Ids and offsets are CSV strings (exact longs), not arrays, so the
    * row hashes/compares identically in any engine.
    *
    * Scale shape: [[nextFitPack]]'s iterator pass, a join back for the
    * text, then ONE aggregation keyed by (shard, bin) whose per-group
    * state is bounded by `capacity` tokens — collect_list here is safe
    * BECAUSE the packing invariant caps what any group can hold (a
    * bin never exceeds capacity unless a single over-long doc owns the
    * bin alone). Offsets fold inside the row via array HOFs — exact
    * integer arithmetic, no window pass. */
  def materialize(docs: DataFrame, idCol: String, textCol: String,
                  shards: Int, capacity: Long): DataFrame = {
    val spark = docs.sparkSession
    val sized = docs.select(
      col(idCol).cast("long").as("id"),
      col(textCol).as("text"),
      size(graft.functions.TextStats.tokens(col(textCol))).cast("long").as("n_toks"))
    val packed = nextFitPack(sized.select(col("id"), col("n_toks")), "id", "n_toks",
      shards, capacity)
    packed.select(col("shard"), col("id"), col("bin"))
      .join(sized, Seq("id"))
      .groupBy("shard", "bin")
      .agg(sort_array(collect_list(struct(col("id"), col("n_toks"), col("text")))).as("m"))
      .select(
        col("shard"), col("bin"),
        size(col("m")).cast("long").as("n_docs"),
        aggregate(col("m"), lit(0L), (a, x) => a + x.getField("n_toks")).as("n_tokens"),
        array_join(transform(col("m"), x => x.getField("id").cast("string")), ",")
          .as("doc_ids"),
        array_join(transform(
          slice(aggregate(col("m"), array(lit(0L)),
            (acc, x) => array_append(acc, element_at(acc, -1) + x.getField("n_toks"))),
            lit(1), size(col("m"))),
          o => o.cast("string")), ",").as("offsets"),
        concat_ws(" ", transform(col("m"), x => x.getField("text"))).as("text"))
  }
}
