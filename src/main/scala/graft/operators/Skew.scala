package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY/brief: "salting for skew, AQE for runtime
  * re-plan").
  *
  * AQE's skew-join splitting (enabled in Bench) handles sort-merge-join
  * skew at runtime; these helpers are the *plan-level* tools for the
  * cases AQE can't fix:
  *
  *  - [[saltedAggregate]]: a hot grouping key (one user with 10% of all
  *    events) funnels into a single reducer. Two-phase salted
  *    aggregation spreads phase one over `salts` buckets, then combines
  *    the tiny per-salt partials. Works for any algebraic aggregate
  *    (sum/count/min/max — not avg directly: derive avg = sum/count).
  *
  *  - [[saltedBroadcastableJoin]]: a skewed equi-join where the small
  *    side is broadcastable is ALREADY skew-immune (no shuffle of the
  *    big side) — the helper exists to make that choice explicit.
  *    For two big sides, replicate: big side salted randomly,
  *    small-but-not-broadcastable side exploded across all salt values.
  */
object Skew {

  /** Two-phase salted sum/count over possibly-skewed keys.
    * Returns keys + `sum_<valueCol>` + `cnt`. Salt is derived from a
    * hash of the whole row (deterministic, no rand()): uniform spread
    * without breaking retry semantics. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], valueCol: String,
                      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(salts)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))
  }

  /** Skewed big×medium equi-join by salt replication: each big-side row
    * goes to one of `salts` buckets; every medium-side row is cloned
    * into all buckets, so each bucket joins 1/salts of the hot key. */
  def saltedJoin(big: DataFrame, medium: DataFrame, keys: Seq[String],
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    // replication is only correct when every medium-side row that joins
    // appears in each salt bucket at most once AND unmatched medium rows
    // are never emitted: with "right"/"full" an unmatched medium row
    // surfaces once per salt value (duplicated `salts` times)
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins only, got $joinType " +
        "(right/full would duplicate unmatched medium-side rows per salt)")
    val bigSalted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)))
    val mediumExploded = medium.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(mediumExploded, keys :+ "__salt", joinType).drop("__salt")
  }

  /** The preferred fix when one side is small: broadcast it — the big
    * side never shuffles, so key skew cannot concentrate work. */
  def saltedBroadcastableJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                              joinType: String = "inner"): DataFrame =
    big.join(broadcast(small), keys, joinType)

  /** Heavy-hitter-immune CENSUS JOIN-BACK — the skewed-join shape the
    * dedup family hits (dupSpans / passageDedup / boilerplateStrip):
    * `rows` (one row per shingle occurrence) equi-joins its own census
    * (one row per distinct key, carrying per-key counts) to attach
    * each key's verdict back onto every occurrence. A viral key (a
    * boilerplate 8-gram in millions of docs) makes one shuffle
    * partition hold millions of rows, and AQE's OptimizeSkewedJoin
    * CANNOT repair it: the census side of the join is an aggregate
    * ABOVE its shuffle stage, not a bare stage the rule can replicate
    * (verified empirically in SkewSpec — the rule pattern requires
    * shuffle-stage children).
    *
    * The census itself names the heavy hitters — its count column IS
    * the join-back weight of the key. So: census keys matching
    * `hotPred` are broadcast and resolved MAP-SIDE (no shuffle can
    * skew); resolved rows then have their `scatterKey` replaced by a
    * deterministic NEGATIVE hash of the whole row before the one
    * shuffle join against the cold census, spreading them uniformly
    * across partitions where they match nothing (census keys are
    * non-negative by contract). Each row therefore joins its census
    * values exactly once, and no shuffle partition is hot. The census
    * shuffle is planned once — hot and cold branches share it via
    * exchange reuse.
    *
    * Contract: `census` is keyed uniquely by `keys`, TOTAL over
    * `rows`' keys (it was built from `rows`), has non-null value
    * columns, and non-negative `scatterKey` values (true for the
    * 60-bit md5-derived shingle hashes). The hot set's size is bounded
    * by total_rows / threshold when `hotPred` is `count ≥ threshold` —
    * dim-sized for any real threshold, hence broadcastable. */
  def censusJoinBack(rows: DataFrame, census: DataFrame, keys: Seq[String],
                     scatterKey: String, hotPred: Column): DataFrame = {
    require(keys.contains(scatterKey), s"scatterKey $scatterKey must be a join key")
    val valueCols = census.columns.filterNot(keys.contains).toSeq
    require(valueCols.nonEmpty, "census has no value columns to join back")
    val hot = census.filter(hotPred)
      .select(keys.map(col) ++ valueCols.map(c => col(c).as(s"__hot_$c")): _*)
    val cold = census.filter(!hotPred).withColumnRenamed(scatterKey, "__scatter")
    val marked = rows.join(broadcast(hot), keys, "left")
    val scattered = marked.withColumn("__scatter",
      when(col(s"__hot_${valueCols.head}").isNotNull,
        -pmod(hash(rows.columns.map(col): _*), lit(1000000007L)) - 1)
        .otherwise(col(scatterKey)))
    val joined = scattered.join(cold.hint("shuffle_hash"),
      keys.filterNot(_ == scatterKey) :+ "__scatter", "left")
    valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(s"__hot_$c"), col(c)))
    }.drop("__scatter").drop(valueCols.map(c => s"__hot_$c"): _*)
  }
}
