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
}
