package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert ("merge") jobs — the Spark re-expression of the
  * reference's Postgres `INSERT ... ON CONFLICT` semantics (SURVEY.md
  * §2.8, U1-U7):
  *
  *   - DO-UPDATE  (U1 stock_price_history, U4 news_stock_analysis,
  *                 U5 stock_predictions): incoming batch wins on key
  *                 collision. Reference: full_stock_pipeline.py:405-415.
  *   - DO-NOTHING (U2 trading_patterns, U3 daily_company_news,
  *                 U7 backfill): existing target wins.
  *                 Reference: full_stock_pipeline.py:449,471,482.
  *   - OVERWRITE  (U6 tech_companies): full replace.
  *                 Reference: fetch_tech_companies.py:66-89.
  *
  * Mechanics: tag-union + window row_number over the key, keeping the
  * preferred provenance. Columns are aligned by name (`unionByName`),
  * so schema drift between target and updates is an explicit error.
  *
  * Scale: one shuffle on the merge key — the same shuffle a SQL MERGE
  * would pay. On a partitioned lake, pair with dynamic partition
  * overwrite (`spark.sql.sources.partitionOverwriteMode=dynamic`) so
  * only partitions containing updated keys rewrite; within a batch both
  * sides should be bucketed by key to make the merge shuffle-free.
  * Idempotence (re-applying a batch is a no-op) is property-tested in
  * MergeSpec.
  */
object Merge {
  private val provCol = "__graft_prov"
  private val seqCol  = "__graft_seq"

  private def merge(target: DataFrame, updates: DataFrame, keys: Seq[String],
                    updatesWin: Boolean): DataFrame = {
    val cols = target.columns.toSeq
    require(keys.forall(cols.contains), s"merge keys $keys must exist in target")
    val t = target.withColumn(provCol, lit(if (updatesWin) 1 else 0))
    val u = updates.select(cols.map(col): _*).withColumn(provCol, lit(if (updatesWin) 0 else 1))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(provCol))
    t.unionByName(u)
      .withColumn(seqCol, row_number().over(w))
      .filter(col(seqCol) === 1)
      .drop(provCol, seqCol)
  }

  /** ON CONFLICT (keys) DO UPDATE — updates win. Updates are deduped on
    * the key first (last-write-wins is undefined within a batch, as in
    * the reference's per-row upsert loop, so we take an arbitrary-but-
    * deterministic one via dropDuplicates). */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    merge(target, updates.dropDuplicates(keys), keys, updatesWin = true)

  /** ON CONFLICT (keys) DO NOTHING — existing rows win. */
  def insertIgnore(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    merge(target, updates.dropDuplicates(keys), keys, updatesWin = false)

  /** U6 — overwrite-upsert: rebuild the dim from the incoming batch. */
  def overwrite(updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.dropDuplicates(keys)
}
