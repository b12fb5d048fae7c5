package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — classify every key of two table versions as
  * `added` / `removed` / `changed` (with the list of changed columns).
  * The audit half of [[Merge]]: where `Merge.mergeInto` APPLIES a delta,
  * `diff` RECOVERS the delta between two lake snapshots — the standard
  * "what changed since yesterday's load" question over the reference's
  * daily re-ingested dimension tables (dim overwrite loads,
  * dags/tasks/load_dim_tables.py-shape), answered engine-side.
  *
  * Scale shape (100 TB): ONE full outer shuffle join on the key — the
  * minimum any exact diff needs. Both sides shuffle-partition by the
  * same key, so at 1000 executors each partition diffs locally; with
  * both snapshots bucketed by key on disk (see BucketingSpec) the
  * shuffle disappears entirely. Column comparison is a codegen'd
  * null-safe expression per column — no per-row object churn, no UDF.
  *
  * Determinism: `changed_cols` lists columns in SORTED name order, so
  * output is byte-stable regardless of input column order.
  */
object SnapshotDiff {

  /** Row-level diff of `newDf` vs `oldDf` on `keys`.
    *
    * Output: key columns + `change` ('added'|'removed'|'changed') +
    * `changed_cols` (sorted array of differing column names; empty for
    * added/removed). Unchanged keys are dropped — on a 100 TB snapshot
    * pair the output is delta-sized, not corpus-sized.
    *
    * Value comparison is null-safe (`<=>`): a NULL→value or
    * value→NULL transition counts as a change, NULL→NULL does not.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(keys.forall(oldDf.columns.contains) && keys.forall(newDf.columns.contains),
      s"key column(s) missing from a snapshot: keys=${keys.mkString(",")} " +
      s"old=${oldDf.columns.mkString(",")} new=${newDf.columns.mkString(",")}")
    // compare over the UNION of value columns: a column present on only
    // one side reads as NULL on the other, so schema evolution surfaces
    // as changed rows (changed_cols names the added/dropped column) —
    // an intersection would silently report an empty delta for a
    // populated new column
    val compareCols = (oldDf.columns ++ newDf.columns)
      .distinct.filterNot(keys.contains).sorted.toSeq
    def side(df: DataFrame, alias: String) = {
      val cols = keys.map(col) ++ compareCols.map(c =>
        if (df.columns.contains(c)) col(c) else lit(null).as(c))
      df.select(cols: _*).alias(alias)
    }
    val o = side(oldDf, "o")
    val n = side(newDf, "n")
    // PLAIN equality on the keys, not <=>: keys are primary-key-like
    // (never null), and a null-safe join key rewrites to
    // (coalesce(k), isnull(k)) which disables bucket-local execution —
    // the whole point of diffing co-bucketed snapshots (BucketingSpec)
    val on = keys.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    // presence flags must come from the KEY columns (never null in
    // data), not from nullable value columns
    val inOld = col(s"o.${keys.head}").isNotNull
    val inNew = col(s"n.${keys.head}").isNotNull
    val changedCols = filter(
      array(compareCols.map(c =>
        when(!(col(s"o.$c") <=> col(s"n.$c")), lit(c))): _*),
      x => x.isNotNull)
    // SHUFFLE_HASH: a snapshot-vs-snapshot full outer is two
    // corpus-sized sides — never broadcastable — and the shuffled hash
    // join skips the per-partition sort a sort-merge join would pay.
    // Per-partition hash build fits memory under the engine's
    // partition-sizing contract (spark.sql.shuffle.partitions sized to
    // the SF); AQE skew-split still applies on top.
    o.join(n.hint("SHUFFLE_HASH"), on, "full_outer")
      .withColumn("change",
        when(!inOld, lit("added"))
          .when(!inNew, lit("removed"))
          .when(size(changedCols) > 0, lit("changed")))
      .filter(col("change").isNotNull)
      .withColumn("changed_cols",
        when(col("change") === "changed", changedCols)
          .otherwise(array().cast("array<string>")))
      .select(
        keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++
          Seq(col("change"), col("changed_cols")): _*)
  }
}
