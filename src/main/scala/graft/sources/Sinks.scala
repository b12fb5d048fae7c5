package graft.sources

import graft.operators.Merge
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File sinks (SURVEY.md §2.1).
  *
  *  - S2: date-foldered JSON raw zone — the reference writes
  *    `YYYY/MM/DD/{symbol}_{yyyymmdd}.json` (full_stock_pipeline.py:104-111);
  *    Spark's equivalent is hive-style `partitionBy(y,m,d)`, which
  *    Catalyst prunes on read.
  *  - S5: parquet processed zone (full_stock_pipeline.py:222-235).
  *  - S7: overwrite staging (truncate-and-replace semantics,
  *    full_stock_pipeline.py:347-354).
  *  - S8-equivalent: `mergeInto` — read-merge-write with the §2.8 rules
  *    instead of the reference's row-at-a-time JDBC upsert loop.
  *
  * S3 (object-store upload) needs no code: Spark writes `gs://`/`s3a://`
  * paths through the Hadoop FS layer directly.
  */
object Sinks {

  /** S2 — raw zone: JSON partitioned by date folders derived from `dateCol`. */
  def rawJsonZone(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("y", date_format(col(dateCol), "yyyy"))
      .withColumn("m", date_format(col(dateCol), "MM"))
      .withColumn("dd", date_format(col(dateCol), "dd"))
      .write.mode(SaveMode.Append).partitionBy("y", "m", "dd").json(path)

  /** S5 — processed zone: parquet partitioned by the date column. */
  def processedParquet(df: DataFrame, dateCol: String, path: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy(dateCol).parquet(path)

  /** S7 — staging: truncate-and-replace. */
  def overwriteStaging(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S8/U* — keyed merge into a partitioned parquet target that only
    * rewrites the partitions the batch touches: read the TOUCHED slice
    * of the target (partition-pruned scan), merge with the batch, write
    * back with dynamic partition overwrite. Untouched partitions are
    * neither read nor rewritten — at 100 TB a daily batch costs one
    * day's partition, not the table. Requires every merge key group to
    * live in one partition (true when partitionCol is derived from the
    * key, as with date-keyed facts). */
  def mergeIntoPartitioned(updates: DataFrame, targetPath: String, keys: Seq[String],
                           partitionCol: String, doUpdate: Boolean): Unit = {
    require(keys.contains(partitionCol),
      s"partition column $partitionCol must be part of the merge key")
    val spark = updates.sparkSession
    val exists = {
      val p = new org.apache.hadoop.fs.Path(targetPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val merged =
        if (!exists) Merge.overwrite(updates, keys)
        else {
          val touched = updates.select(partitionCol).distinct().collect()
            .map(_.get(0)).toSeq
          val slice = spark.read.parquet(targetPath)
            .filter(col(partitionCol).isInCollection(touched))
          val m = if (doUpdate) Merge.upsert(slice, updates, keys)
                  else Merge.insertIgnore(slice, updates, keys)
          m
        }
      // truncate lineage before writing: the merged plan scans the very
      // files dynamic overwrite will replace, and Spark (rightly)
      // refuses to overwrite a path it is reading from
      val materialized = merged.localCheckpoint(true)
      materialized.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCol).parquet(targetPath)
    } finally {
      prevMode match {
        case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** S8/U* — keyed merge into an unpartitioned parquet target: read
    * target ∪ updates, resolve by key, rewrite. Prefer
    * [[mergeIntoPartitioned]] for lake-scale targets.
    *
    * Crash-safe promote: the merged result is staged to `__staged`,
    * the live target is renamed aside to `__old`, the staged dir is
    * renamed into place, and only then is `__old` deleted. At every
    * instant either the old or the new table exists at a recoverable
    * location; [[recoverMergeTarget]] (run on entry) rolls an
    * interrupted promote back or forward, so a retry after a crash
    * never rebuilds the table from the current batch alone.
    */
  def mergeInto(updates: DataFrame, targetPath: String, keys: Seq[String],
                doUpdate: Boolean): Unit = {
    val spark = updates.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val targetP = new org.apache.hadoop.fs.Path(targetPath)
    val fs = targetP.getFileSystem(conf)
    recoverMergeTarget(fs, targetPath)
    val targetExists = fs.exists(targetP)
    val merged =
      if (!targetExists) Merge.overwrite(updates, keys)
      else {
        val target = spark.read.parquet(targetPath)
        if (doUpdate) Merge.upsert(target, updates, keys)
        else Merge.insertIgnore(target, updates, keys)
      }
    // rewrite via a temp path: the source scan and the overwrite target
    // must not be the same files
    promoteStaged(fs, merged, targetPath, targetExists)
  }

  /** Crash-safe replace: write `df` to `target__staged`, rename the
    * live target aside to `target__old`, promote, drop the old copy.
    * Recovery for every intermediate state is [[recoverMergeTarget]]. */
  private def promoteStaged(fs: org.apache.hadoop.fs.FileSystem, df: DataFrame,
                            targetPath: String, targetExists: Boolean): Unit = {
    val targetP = new org.apache.hadoop.fs.Path(targetPath)
    val tmp = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "__staged")
    val old = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "__old")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (targetExists && !fs.rename(targetP, old))
      throw new java.io.IOException(s"promote: could not rename $targetP aside to $old")
    if (!fs.rename(tmp, targetP))
      throw new java.io.IOException(s"promote: could not promote $tmp to $targetP")
    fs.delete(old, true)
  }

  /** Small-files compaction: rewrite the parquet table at `path` into
    * ceil(bytes / targetFileBytes) files (crash-safe promote, same
    * recovery protocol as [[mergeInto]]). The lake's standing
    * maintenance job — streaming ingest and per-day merges accrete
    * small files; scan cost at 100 TB is dominated by file count. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverMergeTarget(fs, path)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val compacted = spark.read.parquet(path).repartition(nFiles)
    promoteStaged(fs, compacted, path, targetExists = true)
  }

  /** Recovery for an interrupted [[mergeInto]] promote. Idempotent.
    *  - `__old` exists and the target is missing → the crash hit between
    *    rename-aside and promote: roll back (`__old` → target).
    *  - `__old` exists alongside the target → the promote completed but
    *    cleanup didn't: the new table already contains the old rows,
    *    drop `__old`.
    *  - a `__staged` dir is always stale (promotes are renames, never
    *    partial) → drop it. */
  def recoverMergeTarget(fs: org.apache.hadoop.fs.FileSystem, targetPath: String): Unit = {
    val targetP = new org.apache.hadoop.fs.Path(targetPath)
    val tmp = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "__staged")
    val old = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "__old")
    if (fs.exists(old)) {
      if (!fs.exists(targetP)) {
        if (!fs.rename(old, targetP))
          throw new java.io.IOException(s"mergeInto recovery: could not restore $old to $targetP")
      } else fs.delete(old, true)
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }
}
