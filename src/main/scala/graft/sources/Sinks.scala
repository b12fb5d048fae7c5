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

  /** Bound a partitioned write's files-per-partition-dir: cluster the
    * rows by (partition value, a deterministic key-hash bucket in
    * [0, filesPerPartition)) so each partition dir receives at most
    * `filesPerPartition` files, whatever `spark.sql.shuffle.partitions`
    * the merge plan ran at. Without this every merged partition dir
    * collected one file per shuffle task (32 here), and the standing
    * table's reads paid ~files × open-latency forever — the classic
    * lake small-files leak, measured as the dominant fixed cost of the
    * day-grain pipeline reads (r19). The bucket is a hash of the merge
    * KEYS (never rand()) so retries and replays lay out identically;
    * parallelism per partition stays `filesPerPartition` tasks, which
    * a 100 TB deployment tunes up per its day size. */
  private def boundedPartitionLayout(df: DataFrame, keys: Seq[String],
                                     partitionCol: String,
                                     filesPerPartition: Int): DataFrame = {
    // Explicit width (r22, guide §2.5): without it AQE coalesces this
    // byte-light exchange to ONE task, and that task then writes every
    // `col=value` dir of the staged output serially — measured as four
    // ~0.5 s single-task write stages inside one full pipeline replay.
    // The session's shuffle parallelism is the planner's own pre-AQE
    // width; files-per-dir stays bounded by the BUCKET column (each
    // (partition, bucket) group hashes to one task whatever the task
    // count), so the layout contract is unchanged.
    val nW = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(nW, col(partitionCol),
      pmod(xxhash64(keys.map(col): _*), lit(filesPerPartition)))
  }

  /** S8/U* — keyed merge into a partitioned parquet target that only
    * rewrites the partitions the batch touches: read the TOUCHED slice
    * of the target (partition-pruned scan), merge with the batch, write
    * back with dynamic partition overwrite. Untouched partitions are
    * neither read nor rewritten — at 100 TB a daily batch costs one
    * day's partition, not the table. Requires every merge key group to
    * live in one partition (true when partitionCol is derived from the
    * key, as with date-keyed facts). Written partitions carry at most
    * `filesPerPartition` files ([[boundedPartitionLayout]]). */
  def mergeIntoPartitioned(updates: DataFrame, targetPath: String, keys: Seq[String],
                           partitionCol: String, doUpdate: Boolean,
                           filesPerPartition: Int = 4): Unit = {
    require(keys.contains(partitionCol),
      s"partition column $partitionCol must be part of the merge key")
    require(filesPerPartition >= 1, s"filesPerPartition must be >= 1, got $filesPerPartition")
    val spark = updates.sparkSession
    val targetP = new org.apache.hadoop.fs.Path(targetPath)
    val fs = targetP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverPartitionedMergeTarget(fs, targetPath)
    if (!fs.exists(targetP)) {
      // Crash-atomic bootstrap (ADVICE r20 medium): the first write is
      // staged and RENAMED into place, never written live. A direct
      // write crashing midway leaves a partial-but-existing target dir,
      // and every caller that gates an incremental path on
      // fs.exists(target) — Pipeline.predictDay's witness fold above
      // all — would then take the delta path against a silently
      // incomplete table forever. With the rename, a mid-bootstrap
      // crash leaves only `__staged` (dropped by
      // [[recoverPartitionedMergeTarget]] on retry) and existence of
      // the target is a completeness guarantee.
      val staged = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "__staged")
      boundedPartitionLayout(Merge.overwrite(updates, keys), keys, partitionCol, filesPerPartition)
        .write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCol).parquet(staged.toString)
      if (!fs.rename(staged, targetP))
        throw new java.io.IOException(
          s"bootstrap promote: could not rename $staged to $targetP")
      return
    }
    val touched = updates.select(partitionCol).distinct().collect()
      .map(_.get(0)).toSeq
    val slice = spark.read.parquet(targetPath)
      .filter(col(partitionCol).isInCollection(touched))
    val merged = if (doUpdate) Merge.upsert(slice, updates, keys)
                 else Merge.insertIgnore(slice, updates, keys)
    // Same staged-promote protocol as [[mergeInto]], at PARTITION
    // granularity: the merged slice is written to `__staged` (so the
    // plan never overwrites files it is scanning — no lineage
    // truncation, no executor-memory materialization), then each
    // touched partition dir is renamed aside and the staged dir
    // promoted in its place. Renames are per-partition atomic: after a
    // crash every partition is either fully old or fully new, and
    // [[recoverPartitionedMergeTarget]] (run on entry) rolls the
    // interrupted ones back. The merge itself is idempotent, so a
    // retry converges.
    val staged = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "__staged")
    val old = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "__old")
    boundedPartitionLayout(merged, keys, partitionCol, filesPerPartition)
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(staged.toString)
    fs.mkdirs(old)
    for (sp <- fs.listStatus(staged) if sp.isDirectory) {
      val name = sp.getPath.getName // hive-style "col=value"
      val live = new org.apache.hadoop.fs.Path(targetP, name)
      if (fs.exists(live) && !fs.rename(live, new org.apache.hadoop.fs.Path(old, name)))
        throw new java.io.IOException(s"promote: could not rename $live aside")
      if (!fs.rename(sp.getPath, live))
        throw new java.io.IOException(s"promote: could not promote ${sp.getPath} to $live")
    }
    fs.delete(old, true)
    fs.delete(staged, true)
  }

  /** Recovery for an interrupted [[mergeIntoPartitioned]] promote.
    * Idempotent, per partition: a dir under `__old` whose live twin is
    * missing marks a crash between rename-aside and promote → restore
    * it; one whose live twin exists means the promote completed →
    * drop it. A `__staged` dir is always safe to drop (promotes are
    * renames, never partial). */
  def recoverPartitionedMergeTarget(fs: org.apache.hadoop.fs.FileSystem,
                                    targetPath: String): Unit = {
    val targetP = new org.apache.hadoop.fs.Path(targetPath)
    val staged = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "__staged")
    val old = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "__old")
    if (fs.exists(old)) {
      for (op <- fs.listStatus(old) if op.isDirectory) {
        val live = new org.apache.hadoop.fs.Path(targetP, op.getPath.getName)
        if (!fs.exists(live)) {
          if (!fs.rename(op.getPath, live))
            throw new java.io.IOException(
              s"partitioned-merge recovery: could not restore ${op.getPath} to $live")
        }
      }
      fs.delete(old, true)
    }
    if (fs.exists(staged)) fs.delete(staged, true)
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
                            targetPath: String, targetExists: Boolean,
                            partitionCols: Seq[String] = Nil): Unit = {
    val targetP = new org.apache.hadoop.fs.Path(targetPath)
    val tmp = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "__staged")
    val old = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "__old")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
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

  /** [[compact]] for a hive-partitioned table, PRESERVING the partition
    * layout (a plain compact would flatten `col=value` dirs and destroy
    * the partition pruning the layout exists for — IVF cell lists,
    * inverted-index term buckets, date-partitioned facts). Rows are
    * hashed on the partition column across ceil(bytes/target) tasks, so
    * each task writes at most one file per partition value it holds:
    * small partitions compact to one file, and per-partition file count
    * is bounded by the task count instead of the append history. Same
    * crash-safe staged promote + [[recoverMergeTarget]] recovery as
    * [[compact]]. */
  def compactPartitioned(spark: SparkSession, path: String, partitionCol: String,
                         targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverMergeTarget(fs, path)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(path)
    require(df.columns.contains(partitionCol),
      s"compactPartitioned: $path has no column $partitionCol")
    val compacted = df.repartition(nFiles, col(partitionCol))
    promoteStaged(fs, compacted, path, targetExists = true, Seq(partitionCol))
  }

  /** S8 over JDBC — the reference's serving-store upsert
    * (full_stock_pipeline.py:358-376: psycopg2 execute_batch with
    * `ON CONFLICT ... DO UPDATE` / `DO NOTHING`), distributed: each
    * PARTITION opens one connection and writes PreparedStatement
    * batches of `batchSize`, so a 1000-executor job upserts in
    * parallel with O(batchSize) memory per task and no driver
    * collect. Portable two-phase upsert (no vendor ON CONFLICT):
    * batched UPDATE by key, then batched INSERT of the rows whose
    * update count was 0; `doUpdate = false` batches plain INSERTs and
    * resolves the duplicate-key failures (SQLState 23505) row-wise —
    * DO-NOTHING semantics without a read-modify-write race.
    *
    * Any count from executeBatch() that isn't a real row count —
    * `Statement.SUCCESS_NO_INFO` (-2, Oracle always), `EXECUTE_FAILED`
    * (-3, drivers that continue past per-row failures instead of
    * throwing), or any other negative — re-runs that row's UPDATE
    * alone (a single executeUpdate's count is always real, and a
    * genuine failure then throws its real error), then INSERTs on 0:
    * "unknown" is never treated as a successful update. The input is
    * deduplicated on the key columns first (same contract as the
    * file-sink Merge paths) — two same-key rows in one batch would
    * otherwise both miss the UPDATE and collide on the INSERT — with
    * a DETERMINISTIC survivor (max full-row fingerprint per key), so
    * retries of conflicting-value inputs converge to the same row
    * instead of whichever dropDuplicates happened to keep.
    *
    * Idempotent by construction (re-running a batch converges), which
    * is the crash story: JDBC targets get at-least-once + idempotence
    * rather than the staged-rename protocol of the file sinks. */
  def jdbcUpsert(df0: DataFrame, url: String, table: String, keys: Seq[String],
                 doUpdate: Boolean, batchSize: Int = 1000): Unit = {
    val cols = df0.columns.toSeq
    require(keys.nonEmpty && keys.forall(cols.contains), s"keys $keys must be columns")
    val nonKeys = cols.filterNot(keys.contains)
    require(!doUpdate || nonKeys.nonEmpty, "DO-UPDATE needs at least one non-key column")
    // deterministic survivor per key: order same-key rows by a full-row
    // fingerprint (xxhash64 spans all columns, any layout) and keep the
    // max — identical re-runs write identical rows
    val winner = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(xxhash64(cols.map(col): _*).desc)
    val df = df0
      .withColumn("__rn", row_number().over(winner))
      .filter(col("__rn") === 1).drop("__rn")
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    val updateSql =
      s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keys.map(k => s"$k = ?").mkString(" AND ")}"
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val insert = conn.prepareStatement(insertSql)
          val update = if (doUpdate) conn.prepareStatement(updateSql) else null
          def bind(st: java.sql.PreparedStatement, row: org.apache.spark.sql.Row,
                   order: Seq[String]): Unit =
            order.zipWithIndex.foreach { case (c, i) =>
              st.setObject(i + 1, row.getAs[Any](c))
            }
          rows.grouped(batchSize).foreach { batch =>
            if (doUpdate) {
              batch.foreach { r => bind(update, r, nonKeys ++ keys); update.addBatch() }
              val counts = update.executeBatch()
              // count==0 → key absent, INSERT. Anything negative —
              // SUCCESS_NO_INFO (-2), EXECUTE_FAILED (-3), or other
              // driver-specific markers — is NOT a real count; re-run
              // that row's UPDATE alone (a single executeUpdate's count
              // is always real, and a genuine failure throws its real
              // error here) and INSERT on 0. Unknown is never success.
              val misses = batch.zipAll(counts.map(Int.box), null, null).collect {
                case (r, c) if c == null || c.intValue() == 0 => r
                case (r, c) if c.intValue() < 0 =>
                  bind(update, r, nonKeys ++ keys)
                  if (update.executeUpdate() == 0) r else null
              }.filter(_ != null)
              misses.foreach { r => bind(insert, r, cols); insert.addBatch() }
              if (misses.nonEmpty) insert.executeBatch()
            } else {
              // DO NOTHING: insert row-wise, swallowing duplicate-key
              // (batch insert can't tell WHICH row collided portably)
              batch.foreach { r =>
                bind(insert, r, cols)
                try { val _ = insert.executeUpdate() }
                catch {
                  case e: java.sql.SQLException if e.getSQLState == "23505" => ()
                }
              }
            }
            conn.commit()
          }
        } finally conn.close()
      }
    }
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
