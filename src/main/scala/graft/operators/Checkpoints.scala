package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage pinning with a cluster-robust option. Iterative operators
  * (PageRank sweeps, Ed-Join's shared gram/frequency passes, BPE's
  * merge rounds) sever lineage so plan depth doesn't compound — but
  * `localCheckpoint` stores the severed blocks on EXECUTOR
  * memory/disk, so on a real cluster an executor loss after severing
  * is unrecoverable mid-job (the lineage that would recompute the
  * blocks is gone). The cluster deployment answer is a RELIABLE
  * checkpoint to the fault-tolerant checkpoint directory.
  *
  * [[pin]] keys off the session's checkpoint dir: configured
  * (`sparkContext.setCheckpointDir`, the standard cluster setup) →
  * `checkpoint()` to that storage; not configured (local runs, tests,
  * the driver's bench) → `localCheckpoint()`, which needs no external
  * storage and is faster. Results are identical either way — both
  * sever lineage at the same plan point and replay the same rows
  * (GraphSpec pins the equivalence on the iterative sweeps) — only
  * failure-recovery characteristics differ.
  *
  * Storage lifecycle in reliable mode: Spark reclaims reliable
  * checkpoint files only when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
  * FALSE — files otherwise outlive the application). Cluster
  * deployments enabling a checkpoint dir for these operators should
  * set that flag (or point the dir at storage with a TTL policy);
  * high-iteration loops (BPE's per-merge pins in particular) write
  * one pinned dataset per round, so an unreclaimed checkpoint volume
  * fills — this is the deployment's retention decision, not one the
  * library can make (deleting eagerly here would break the very
  * executor-loss recovery the mode exists for).
  */
private[graft] object Checkpoints {

  /** Sever `df`'s lineage: reliable checkpoint when the session has a
    * checkpoint dir configured, executor-pinned localCheckpoint
    * otherwise. Both eager. */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
