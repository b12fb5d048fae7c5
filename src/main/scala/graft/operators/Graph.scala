package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation. Web-scale training-data
  * pipelines rank crawl sources by link authority (the Common Crawl
  * host/domain graph ranks are a standard quality prior next to
  * per-document quality scores), so the engine carries the canonical
  * authority measure as a first-class batch operator.
  *
  * Determinism contract, same house rules as the sketches: all rank
  * mass is FIXED-POINT (long units at a configurable scale) and every
  * step is integer arithmetic (`DIV`), so per-node sums are
  * order-independent and the whole iteration — damping, per-edge
  * shares, dangling redistribution — replays value-exactly in any SQL
  * engine (q_pagerank's DuckDB oracle unrolls the same iterations).
  * Floating-point PageRank cannot be oracle-exact: the incoming-share
  * sum folds in partition order. Truncation from integer division
  * leaks a few units of mass per step; ranks are an ORDERING signal,
  * and every engine truncates identically.
  */
object Graph {

  /** PageRank over `edges` (src, dst), `iters` synchronous sweeps at
    * damping 0.85. Returns (node, rank) with rank in `scale`-units
    * (initial mass `scale` split evenly across nodes).
    *
    * Semantics per sweep, all integer arithmetic:
    *   damped(v)   = (rank(v) * 85) DIV 100
    *   share(u→v)  = damped(u) DIV outdeg(u)
    *   dangling    = Σ damped(v) over out-degree-0 nodes, DIV n
    *   rank'(v)    = (scale * 15 DIV 100) DIV n + dangling
    *                 + Σ share(u→v) over in-edges
    *
    * Scale shape: nodes and edges are each ONE distinct/agg pass;
    * every sweep is edges ⋈ ranks on src (both sides hash-partitioned
    * by the join key — ranks stay partitioned by node across sweeps,
    * so only the edge side's dst-sum reshuffles) + a one-row dangling
    * aggregate broadcast back. Multi-edges are collapsed first
    * (DISTINCT) and self-loops dropped — a self-loop feeds a node its
    * own mass and inflates nothing but itself. Lineage is severed
    * every few sweeps ([[Checkpoints.pin]] — a RELIABLE checkpoint
    * when the session has a checkpoint dir configured, the
    * cluster-robust mode; localCheckpoint otherwise) so deep
    * iteration counts
    * don't compound plan depth — the standard iterative-DataFrame
    * discipline. */
  def pageRank(edges: DataFrame, iters: Int = 5,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in 1..50, got $iters")
    require(scale >= 1000000L, s"scale too small for meaningful ranks: $scale")
    val e = prepEdges(edges)
    val nodes = nodeSet(e)
    val n = nodes.count()
    require(n > 0, "pageRank over an empty graph")
    // uniform PageRank IS the all-seeds special case: every node gets
    // the restart + dangling share, so when(is_seed, …) reduces to
    // the unconditional term — ONE sweep implementation serves both
    // (it couldn't stay arithmetically identical as two copies)
    rankSweeps(e, nodes.withColumn("is_seed", lit(true)), n, iters, scale)
  }

  /** Collapsed, self-loop-free, pinned edge table. */
  private def prepEdges(edges: DataFrame): DataFrame =
    Checkpoints.pin(edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst"))
      .distinct())

  /** Distinct endpoint set of a prepped edge table, pinned. */
  private def nodeSet(e: DataFrame): DataFrame =
    Checkpoints.pin(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct())

  /** The shared synchronous sweep, all integer arithmetic; `nodesF`
    * is (node, is_seed) and `s` = seed count. Per sweep:
    *   damped(v)   = (rank(v) * 85) DIV 100
    *   share(u→v)  = damped(u) DIV outdeg(u)
    *   dangling    = Σ damped(v) over out-degree-0 nodes, DIV s
    *   rank'(v)    = [is_seed] · ((scale * 15 DIV 100) DIV s + dangling)
    *                 + Σ share(u→v) over in-edges
    * Scale shape: the edge table is pre-partitioned by the per-sweep
    * join key (damped ranks come out of their agg hash-partitioned by
    * node = src after the rename, so only the dst-sum — the actual
    * rank transport — reshuffles inside a sweep); dangling mass pools
    * into ONE broadcast row; shuffle_hash hints keep every key join
    * off the sort-merge path at any stats estimate (checkpointed
    * sides have none); lineage severed every third sweep. */
  private def rankSweeps(e: DataFrame, nodesF: DataFrame, s: Long,
                         iters: Int, scale: Long): DataFrame = {
    val withDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edgesDeg = Checkpoints.pin(e.join(withDeg, "src")
      .repartition(col("src")))
    val base = (scale * 15L / 100L) / s
    var ranks = nodesF.select(col("node"), col("is_seed"),
      when(col("is_seed"), lit(scale / s)).otherwise(lit(0L)).as("r"))
    for (i <- 1 to iters) {
      val damped = ranks.select(col("node"), expr("r * 85 DIV 100").as("d"))
      val dangling = damped
        .join(withDeg.select(col("src").as("node")).hint("shuffle_hash"),
          Seq("node"), "left_anti")
        .agg(coalesce(sum(col("d")), lit(0L)).as("dt"))
        .select(expr(s"dt DIV $s").as("dshare"))
      val incoming = edgesDeg
        .join(damped.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("node"), expr("d DIV outdeg").as("share"))
        .groupBy("node")
        .agg(sum(col("share")).as("inc"))
      ranks = nodesF
        .join(incoming.hint("shuffle_hash"), Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"), col("is_seed"),
          (when(col("is_seed"), lit(base) + col("dshare")).otherwise(lit(0L))
            + coalesce(col("inc"), lit(0L))).as("r"))
      // pin EVERY sweep, not every third (r22, guide §5/§7.3): each
      // sweep references the previous ranks TWICE (damped feeds both
      // the dangling aggregate and the incoming sum), so between pins
      // the logical tree doubles per sweep and Catalyst's tree-walking
      // rules go superlinear — measured 3.1 s of driver planning
      // against 0.85 s of execution for 5 sweeps at the 3-sweep
      // cadence. A per-sweep pin keeps the plan one sweep deep (node-
      // sized materialization per sweep — the standard iterative-
      // DataFrame discipline) and cut q_pagerank ~2×. The final sweep
      // stays lazy: the caller's action materializes it.
      if (i < iters) ranks = Checkpoints.pin(ranks)
    }
    ranks.select(col("node"), col("r").as("rank"))
  }

  /** Personalized PageRank: teleport mass restarts at the SEED set
    * instead of uniformly — rank becomes proximity-to-seeds, the
    * seed-expansion primitive curation pipelines use to grow a
    * quality corpus from a vetted kernel (rank every source by its
    * link-proximity to the known-good ones, take the top tier).
    * Same integer fixed-point contract as [[pageRank]]; the 15 %
    * restart mass and all dangling mass go to the seeds, split
    * `DIV |seeds|`; non-seed nodes start at 0. Seeds are a (node)
    * frame; seeds absent from the graph are ignored (at least one
    * must be present). */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int = 5,
                           scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in 1..50, got $iters")
    require(scale >= 1000000L, s"scale too small for meaningful ranks: $scale")
    val e = prepEdges(edges)
    // one flag column from ONE left join (seeds absent from the graph
    // drop out by construction — the join is FROM the node set), read
    // by every sweep instead of per-sweep seed joins
    val nodesF = nodeSet(e)
      .join(seeds.select(col("node").cast("long")).distinct()
        .withColumn("is_seed", lit(true)).hint("shuffle_hash"),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .transform(Checkpoints.pin)
    val s = nodesF.filter(col("is_seed")).count()
    require(s > 0, "personalizedPageRank: no seed is present in the graph")
    rankSweeps(e, nodesF, s, iters, scale)
  }

  /** The DuckDB replay of [[personalizedPageRank]] over WITH-scope
    * relations `edges` (src, dst — collapsed, self-loop-free) and
    * `seeds` (node); closes over `it<iters>`. */
  def personalizedPageRankSql(iters: Int, scale: Long = 1000000000000L): String = {
    val pre =
      s"""nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |seedn AS (SELECT DISTINCT node FROM seeds WHERE node IN (SELECT node FROM nodes)),
         |scnt AS (SELECT count(*) AS n FROM seedn),
         |odeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |it0 AS (
         |  SELECT node,
         |         CASE WHEN node IN (SELECT node FROM seedn)
         |              THEN CAST($scale AS BIGINT) // (SELECT n FROM scnt)
         |              ELSE 0 END AS r
         |  FROM nodes)"""
    val steps = (1 to iters).map { i =>
      val p = s"it${i - 1}"
      s"""d$i AS (SELECT node, r * 85 // 100 AS d FROM $p),
         |dang$i AS (
         |  SELECT coalesce(sum(d), 0) // (SELECT n FROM scnt) AS dshare
         |  FROM d$i WHERE node NOT IN (SELECT src FROM odeg)),
         |inc$i AS (
         |  SELECT e.dst AS node, sum(dd.d // o.outdeg) AS inc
         |  FROM edges e JOIN odeg o ON o.src = e.src JOIN d$i dd ON dd.node = e.src
         |  GROUP BY e.dst),
         |it$i AS (
         |  SELECT n.node,
         |         CAST(CASE WHEN n.node IN (SELECT node FROM seedn)
         |              THEN ($scale * 15 // 100) // (SELECT n FROM scnt)
         |                   + (SELECT dshare FROM dang$i)
         |              ELSE 0 END + coalesce(i.inc, 0) AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN inc$i i USING (node))"""
    }
    (Seq(pre) ++ steps).mkString(",\n")
  }

  /** The DuckDB replay of [[pageRank]]: unrolled iteration CTEs over
    * WITH-scope relations `edges` (src, dst — already multi-edge-
    * collapsed and self-loop-free) — emitted from the SAME constants
    * so the two engines cannot drift. The caller closes the query
    * over the final `it<iters>` relation. */
  def pageRankSql(iters: Int, scale: Long = 1000000000000L): String = {
    val pre =
      s"""nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |ncnt AS (SELECT count(*) AS n FROM nodes),
         |odeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |it0 AS (SELECT node, CAST($scale AS BIGINT) // (SELECT n FROM ncnt) AS r FROM nodes)"""
    val steps = (1 to iters).map { i =>
      val p = s"it${i - 1}"
      s"""d$i AS (SELECT node, r * 85 // 100 AS d FROM $p),
         |dang$i AS (
         |  SELECT coalesce(sum(d), 0) // (SELECT n FROM ncnt) AS dshare
         |  FROM d$i WHERE node NOT IN (SELECT src FROM odeg)),
         |inc$i AS (
         |  SELECT e.dst AS node, sum(dd.d // o.outdeg) AS inc
         |  FROM edges e JOIN odeg o ON o.src = e.src JOIN d$i dd ON dd.node = e.src
         |  GROUP BY e.dst),
         |it$i AS (
         |  SELECT n.node,
         |         CAST(($scale * 15 // 100) // (SELECT n FROM ncnt)
         |           + (SELECT dshare FROM dang$i) + coalesce(i.inc, 0) AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN inc$i i USING (node))"""
    }
    (Seq(pre) ++ steps).mkString(",\n")
  }
}
