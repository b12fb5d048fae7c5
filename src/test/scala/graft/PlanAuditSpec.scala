package graft

/** Codifies the plan invariants the round driver audits externally:
  * no query's physical plan may contain a cartesian product or a
  * sort-merge join (every intentional join is broadcast, shuffled
  * hash, or a WindowGroupLimit/native-plan form — a sort-merge
  * appearing means a hint or size estimate regressed). Plans are
  * resolved against sf0.001; `sparkPlan` forces physical planning
  * without executing the query, though some query FUNCTIONS do eager
  * work on invocation (localCheckpoint pins, index builds, ML fits) —
  * that cost is accepted here, except the full-DAG q_e1_pipeline.
  *
  * BroadcastNestedLoopJoin is NOT banned: the documented 1-row
  * crossJoin(broadcast(...)) stat-attach sites (Profile, KeywordSearch)
  * legitimately plan as one. CartesianProduct — the unbroadcast,
  * all-pairs form — is what must never appear.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val banned = Seq("CartesianProduct", "SortMergeJoin")
  // executes the whole 5-stage pipeline DAG on invocation; its stages
  // are plan-audited via the queries they compose (merge/window/ML)
  private val skip = Set("q_e1_pipeline")

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot { case (name, _) => skip(name) }
    .foreach { case (name, fn) =>
      test(s"$name: no cartesian product, no sort-merge join") {
        val plan = fn(spark, dir).queryExecution.sparkPlan.toString
        banned.foreach(b =>
          assert(!plan.contains(b), s"$b found in $name's physical plan"))
      }
    }

  test("committed PLAN_AUDIT.txt covers exactly the registered queries (no stale dump)") {
    // the round-close evidence gate: registering a query without
    // regenerating the committed shuffle/pushdown dump fails the suite,
    // so the detailed audit (runMain graft.PlanAudit > PLAN_AUDIT.txt)
    // can never silently go stale again
    val dump = java.nio.file.Paths.get("PLAN_AUDIT.txt")
    assert(java.nio.file.Files.exists(dump), "PLAN_AUDIT.txt missing — run graft.PlanAudit")
    val dumped = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(dump)).asScala
      .filter(_.startsWith("q_")).map(_.split("\\s+")(0)).toSet
    val registered = SparkEntry.queries.keySet
    val missing = registered -- dumped
    val stale = dumped -- registered
    assert(missing.isEmpty && stale.isEmpty,
      s"PLAN_AUDIT.txt is stale — regenerate with 'sbt \"runMain graft.PlanAudit\" > PLAN_AUDIT.txt'. " +
        s"Missing from dump: ${missing.toSeq.sorted.mkString(",")}; " +
        s"no longer registered: ${stale.toSeq.sorted.mkString(",")}")
    assert(dumped.nonEmpty && scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(dump)).asScala.exists(_.startsWith("AUDIT FLAGS: 0")),
      "PLAN_AUDIT.txt must end with AUDIT FLAGS: 0")
  }
}
