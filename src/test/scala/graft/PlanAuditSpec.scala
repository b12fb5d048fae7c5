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
}
