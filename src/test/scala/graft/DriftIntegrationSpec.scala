package graft

/** End-to-end proof that query RESULTS are testdata-vintage-invariant:
  * rewrite a copy of sf0.001 with every value-preserving physical drift
  * the conform layer claims to absorb ([[DriftFixture]]), run real
  * registered queries against both directories, and diff collected
  * rows. This is the integration companion to TablesSpec's unit pins —
  * it would catch a future query that bypasses the [[Tables]]
  * chokepoint or hardcodes a physical type. The fast cross-section
  * here runs untagged; the registry-wide sweep is [[DriftSweepSpec]]
  * (tagged [[SlowSweep]]).
  */
class DriftIntegrationSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private lazy val driftDir: String = DriftFixture.drifted(spark, src)

  // A cross-section of the registry: lineitem agg, date surface, events
  // windows/sessions, dim joins, merges-free ORDER-stable outputs only.
  private val queries = Seq(
    "q_agg_summary", "q_dates", "q_sessionize", "q_join_enrich",
    "q_latest_events", "q_time_slice", "q_market_behavior",
    "q_w_lineitem_supplier", "q_asof_lookup", "q_text_stats",
    "q_dedup_exact")

  queries.foreach { q =>
    test(s"$q returns identical rows on the drifted vintage") {
      val fn = SparkEntry.queries(q)
      val base = fn(spark, src).collect().toSeq
      val drift = fn(spark, driftDir).collect().toSeq
      assert(base.nonEmpty, s"$q returned nothing on the base dir")
      assert(drift === base)
    }
  }
}
