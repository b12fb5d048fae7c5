package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted aggregation/join equivalence on a deliberately skewed
  * fixture (one key holds ~90% of rows).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    val rng = new scala.util.Random(3)
    val hot = Seq.fill(900)(("hot", rng.nextInt(100) / 10.0))
    val cold = Seq.fill(100)((s"k${rng.nextInt(20)}", rng.nextInt(100) / 10.0))
    (hot ++ cold).toDF("k", "v")
  }

  test("saltedAggregate ≡ plain groupBy sum/count") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .as[(String, Double, Long)].collect().map(r => (r._1, math.rint(r._2 * 100), r._3)).toSet
    val salted = Skew.saltedAggregate(skewed, Seq("k"), "v")
      .as[(String, Double, Long)].collect().map(r => (r._1, math.rint(r._2 * 100), r._3)).toSet
    assert(salted === plain)
  }

  test("saltedJoin ≡ plain join on skewed keys") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n")).as[(String, String, Long)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n")).as[(String, String, Long)].collect().toSet
    assert(salted === plain)
  }

  test("saltedJoin rejects join types the replication scheme can't honor") {
    val dim = Seq(("hot", "H")).toDF("k", "label")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, Seq("k"), joinType = "full")
    }
    assert(e.getMessage.contains("inner/left"))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, Seq("k"), joinType = "right")
    }
  }

  test("salt actually spreads the hot key across buckets") {
    val withSalt = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col): _*), lit(16)))
    val buckets = withSalt.filter($"k" === "hot")
      .select("__salt").distinct().count()
    assert(buckets >= 8, s"hot key landed in only $buckets/16 buckets")
  }

  /** Aggressive AQE skew configs used by the census-join-back cases. */
  private def withSkewConfigs[T](body: => T): T = {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Viral-boilerplate corpus: every doc opens with the same 8 tokens
    * (ONE hot shingle hash across the whole corpus) then unique text. */
  private def hotShingleDocs(n: Int) =
    spark.range(n).select($"id".as("doc_id"),
      concat(lit("alpha beta gamma delta epsilon zeta eta theta "),
        md5(concat(lit("u"), $"id")), lit(" "),
        md5(concat(lit("v"), $"id")), lit(" "),
        md5(concat(lit("w"), $"id"))).as("text"))

  test("census join-back: AQE skew-split provably does NOT engage (the motivation)") {
    // The dedup censuses join back onto their own exploded source. The
    // census side of that join is an AGGREGATE above its shuffle stage,
    // and OptimizeSkewedJoin only matches joins whose children are bare
    // shuffle stages — so unlike the plain join above, AQE never splits
    // the viral shingle's partition here. This test pins that fact; it
    // is why Skew.censusJoinBack exists rather than trusting AQE.
    import graft.operators.Dedup
    withSkewConfigs {
      val wins = hotShingleDocs(3000)
        .select($"doc_id", explode(split($"text", " ")).as("tok"))
        .withColumn("h", conv(substring(md5($"tok"), 1, 15), 16, 10).cast("long"))
      val census = wins.groupBy("h").agg(count_distinct($"doc_id").as("nd"))
      val plain = wins.join(census.hint("shuffle_hash"), Seq("h"))
        .groupBy("doc_id").agg(sum(when($"nd" > 1, 1L).otherwise(0L)).as("n_dup"))
      assert(plain.collect().length === 3000)
      val plan = plain.queryExecution.executedPlan.toString
      assert(!plan.contains("skew=true"),
        "AQE now splits agg-fed joins — censusJoinBack's motivation needs re-checking:\n" +
          plan.take(1500))
    }
  }

  test("censusJoinBack: hot keys resolve map-side; result identical to the plain join") {
    import graft.operators.{Dedup, Skew}
    withSkewConfigs {
      val docs = hotShingleDocs(500)
      // hotThreshold 100: the shared 8-gram (nd=500) goes hot; organic
      // windows (nd=1) stay cold. A huge threshold is the all-cold
      // plain path — outputs must be bit-identical.
      val hot = Dedup.dupSpans(docs, window = 8, hotThreshold = 100)
      val cold = Dedup.dupSpans(docs, window = 8, hotThreshold = Int.MaxValue)
      val h = hot.as[(Long, Long, Long, Double, Long)].collect().toSet
      val c = cold.as[(Long, Long, Long, Double, Long)].collect().toSet
      assert(h === c, "heavy-hitter path changed the dupSpans result")
      // every doc shares the viral 8-gram: its window is flagged dup
      assert(h.forall(_._3 >= 1L), "viral shingle must be flagged in every doc")
      // the hot branch is a real broadcast resolution in the final plan
      hot.collect()
      val plan = hot.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected a map-side hot-key resolution:\n${plan.take(1200)}")
    }
  }

  test("censusJoinBack: boilerplateStrip equivalence under a hot threshold") {
    import graft.operators.Dedup
    val docs = hotShingleDocs(200).withColumn("source", lit("siteA"))
    val hot = Dedup.boilerplateStrip(docs, hotThreshold = 50)
      .as[(Long, Long, Long, String)].collect().toSet
    val cold = Dedup.boilerplateStrip(docs, hotThreshold = Int.MaxValue)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(hot === cold, "heavy-hitter path changed the boilerplateStrip result")
    // the shared opener recurs in all 200 docs of the source → stripped
    assert(hot.forall(_._3 >= 1L))
  }

  test("AQE splits the skewed partition of a shuffle join (runtime re-plan)") {
    // Salting (above) is the manual fix; AQE's OptimizeSkewedJoin is
    // the runtime one — the hot partition is split into advisory-sized
    // slices and the other side's partition replicated, no code change.
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // payload must be row-dependent (a constant would fold to after
      // the join) and incompressible, so the hot shuffle partition has
      // real bytes behind it
      val big = spark.range(20000)
        .select(when($"id" < 19000, "hot").otherwise(concat(lit("k"), $"id" % 50)).as("k"),
          md5(concat(lit("payload"), $"id")).as("payload"))
      val dim = (Seq("hot") ++ (0 until 50).map("k" + _)).toDF("k")
        .withColumn("tag", lit(1))
      val joined = big.join(dim, "k")
      // execute THIS DataFrame's QueryExecution (count() would build a
      // fresh one and leave this AQE plan unfinalized)
      assert(joined.collect().length === 20000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"expected a skew-split shuffle read in the final AQE plan:\n${plan.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
