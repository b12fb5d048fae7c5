package graft

import graft.operators.Sharding
import org.apache.spark.sql.functions._

/** Deterministic shard planning: budget adherence, the `buckets` knob
  * actually coarsening the two-phase cumsum without changing results,
  * and partition-layout independence.
  */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  // sizes 50..149, ~10k rows → total ~1M units
  private lazy val docs = (1L to 10000L)
    .map(i => (i, 50L + (i * 31) % 100))
    .toDF("doc_id", "sz")

  test("assign spreads rows across exactly nShards hash shards") {
    val out = Sharding.assign(docs, "doc_id", nShards = 8)
    val counts = out.groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(counts.keySet === (0 until 8).toSet)
    // hash spread: no shard is off the uniform share by more than 25%
    counts.values.foreach(n => assert(math.abs(n - 1250.0) / 1250.0 < 0.25))
  }

  test("sizeBudgeted packs consecutive md5-ordered docs up to the target") {
    val target = 50000L
    val out = Sharding.sizeBudgeted(docs, "doc_id", "sz", target).cache()
    val perShard = out.groupBy("shard").agg(sum("sz").as("total"))
      .as[(Int, Long)].collect().sortBy(_._1)
    // shards are contiguous ids 0..k
    assert(perShard.map(_._1).toSeq === perShard.indices.toSeq)
    // every full shard's total is within one max-doc-size of the
    // budget (the boundary doc belongs to the shard it starts in, so a
    // shard can start past its bin edge or run past it by < one doc);
    // only the last may run short
    perShard.dropRight(1).foreach { case (_, total) =>
      assert(math.abs(total - target) < 149,
        s"shard total $total more than one doc off $target")
    }
    // a doc's shard is the budget bin its cumulative start falls in:
    // re-derive with a single global window and compare exactly
    val global = docs
      .withColumn("__h", md5($"doc_id".cast("string")))
      .withColumn("before",
        coalesce(sum($"sz").over(org.apache.spark.sql.expressions.Window
          .orderBy($"__h", $"sz").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("shard_g", ($"before" / target).cast("int"))
      .select($"doc_id", $"shard_g")
    val diff = out.join(global, "doc_id")
      .filter($"shard" =!= $"shard_g").count()
    assert(diff === 0, "two-phase cumsum must equal the global window")
  }

  test("buckets knob changes parallelism, never assignments") {
    val a = Sharding.sizeBudgeted(docs, "doc_id", "sz", 50000L, buckets = 4)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    val b = Sharding.sizeBudgeted(docs, "doc_id", "sz", 50000L, buckets = 256)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(a === b)
    // and buckets=4 really coarsens: exactly 4 distinct internal buckets
    val withB = docs.withColumn("__b",
      floor(conv(substring(md5($"doc_id".cast("string")), 1, 2), 16, 10).cast("int") * 4 / 256)
        .cast("int"))
    assert(withB.select("__b").distinct().count() === 4)
  }

  test("same-key same-size rows order by full-row fingerprint, layout-independent") {
    // two rows per key share (doc_id, sz) — identical md5 order key and
    // size — but differ in payload; without the fingerprint tiebreak
    // their relative order (hence a boundary-straddling shard split)
    // could swap between runs
    val dup = (1L to 500L).flatMap(i => Seq((i, 100L, s"a$i"), (i, 100L, s"b$i")))
      .toDF("doc_id", "sz", "payload")
    val a = Sharding.sizeBudgeted(dup.repartition(3), "doc_id", "sz", 5000L)
      .select("payload", "shard").as[(String, Int)].collect().toMap
    val b = Sharding.sizeBudgeted(dup.repartition(17), "doc_id", "sz", 5000L)
      .select("payload", "shard").as[(String, Int)].collect().toMap
    assert(a === b)
  }

  test("shard assignment is independent of partition layout") {
    val a = Sharding.sizeBudgeted(docs.repartition(3), "doc_id", "sz", 50000L)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    val b = Sharding.sizeBudgeted(docs.repartition(23), "doc_id", "sz", 50000L)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(a === b)
  }
}
