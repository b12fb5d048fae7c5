package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Next-fit sequence packing: capacity invariant, next-fit semantics,
  * oversized-doc handling, shard-boundary state reset, and layout
  * independence of the streaming fold.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("bin totals respect capacity except single oversized docs") {
    val rnd = new scala.util.Random(5)
    val docs = (1L to 500L).map(id => (id, 50L + rnd.nextInt(400))).toDF("id", "sz")
    val out = Packing.nextFitPack(docs, "id", "sz", shards = 4, capacity = 1000L)
    val bins = out.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("total"), count(lit(1)).as("ndocs")).collect()
    bins.foreach { r =>
      val total = r.getLong(2); val ndocs = r.getLong(3)
      assert(total <= 1000L || ndocs == 1L,
        s"bin over capacity with $ndocs docs: $total")
    }
  }

  test("next-fit: greedy in id order, bin closes when the next doc misses") {
    val docs = Seq((0L, 400L), (8L, 400L), (16L, 300L), (24L, 100L), (32L, 2000L), (40L, 10L))
      .toDF("id", "sz") // all shard 0 (mod 8)
    val got = Packing.nextFitPack(docs, "id", "sz", shards = 8, capacity = 1000L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    // 400+400 fits; +300 overflows → bin2: 300+100; 2000 alone → bin3; 10 → bin4
    assert(got === Map(0L -> 1L, 8L -> 1L, 16L -> 2L, 24L -> 2L, 32L -> 3L, 40L -> 4L))
  }

  test("shards pack independently and layout does not change assignment") {
    val docs = (1L to 300L).map(id => (id, 100L + id % 7 * 50L)).toDF("id", "sz")
    val a = Packing.nextFitPack(docs.repartition(3), "id", "sz", 5, 700L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    val b = Packing.nextFitPack(docs.repartition(17), "id", "sz", 5, 700L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(a === b)
    // shard isolation: recomputing one shard alone gives the same bins
    val only2 = Packing.nextFitPack(docs.filter($"id" % 5 === 2), "id", "sz", 5, 700L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    only2.foreach { case (id, bin) => assert(a(id) === bin, s"doc $id") }
  }

  test("materialize: bins carry pack-ordered ids, exclusive token offsets, concatenated text") {
    // one shard, capacity 5: ids 1(3 toks) + 2(2 toks) fill bin 1
    // exactly; id 3 opens bin 2
    val docs = Seq((1L, "w x y"), (2L, "p q"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = Packing.materialize(docs, "doc_id", "text", shards = 1, capacity = 5L)
      .orderBy("bin")
      .select("bin", "n_docs", "n_tokens", "doc_ids", "offsets", "text")
      .as[(Long, Long, Long, String, String, String)].collect()
    assert(out === Array(
      (1L, 2L, 5L, "1,2", "0,3", "w x y p q"),
      (2L, 1L, 1L, "3", "0", "z")))
  }
}
