package graft

import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items aggregate: exactness below capacity,
  * never-overcount + bounded undercount + heavy-hitter presence under
  * pressure (capacity << vocabulary), and merge across partitionings.
  */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], cap: Int, parts: Int = 4): Map[String, Long] =
    items.toDF("item").repartition(parts)
      .agg(call_function("graft_freq_items", col("item"), lit(cap)).as("xs"))
      .select(explode(col("xs")).as("x"))
      .select($"x.item", $"x.est").as[(String, Long)]
      .collect().toMap

  test("exact when distinct items fit the capacity") {
    val items = (1 to 50).flatMap(i => Seq.fill(i)(s"w$i"))
    val got = sketch(items, cap = 64)
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === truth)
  }

  test("under pressure: never overcounts, undercount bounded, heavy hitters present") {
    // 500 distinct light items (1 each) + 5 heavy items (200 each), cap 32
    val light = (1 to 500).map(i => s"light$i")
    val heavy = (1 to 5).flatMap(i => Seq.fill(200)(s"heavy$i"))
    val items = new scala.util.Random(7).shuffle((light ++ heavy).toVector) // deterministic shuffle
    val n = items.size.toLong
    val cap = 32
    val got = sketch(items, cap)
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.size <= cap)
    got.foreach { case (k, est) =>
      assert(est <= truth(k), s"$k overcounted: $est > ${truth(k)}")
      assert(truth(k) - est <= n / (cap + 1) + 1,
        s"$k undercount ${truth(k) - est} exceeds N/(cap+1)=${n / (cap + 1)}")
    }
    // every item with true count > N/(cap+1) must be present
    val bound = n / (cap + 1)
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(got.contains(k), s"heavy hitter $k (n=${truth(k)}, bound=$bound) missing")
    }
  }

  test("merge is layout-independent for the guarantee (not the estimates)") {
    val heavy = (1 to 3).flatMap(i => Seq.fill(100)(s"h$i"))
    val light = (1 to 200).map(i => s"l$i")
    val items = new scala.util.Random(11).shuffle((light ++ heavy).toVector)
    for (parts <- Seq(1, 3, 13)) {
      val got = sketch(items, cap = 16, parts = parts)
      (1 to 3).foreach(i => assert(got.contains(s"h$i"), s"h$i missing at parts=$parts"))
    }
  }
}
