package graft

import graft.operators.SetSimilarityJoin
import org.apache.spark.sql.functions._

/** Prefix-filtered exact Jaccard self-join: completeness vs brute
  * force (the prefix filter may never lose a qualifying pair),
  * exactness of reported similarities, and layout independence.
  */
class SetSimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Random token sets with planted near-duplicates. */
  private lazy val sets: Seq[(Long, Seq[String])] = {
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 120).map(i => s"tok$i")
    val base = (1L to 40L).map { id =>
      id -> rnd.shuffle(vocab).take(8 + rnd.nextInt(10)).toSeq
    }
    // plant near-dups: copy of id with one token swapped
    val dups = (1L to 10L).map { id =>
      val orig = base(id.toInt - 1)._2
      (100L + id) -> (orig.tail :+ "tok999")
    }
    base ++ dups
  }

  private def brute(theta: Double): Set[(Long, Long)] = (for {
    (i1, s1) <- sets; (i2, s2) <- sets if i1 < i2
    inter = s1.toSet.intersect(s2.toSet).size
    uni = s1.toSet.union(s2.toSet).size
    if inter.toDouble / uni >= theta
  } yield (i1, i2)).toSet

  test("finds exactly the brute-force pairs at several thresholds") {
    val df = sets.toDF("id", "s").withColumn("s", array_distinct(col("s")))
    for (theta <- Seq(0.5, 0.7, 0.9)) {
      val got = SetSimilarityJoin.selfJoin(df, "id", "s", theta)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(got === brute(theta), s"theta=$theta")
    }
  }

  test("reported jaccard values are exact") {
    val df = sets.toDF("id", "s").withColumn("s", array_distinct(col("s")))
    val got = SetSimilarityJoin.selfJoin(df, "id", "s", 0.7)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty, "planted near-dups must qualify at 0.7")
    val byId = sets.toMap
    got.foreach { case (i1, i2, j) =>
      val s1 = byId(i1).toSet; val s2 = byId(i2).toSet
      val expect = s1.intersect(s2).size.toDouble / s1.union(s2).size
      // the operator rounds to 6 decimals by contract
      assert(math.abs(j - expect) <= 5e-7, s"($i1,$i2): $j vs $expect")
    }
  }

  test("layout-independent") {
    val df = sets.toDF("id", "s").withColumn("s", array_distinct(col("s")))
    val a = SetSimilarityJoin.selfJoin(df.repartition(2), "id", "s", 0.7)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val b = SetSimilarityJoin.selfJoin(df.repartition(17), "id", "s", 0.7)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(a === b)
  }
}
