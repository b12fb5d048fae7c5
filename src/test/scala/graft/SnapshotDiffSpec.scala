package graft

import graft.operators.SnapshotDiff
import org.apache.spark.sql.DataFrame

/** SnapshotDiff: classification completeness, null-safe change
  * detection, sorted changed_cols, and the diff↔merge round trip
  * (applying the recovered delta reproduces the new snapshot).
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Int, Option[String], Option[Double])]): DataFrame =
    rows.toDF("k", "a", "b")

  private def diffMap(old: DataFrame, nw: DataFrame): Map[Int, (String, Seq[String])] =
    SnapshotDiff.diff(old, nw, Seq("k"))
      .as[(Int, String, Seq[String])].collect()
      .map { case (k, c, cc) => k -> (c, cc) }.toMap

  test("added / removed / changed / unchanged classified correctly") {
    val old = df(Seq((1, Some("x"), Some(1.0)), (2, Some("y"), Some(2.0)),
      (3, Some("z"), Some(3.0))))
    val nw = df(Seq((2, Some("y"), Some(2.0)), (3, Some("z"), Some(30.0)),
      (4, Some("w"), Some(4.0))))
    val d = diffMap(old, nw)
    assert(d === Map(
      1 -> ("removed", Seq.empty),
      3 -> ("changed", Seq("b")),
      4 -> ("added", Seq.empty)))
  }

  test("null-safe compare: null->value and value->null change; null->null does not") {
    val old = df(Seq((1, None, Some(1.0)), (2, Some("y"), None), (3, None, None)))
    val nw = df(Seq((1, Some("x"), Some(1.0)), (2, None, None), (3, None, None)))
    val d = diffMap(old, nw)
    assert(d === Map(1 -> ("changed", Seq("a")), 2 -> ("changed", Seq("a"))))
  }

  test("changed_cols lists every differing column in sorted name order") {
    val old = df(Seq((1, Some("x"), Some(1.0))))
    val nw = df(Seq((1, Some("y"), Some(9.0))))
    assert(diffMap(old, nw) === Map(1 -> ("changed", Seq("a", "b"))))
  }

  test("diff then merge round trip reproduces the new snapshot (property, seed 7)") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      def snap() = df(Seq.tabulate(rng.nextInt(20) + 5)(i =>
        (i, if (rng.nextBoolean()) Some("abc"(rng.nextInt(3)).toString) else None,
          Some(rng.nextInt(5).toDouble)))
        .filter(_ => rng.nextInt(10) < 8))
      val old = snap(); val nw = snap()
      val delta = SnapshotDiff.diff(old, nw, Seq("k")).cache()
      val removed = delta.filter($"change" === "removed").select("k")
      val upserts = nw.join(
        delta.filter($"change" =!= "removed").select("k"), Seq("k"), "left_semi")
      val rebuilt = graft.operators.Merge.upsert(
        old.join(removed, Seq("k"), "left_anti"), upserts, Seq("k"))
      assert(rebuilt.as[(Int, Option[String], Option[Double])].collect().toSet ===
        nw.as[(Int, Option[String], Option[Double])].collect().toSet)
    }
  }

  test("a column added in the new snapshot surfaces as changed rows, not silence") {
    val old = Seq((1, "x"), (2, "y")).toDF("k", "a")
    val nw = Seq((1, "x", Some(5.0)), (2, "y", None)).toDF("k", "a", "status")
    val d = diffMap(old, nw)
    // row 1 gained a populated status → changed on exactly that column;
    // row 2's status is NULL on both effective sides → unchanged
    assert(d === Map(1 -> ("changed", Seq("status"))))
    // symmetric: a dropped-and-populated column reports as changed too
    assert(diffMap(nw, old) === Map(1 -> ("changed", Seq("status"))))
  }

  test("key-only snapshots diff on presence alone") {
    val old = Seq(1, 2, 3).toDF("k")
    val nw = Seq(2, 3, 4).toDF("k")
    val d = diffMap(old, nw)
    assert(d === Map(1 -> ("removed", Seq.empty), 4 -> ("added", Seq.empty)))
  }
}
