package graft

import graft.operators.Layout
import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order clustering (min/max skipping on every
  * clustered column) and small-files compaction.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Per-file [min,max] of `c` for the parquet table at `path`. */
  private def fileBounds(path: String, c: String): Array[(Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
      .select("lo", "hi").as[(Long, Long)].collect()

  private def overlapping(bounds: Array[(Long, Long)], qLo: Long, qHi: Long): Int =
    bounds.count { case (lo, hi) => hi >= qLo && lo <= qHi }

  test("z-order layout prunes on both columns; lexicographic only on the first") {
    val root = java.nio.file.Files.createTempDirectory("graft-z").toString
    // 256x256 uniform grid
    val grid = spark.range(256L * 256)
      .select(($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"))

    Layout.zorderWrite(grid, Seq("x", "y"), s"$root/zorder", nFiles = 16, bits = 8)
    grid.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.parquet(s"$root/lex")

    // a 1/16-of-domain stripe query on each axis
    val zX = overlapping(fileBounds(s"$root/zorder", "x"), 0, 15)
    val zY = overlapping(fileBounds(s"$root/zorder", "y"), 0, 15)
    val lexX = overlapping(fileBounds(s"$root/lex", "x"), 0, 15)
    val lexY = overlapping(fileBounds(s"$root/lex", "y"), 0, 15)

    // lexicographic: perfect on x, useless on y (every file spans all y)
    assert(lexX <= 2, s"x-sorted layout should prune x stripes, hit $lexX/16")
    assert(lexY === 16, s"x-sorted layout cannot prune y stripes, hit $lexY/16")
    // z-order: prunes BOTH axes (a stripe hits a quadrant's worth of files)
    assert(zX <= 8, s"z-order should prune x stripes, hit $zX/16")
    assert(zY <= 8, s"z-order should prune y stripes, hit $zY/16")

    // the rewrite is a layout change only
    assert(spark.read.parquet(s"$root/zorder").count() === 256L * 256)
    assert(spark.read.parquet(s"$root/zorder")
      .agg(sum($"x" + $"y" * 1000)).head().getLong(0)
      === grid.agg(sum($"x" + $"y" * 1000)).head().getLong(0))
  }

  test("interleave places bit i of column j at position i*d+j") {
    val out = Seq((1L, 0L), (0L, 1L), (3L, 3L))
      .toDF("a", "b")
      .select(Layout.interleave(Seq($"a", $"b"), 2).as("z"))
      .as[Long].collect().toSeq
    // (a=1,b=0) -> 0b01=1; (a=0,b=1) -> 0b10=2; (a=3,b=3) -> 0b1111=15
    assert(out === Seq(1L, 2L, 15L))
  }

  test("compact rewrites many small files into few, preserving content") {
    val root = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val path = s"$root/t"
    val df = spark.range(10000).select($"id", md5($"id".cast("string")).as("h"))
    df.repartition(64).write.parquet(path)
    val before = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before === 64)

    Sinks.compact(spark, path, targetFileBytes = 512L * 1024)
    val after = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after < 8, s"expected few files after compaction, got $after")
    val back = spark.read.parquet(path)
    assert(back.count() === 10000)
    assert(back.agg(sum("id")).head().getLong(0) === (9999L * 10000) / 2)
  }
}
