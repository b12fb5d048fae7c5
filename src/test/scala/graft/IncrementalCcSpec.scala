package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame

/** Incremental connected-component state: merging batches of near-dup
  * pairs into the persisted (doc_id, group_id) table must equal a full
  * [[Dedup.connectedComponents]] recompute over the union of every
  * batch — the same incremental ≡ rebuild contract the persisted
  * inverted index carries (KeywordSearchSpec).
  */
class IncrementalCcSpec extends SparkSpec {
  import spark.implicits._

  private def pairsDf(ps: (Long, Long)*): DataFrame = ps.toDF("doc_a", "doc_b")

  private def stateDir() =
    java.nio.file.Files.createTempDirectory("graft-ccstate").toString + "/cc"

  private def readSorted(dir: String): Seq[(Long, Long)] =
    Dedup.readComponentState(spark, dir).as[(Long, Long)].collect().toSeq.sorted

  private def fullCc(ps: (Long, Long)*): Seq[(Long, Long)] =
    Dedup.connectedComponents(pairsDf(ps: _*)).as[(Long, Long)].collect().toSeq.sorted

  test("merge across appends ≡ full recompute (bridge, re-root, chain growth)") {
    val dir = stateDir()
    // batch 1: two separate groups {5,6} and {9,10}
    val b1 = Seq((5L, 6L), (9L, 10L))
    // batch 2: bridge them via a corpus-corpus edge, plus a fresh pair
    val b2 = Seq((6L, 9L), (20L, 21L))
    // batch 3: a NEW doc with a SMALLER id joins the merged group —
    // every old member must relabel to 1 — and the chain grows
    val b3 = Seq((1L, 10L), (21L, 22L), (22L, 23L))
    Dedup.buildComponentState(pairsDf(b1: _*), dir, stateBuckets = 8)
    assert(readSorted(dir) === fullCc(b1: _*))
    Dedup.mergeComponentState(pairsDf(b2: _*), dir)
    assert(readSorted(dir) === fullCc(b1 ++ b2: _*))
    Dedup.mergeComponentState(pairsDf(b3: _*), dir)
    assert(readSorted(dir) === fullCc(b1 ++ b2 ++ b3: _*))
    // group ids keep the min-doc-id convention after every merge
    val byGroup = readSorted(dir).groupBy(_._2)
    byGroup.foreach { case (g, members) =>
      assert(g === members.map(_._1).min, s"group $g is not its members' min id")
    }
  }

  test("replayed merge is a no-op; merge of already-connected edges changes nothing") {
    val dir = stateDir()
    Dedup.buildComponentState(pairsDf((2L, 3L), (7L, 8L)), dir, stateBuckets = 8)
    Dedup.mergeComponentState(pairsDf((3L, 7L)), dir)
    val after = readSorted(dir)
    Dedup.mergeComponentState(pairsDf((3L, 7L)), dir) // exact replay
    assert(readSorted(dir) === after, "replayed merge must be a no-op")
    Dedup.mergeComponentState(pairsDf((2L, 8L)), dir) // already same group
    assert(readSorted(dir) === after, "intra-group edge must change nothing")
  }

  test("state is gb=bucket partitioned; a merge rewrites only affected buckets") {
    val dir = stateDir()
    // many small independent groups spread across buckets
    val b1 = (0L until 40L by 2L).map(i => (i, i + 1L))
    Dedup.buildComponentState(pairsDf(b1: _*), dir, stateBuckets = 16)
    val root = new java.io.File(s"$dir/components")
    val bucketDirs = root.listFiles().filter(_.getName.startsWith("gb=")).map(_.getName)
    assert(bucketDirs.length > 1, "fixture must span several buckets")
    def mtimes: Map[String, Long] = root.listFiles()
      .filter(_.getName.startsWith("gb="))
      .map(d => d.getName -> d.listFiles().map(_.lastModified).max).toMap
    val before = mtimes
    Thread.sleep(1100) // FS mtime granularity
    Dedup.mergeComponentState(pairsDf((0L, 2L)), dir) // touches groups 0 and 2 only
    val after = mtimes
    val changed = after.filter { case (k, v) => before.get(k).forall(_ != v) }.keySet ++
      (after.keySet -- before.keySet) ++ (before.keySet -- after.keySet)
    // groups 0 and 2 live in at most 2 buckets pre-merge and 1 after;
    // every other bucket's files must be untouched
    assert(changed.size <= 3, s"merge rewrote unaffected buckets: $changed")
    assert(readSorted(dir) === fullCc(b1 :+ (0L, 2L): _*))
  }

  test("a bucket fully emptied by its groups relabeling away holds no stale rows") {
    val dir = stateDir()
    // one group only: whichever bucket holds it must be REPLACED (not
    // dynamically skipped) when the group re-roots into another bucket
    Dedup.buildComponentState(pairsDf((50L, 51L)), dir, stateBuckets = 64)
    // re-root: a new smaller id relabels {50,51} → group 1, which with
    // 64 buckets lands in a different gb partition than group 50
    Dedup.mergeComponentState(pairsDf((1L, 50L)), dir)
    val rows = readSorted(dir)
    assert(rows === Seq((1L, 1L), (50L, 1L), (51L, 1L)),
      s"stale pre-relabel rows survived: $rows")
  }

  test("state compaction: files collapse, rows identical, merges still correct after") {
    val dir = stateDir()
    val b1 = (0L until 24L by 2L).map(i => (i, i + 1L))
    Dedup.buildComponentState(pairsDf(b1: _*), dir, stateBuckets = 4)
    // several merges accrete files into the touched buckets
    Dedup.mergeComponentState(pairsDf((0L, 2L)), dir)
    Dedup.mergeComponentState(pairsDf((4L, 6L)), dir)
    Dedup.mergeComponentState(pairsDf((8L, 10L)), dir)
    val before = readSorted(dir)
    def files: Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$dir/components"))
    }
    val nBefore = files
    Dedup.compactComponentState(spark, dir)
    assert(files < nBefore, s"compaction did not reduce files ($nBefore)")
    assert(readSorted(dir) === before, "compaction changed state rows")
    // layout preserved and merges keep working on the compacted state
    assert(new java.io.File(s"$dir/components").listFiles()
      .exists(_.getName.startsWith("gb=")), "compaction must keep the gb= layout")
    Dedup.mergeComponentState(pairsDf((12L, 14L)), dir)
    assert(readSorted(dir) ===
      fullCc(b1 ++ Seq((0L, 2L), (4L, 6L), (8L, 10L), (12L, 14L)): _*))
    intercept[IllegalArgumentException] {
      Dedup.compactComponentState(spark,
        java.nio.file.Files.createTempDirectory("graft-notcc").toString)
    }
  }

  test("unbuilt state fails loudly; meta pins the bucket count") {
    val dir = stateDir()
    intercept[IllegalArgumentException] { Dedup.readComponentState(spark, dir) }
    intercept[IllegalArgumentException] {
      Dedup.mergeComponentState(pairsDf((1L, 2L)), dir)
    }
    Dedup.buildComponentState(pairsDf((1L, 2L)), dir, stateBuckets = 8)
    val meta = graft.sources.IndexMeta.read(spark, s"$dir/meta.json", "component state")
    assert(meta("stateBuckets") === 8L)
  }

  test("interrupted promote: read fails loudly, the next merge heals") {
    val dir = stateDir()
    Dedup.buildComponentState(pairsDf((30L, 31L), (40L, 41L)), dir, stateBuckets = 8)
    val healthy = readSorted(dir)
    // simulate a crash mid-promote: one bucket renamed aside, promote
    // of the staged replacement never happened
    val root = new java.io.File(s"$dir/components")
    val bucket = root.listFiles().filter(_.getName.startsWith("gb=")).head
    val aside = new java.io.File(root, bucket.getName + "__old")
    assert(bucket.renameTo(aside), "fixture rename failed")
    // the READ path must not mutate a directory a live merge may own —
    // it reports the unhealed state loudly instead of silently
    // returning a state missing that bucket's groups
    val e = intercept[IllegalArgumentException] { readSorted(dir) }
    assert(e.getMessage.contains("interrupted merge"), e.getMessage)
    assert(new java.io.File(root, aside.getName).exists(),
      "read must not have touched the aside bucket")
    // recovery belongs to the single writer: any merge heals it (an
    // empty edge batch is the minimal retry)
    Dedup.mergeComponentState(Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), dir)
    assert(readSorted(dir) === healthy, "merge-entry recovery must restore the aside bucket")
  }
}
