package graft

import graft.operators.KeywordSearch

/** BM25 ranking sanity: term saturation, length normalization, rare-term
  * weighting, and layout independence of the folded double score.
  */
class KeywordSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark engine spark engine spark engine"),      // tf-heavy, short
    (2L, "spark engine"),                                // both terms, once
    (3L, "spark " + Seq.fill(60)("filler").mkString(" ")), // one term, long doc
    (4L, "engine"),                                      // rare-ish term only
    (5L, "nothing relevant here at all"),
    (6L, "completely off topic words only")
  ).toDF("doc_id", "text")

  test("ranks docs containing more query terms above partial matches") {
    val got = KeywordSearch.bm25TopK(docs, Seq("spark", "engine"), k = 10)
      .as[(Long, Double)].collect()
    val rank = got.map(_._1).toSeq
    assert(!rank.contains(5L) && !rank.contains(6L), "non-matching docs never score")
    // both-term docs beat single-term docs
    val pos = rank.zipWithIndex.toMap
    assert(pos(1L) < pos(3L) && pos(2L) < pos(3L))
    assert(pos(1L) < pos(4L) && pos(2L) < pos(4L))
    // repeated terms help (saturating, but monotone)
    assert(pos(1L) < pos(2L))
  }

  test("length normalization: same tf in a longer doc scores lower") {
    val pair = Seq(
      (1L, "spark alpha beta"),
      (2L, "spark " + Seq.fill(40)("pad").mkString(" "))).toDF("doc_id", "text")
    val got = KeywordSearch.bm25TopK(pair, Seq("spark"), k = 2)
      .as[(Long, Double)].collect().toMap
    assert(got(1L) > got(2L))
  }

  test("persisted inverted index: identical results, term-bucket-pruned scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25idx").toString
    KeywordSearch.buildInvertedIndex(docs, dir, termBuckets = 16)
    assert(new java.io.File(s"$dir/postings").listFiles().exists(_.getName.startsWith("tb=")))

    val direct = KeywordSearch.bm25TopK(docs, Seq("spark", "engine"), 10)
      .as[(Long, Double)].collect().toSeq
    val indexed = KeywordSearch.bm25TopKIndexed(spark, dir, Seq("spark", "engine"), 10)
      .as[(Long, Double)].collect().toSeq
    assert(indexed === direct, "index path must reproduce the direct scores exactly")

    // the probe's scan is partition-pruned to the query terms' buckets:
    // the same tb filter the index path applies touches a strict
    // subset of the posting files
    val tb = org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.lit("spark")),
      org.apache.spark.sql.functions.lit(16L))
    val sparkTb = docs.sparkSession.range(1).select(tb.cast("int")).as[Int].head()
    val pruned = spark.read.parquet(s"$dir/postings")
      .filter($"tb" === sparkTb).inputFiles.length
    val all = spark.read.parquet(s"$dir/postings").inputFiles.length
    assert(pruned < all, "single-term probe must touch a strict subset of posting partitions")
  }

  test("scores are independent of partition layout") {
    val a = KeywordSearch.bm25TopK(docs.repartition(1), Seq("spark", "engine"), 10)
      .as[(Long, Double)].collect().toSeq
    val b = KeywordSearch.bm25TopK(docs.repartition(7), Seq("spark", "engine"), 10)
      .as[(Long, Double)].collect().toSeq
    assert(a === b, "folded score must be byte-stable under any partitioning")
  }
}
