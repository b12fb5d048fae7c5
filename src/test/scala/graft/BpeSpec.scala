package graft

import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._

/** BPE trainer: hand-computed merge fixtures, greedy left-to-right
  * merge semantics (the replace trick), rank-order encode, and the
  * expression-path ≡ typed-path encode contract.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def learned(texts: String*)(n: Int): Seq[(Int, String, String, Long)] =
    BpeTrainer.learn(spark, docs(texts: _*), n)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("learn reproduces the hand-computed merge sequence") {
    // corpus: "low low low lower" — pair counts round 1:
    // (l,o)=4 (w. 'lower'), (o,w)=4, (w,e)=1, (e,r)=1 -> tie (l,o) vs
    // (o,w) breaks on lhs: 'l' < 'o' -> merge (l,o)
    // round 2: (lo,w)=4 -> merge; round 3: (low,e)=1,(e,r)=1 -> (e,r)
    val m = learned("low low low", "lower")(3)
    assert(m === Seq((1, "l", "o", 4L), (2, "lo", "w", 4L), (3, "e", "r", 1L)))
  }

  test("merges are greedy left-to-right within a word (aaa -> [aa, a])") {
    val enc = BpeTrainer.encode(docs("aaa"), Seq(("a", "a")))
      .select(BpeTrainer.symsOf(col("enc"))).as[Seq[String]].head()
    assert(enc === Seq("aa", "a"))
    // and aaaa -> [aa, aa]: the non-overlapping scan continues AFTER
    // the consumed pair, it does not re-merge the new symbol
    val enc4 = BpeTrainer.encode(docs("aaaa"), Seq(("a", "a")))
      .select(BpeTrainer.symsOf(col("enc"))).as[Seq[String]].head()
    assert(enc4 === Seq("aa", "aa"))
  }

  test("merges never cross word boundaries") {
    // pair (a,b) must not merge across "...a b..." word break
    val enc = BpeTrainer.encode(docs("a b ab"), Seq(("a", "b")))
      .select(col("enc")).as[String].head()
    val d1 = BpeTrainer.D1; val d2 = BpeTrainer.D2
    assert(enc === s"${d1}a$d2 ${d1}b$d2 ${d1}ab$d2")
  }

  test("encode applies merges in rank order") {
    // rules [(a,b), (ab,c)]: "abc" -> [ab, c] -> [abc]
    val enc = BpeTrainer.encode(docs("abc"), Seq(("a", "b"), ("ab", "c")))
      .select(BpeTrainer.symsOf(col("enc"))).as[Seq[String]].head()
    assert(enc === Seq("abc"))
    // reversed rank order never finds (ab,c): "abc" -> [ab, c]
    val rev = BpeTrainer.encode(docs("abc"), Seq(("ab", "c"), ("a", "b")))
      .select(BpeTrainer.symsOf(col("enc"))).as[Seq[String]].head()
    assert(rev === Seq("ab", "c"))
  }

  test("tokenCount counts post-merge symbols") {
    val n = BpeTrainer.encode(docs("low lower"), Seq(("l", "o"), ("lo", "w")))
      .select(BpeTrainer.tokenCount(col("enc"))).as[Int].head()
    // "low" -> [low] (1), "lower" -> [low, e, r] (3)
    assert(n === 4)
  }

  test("encodeLarge (typed path) is byte-identical to encode (expression path)") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001").limit(120)
    val merges = BpeTrainer.learn(spark, d, 10).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val a = BpeTrainer.encode(d, merges)
      .as[(Long, String)].collect().toMap
    val b = BpeTrainer.encodeLarge(d, merges)
      .as[(Long, String)].collect().toMap
    assert(a === b)
  }

  test("encodeLarge symbolizes per code point: supplementary-plane parity with encode") {
    // 😀 (U+1F600) and 𝕏 (U+1D54F) are surrogate PAIRS in UTF-16; both
    // paths must treat each as ONE symbol, so a merge rule over the
    // full character applies identically (the r12 advice regression)
    val d = docs("😀😀 a𝕏b", "ab 😀a")
    val merges = Seq(("😀", "😀"), ("a", "𝕏"), ("a𝕏", "b"))
    val a = BpeTrainer.encode(d, merges).as[(Long, String)].collect().toMap
    val b = BpeTrainer.encodeLarge(d, merges).as[(Long, String)].collect().toMap
    assert(a === b)
    val d1 = BpeTrainer.D1; val d2 = BpeTrainer.D2
    // and the merge really fired: 😀😀 collapsed to one symbol
    assert(a(0L).startsWith(s"$d1😀😀$d2"))
  }

  test("learn stops early when no pairs remain") {
    val m = learned("ab")(5)
    assert(m.map(t => (t._2, t._3)) === Seq(("a", "b")))
  }

  test("persisted merges: save → load → encode matches in-memory; integrity meta guards") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001").limit(80)
    val merges = BpeTrainer.learn(spark, d, 6)
    val path = java.nio.file.Files.createTempDirectory("graft-bpe").toString + "/tok"
    BpeTrainer.saveMerges(merges, path)
    val loaded = BpeTrainer.loadMerges(spark, path)
    val inMem = merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(loaded === inMem)
    assert(BpeTrainer.encode(d, loaded).as[(Long, String)].collect().toMap ===
      BpeTrainer.encode(d, inMem).as[(Long, String)].collect().toMap)
    // a corrupted artifact (lost rule row) fails loudly, not silently
    graft.sources.IndexMeta.write(spark, s"$path/meta.json", Seq("nMerges" -> 99L))
    intercept[IllegalArgumentException] { BpeTrainer.loadMerges(spark, path) }
  }
}
