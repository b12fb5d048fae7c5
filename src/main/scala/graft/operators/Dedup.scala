package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for LLM-corpus pipelines: exact, MinHash-LSH,
  * SimHash, and n-gram-Jaccard near-dup.
  *
  * Scale design (the part that matters at 100 TB):
  *  - NEVER an all-pairs crossJoin. Candidate generation is always
  *    banded: `groupBy(band_id, band_signature)` buckets, then pairs
  *    only within a bucket. Cost is O(docs × bands) + O(Σ bucket²)
  *    where buckets are tiny for honest signatures.
  *  - Signatures are computed per-row (no shuffle) from the token
  *    array; the only shuffles are the band groupBy and the final
  *    verify join, both on compact keys.
  *  - Verification joins candidate pairs back to token sets by doc_id —
  *    an equi-join, broadcastable when the candidate set is small.
  */
object Dedup {

  // ── exact ──────────────────────────────────────────────────────────

  /** Exact dedup on the normalized text: one surviving doc_id (the
    * minimum) per distinct content, plus the duplicate count. */
  def exact(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm", TextStats.normalize(col("text")))
      .groupBy("norm")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .select("keeper_id", "n_copies")

  // ── MinHash-LSH ────────────────────────────────────────────────────

  /** Word k-shingles of a token array (as strings). */
  private def shingles(toks: Seq[String], k: Int): Set[String] =
    if (toks.length < k) Set(toks.mkString(" "))
    else toks.sliding(k).map(_.mkString(" ")).toSet

  private def hash64(s: String, seed: Int): Long =
    scala.util.hashing.MurmurHash3.stringHash(s, seed).toLong & 0xffffffffL

  /** MinHash signature: numHashes permutations approximated by
    * (a*h + b) mod p over a base shingle hash. Deterministic (seed 42). */
  private[graft] def minhashSignature(toks: Seq[String], k: Int, numHashes: Int): Array[Long] = {
    val rng = new scala.util.Random(42)
    val p = 4294967311L // prime > 2^32
    val ab = Array.fill(numHashes)((1 + rng.nextLong(p - 1), rng.nextLong(p)))
    val sh = shingles(toks, k).map(s => hash64(s, 1234567)).toArray
    Array.tabulate(numHashes) { i =>
      val (a, b) = ab(i)
      if (sh.isEmpty) 0L
      else {
        var m = Long.MaxValue
        var j = 0
        while (j < sh.length) {
          val v = (a * sh(j) + b) % p
          if (v < m) m = v
          j += 1
        }
        m
      }
    }
  }

  private[graft] def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size

  /** Near-dup pairs via banded MinHash-LSH, verified with exact Jaccard.
    * bands × rowsPerBand = signature length. */
  def minhashPairs(docs: DataFrame, shingleK: Int = 3, bands: Int = 16,
                   rowsPerBand: Int = 4, threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val numHashes = bands * rowsPerBand
    val sigUdf = udf((toks: Seq[String]) =>
      minhashSignature(toks, shingleK, numHashes).grouped(rowsPerBand)
        .zipWithIndex.map { case (band, i) => s"$i:${band.mkString(",")}" }.toSeq)
    val banded = docs
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
      .withColumn("band", explode(sigUdf(col("toks"))))
      .select("doc_id", "band")
    // candidate pairs: only within a band bucket (no crossJoin)
    val candidates = banded.as("a")
      .join(banded.as("b"), $"a.band" === $"b.band" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    verifyJaccard(docs, candidates, shingleK, threshold)
  }

  /** Exact Jaccard of two SORTED hash arrays via linear merge —
    * O(|a|+|b|) per pair instead of re-shingling both documents. */
  private[graft] def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  private def sortedShingleHashes(toks: Seq[String], k: Int): Array[Long] =
    shingles(toks, k).map(s => hash64(s, 1234567)).toArray.sorted

  /** Verify candidate pairs with exact shingle Jaccard ≥ threshold.
    * Shingle sets are hashed + sorted ONCE per document, so each pair
    * costs a linear merge, not a re-shingling of both texts. */
  private def verifyJaccard(docs: DataFrame, candidates: DataFrame,
                            shingleK: Int, threshold: Double): DataFrame = {
    val hashUdf = udf((toks: Seq[String]) => sortedShingleHashes(toks, shingleK))
    val jacUdf = udf((a: Seq[Long], b: Seq[Long]) =>
      jaccardSorted(a.toArray, b.toArray))
    val sh = docs.select(col("doc_id"),
      hashUdf(TextStats.tokens(col("text"))).as("sh"))
    candidates
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard", round(jacUdf(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  // ── SimHash ────────────────────────────────────────────────────────

  /** 64-bit SimHash over token hashes (Charikar 2002). */
  private[graft] def simhash64(toks: Seq[String]): Long = {
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h = scala.util.hashing.MurmurHash3.stringHash(t, 77).toLong << 32 |
        (scala.util.hashing.MurmurHash3.stringHash(t.reverse, 99).toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Near-dup pairs via SimHash banding: 4 bands of 16 bits; pairs
    * sharing any band are verified by Hamming distance ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val shUdf = udf((toks: Seq[String]) => simhash64(toks))
    val sigs = docs
      .select(col("doc_id"), shUdf(TextStats.tokens(col("text"))).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(i =>
        concat_ws(":", lit(i), shiftright(col("sig"), i * 16).bitwiseAND(lit(0xffffL)))): _*)).as("band"))
    val pairs = banded.as("a")
      .join(banded.as("b"), $"a.band" === $"b.band" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.sig".as("sig_a"), $"b.sig".as("sig_b"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  // ── n-gram Jaccard ─────────────────────────────────────────────────

  /** Sorted distinct 60-bit md5 hashes of the word n-grams of `text` —
    * pure built-ins (codegen'd, engine-portable: any SQL engine with
    * md5 reproduces the exact values, which is what lets q_dedup_ngram
    * carry a value-exact DuckDB oracle). Shorter-than-n docs hash the
    * whole token string, matching [[shingles]]. */
  private[graft] def shingleHashSet(text: org.apache.spark.sql.Column, n: Int) = {
    val toks = TextStats.tokens(text)
    val grams = when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
    array_sort(array_distinct(transform(grams,
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))))
  }

  /** Near-dup pairs by word n-gram Jaccard, LSH-bucketed by the cheapest
    * usable key (min-k shingle hashes) to stay sub-quadratic, then
    * verified exactly. No UDFs: shingling, hashing, bucketing and the
    * Jaccard verify are all built-in column functions. */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                        buckets: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs.select(col("doc_id"), shingleHashSet(col("text"), n).as("sh"))
    // min-k sketch of shingle hashes as the bucketing keys: docs sharing
    // any of their `buckets` smallest shingle hashes become candidates
    val keyed = hashed.select(col("doc_id"),
      explode(slice(col("sh"), 1, buckets)).as("bucket"))
    val candidates = keyed.as("a")
      .join(keyed.as("b"), $"a.bucket" === $"b.bucket" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    candidates
      .join(hashed.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(hashed.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard",
        round(inter.cast("double") / (size(col("sh_a")) + size(col("sh_b")) - inter), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
