package graft

import graft.functions.TextStats
import graft.plans.TextSig
import org.apache.spark.sql.functions._

/** The fused native signature expressions must produce bit-identical
  * values to the composable HOF column forms they replace — that
  * equivalence is what keeps the DuckDB oracles for
  * q_dedup_minhash/simhash/ngram valid on the native path.
  */
class TextSignaturesSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "one two"),          // shorter than the gram size
    (4L, "single"),
    (5L, ""),                 // empty text → [""] token
    (6L, "dup dup dup dup"),  // repeated tokens (simhash counts occurrences)
    (7L, "Hello, World! Mixed CASE tokens?"))

  private def df = texts.toDF("doc_id", "text")
    .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))

  test("graft_minhash_sigs ≡ 64 HOF permutation mins") {
    val ab = operators.Dedup.minhashCoeffs(64)
    val hofH32 = array_distinct(transform(col("grams"),
      s => conv(substring(md5(s), 1, 8), 16, 10).cast("long")))
    val grams = when(size(col("toks")) < 3, array(array_join(col("toks"), " ")))
      .otherwise(transform(sequence(lit(0), size(col("toks")) - 3),
        i => array_join(slice(col("toks"), i + 1, lit(3)), " ")))
    val hof = df.select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"), hofH32.as("h32"))
      .select(col("doc_id"), array(ab.map { case (a, b) =>
        array_min(transform(col("h32"), h => (h * lit(a) + lit(b)) % lit(operators.Dedup.minhashP)))
      }: _*).as("sigs"))
    val native = df.select(col("doc_id"),
      call_function("graft_minhash_sigs", col("toks"), lit(3)).as("sigs"))
    val h = hof.orderBy("doc_id").as[(Long, Seq[Long])].collect()
    val n = native.orderBy("doc_id").as[(Long, Seq[Long])].collect()
    assert(h.toSeq === n.toSeq)
  }

  test("graft_simhash_sig ≡ per-bit HOF majority votes") {
    val th = transform(col("toks"), t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val hofSig = (0 until 60).map { b =>
      val vote = aggregate(col("th"), lit(0), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val hof = df.select(col("doc_id"), th.as("th"))
      .select(col("doc_id"), hofSig.as("sig"))
    val native = df.select(col("doc_id"),
      call_function("graft_simhash_sig", col("toks")).as("sig"))
    assert(hof.orderBy("doc_id").as[(Long, Long)].collect().toSeq ===
      native.orderBy("doc_id").as[(Long, Long)].collect().toSeq)
  }

  test("graft_gram_hashes ≡ sorted distinct HOF 60-bit hashes") {
    val grams = when(size(col("toks")) < 3, array(array_join(col("toks"), " ")))
      .otherwise(transform(sequence(lit(0), size(col("toks")) - 3),
        i => array_join(slice(col("toks"), i + 1, lit(3)), " ")))
    val hof = df.select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"), array_sort(array_distinct(transform(col("grams"),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))).as("sh"))
    val native = df.select(col("doc_id"),
      call_function("graft_gram_hashes", col("toks"), lit(3)).as("sh"))
    assert(hof.orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq ===
      native.orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq)
  }

  test("graft_lsh_buckets ≡ HOF zip_with dot signs (incl. non-64-dim degenerate)") {
    val rng = new scala.util.Random(7)
    val vecs = (0L until 20L).map(i => (i, Seq.fill(64)(rng.nextDouble() - 0.5))) :+
      (99L, Seq.fill(10)(1.0)) // wrong dim → bucket 0 everywhere on both paths
    val vdf = vecs.toDF("vec_id", "emb")
    val planes = operators.Similarity.hyperplanes(64, 64)
    val hofBuckets = {
      val tables = (0 until 8).map { t =>
        val sig = (0 until 8).map { b =>
          val plane = planes(t * 8 + b)
          val dot = aggregate(zip_with(col("emb"), typedLit(plane.toSeq), (x, s) => x * s),
            lit(0.0), (acc, x) => acc + x)
          when(dot > 0, lit(1 << b)).otherwise(lit(0))
        }.reduce(_ + _)
        concat_ws(":", lit(t), sig)
      }
      array(tables: _*)
    }
    val hof = vdf.select(col("vec_id"), hofBuckets.as("b"))
      .orderBy("vec_id").as[(Long, Seq[String])].collect()
    val native = vdf.select(col("vec_id"),
      call_function("graft_lsh_buckets", col("emb")).as("b"))
      .orderBy("vec_id").as[(Long, Seq[String])].collect()
    assert(hof.toSeq === native.toSeq)
    assert(native.last._2.forall(_.endsWith(":0")))
  }

  test("graft_sentiment ≡ column-pipeline scorer bit for bit") {
    import graft.functions.Sentiment
    val texts = Seq(
      "spark is fast and the query is good", "slow scan error bad merge",
      "table row column", "not fast", "very fast", "never very FAST!!",
      "NOT GOOD at all", "really really great win", "somewhat bad, slightly slow.",
      "no gain without loss", "Mixed CASE Crash!! here", "", "   ",
      "the BIG win!?", "dont crash; not a loss", "extremely slow...")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = Sentiment.withCompound(df, "text", "s")
      .orderBy("doc_id").select("s").as[Double].collect()
    val columns = Sentiment.withCompoundColumns(df, "text", "s")
      .orderBy("doc_id").select("s").as[Double].collect()
    assert(native.length === texts.length)
    native.zip(columns).zipWithIndex.foreach { case ((nv, cv), i) =>
      assert(java.lang.Double.doubleToLongBits(nv) === java.lang.Double.doubleToLongBits(cv),
        s"doc $i (${texts(i)}): native=$nv column=$cv")
    }
  }

  test("native ≡ HOF on randomized corpora (property, seed 1234)") {
    val rng = new scala.util.Random(1234)
    val vocab = Vector("alpha", "beta", "GAMMA", "delta!", "e", "ünïcø", "x,y.z", "", "the", "not")
    val docs = (0L until 60L).map { i =>
      val n = rng.nextInt(12) // 0..11 tokens, hits the <k gram branch often
      (i, Seq.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val d = docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))

    // minhash: native vs HOF
    val ab = operators.Dedup.minhashCoeffs(64)
    val grams = when(size(col("toks")) < 3, array(array_join(col("toks"), " ")))
      .otherwise(transform(sequence(lit(0), size(col("toks")) - 3),
        i => array_join(slice(col("toks"), i + 1, lit(3)), " ")))
    val hofSigs = d.select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"), array_distinct(transform(col("grams"),
        s => conv(substring(md5(s), 1, 8), 16, 10).cast("long"))).as("h32"))
      .select(col("doc_id"), array(ab.map { case (a, b) =>
        array_min(transform(col("h32"), h => (h * lit(a) + lit(b)) % lit(operators.Dedup.minhashP)))
      }: _*).as("sigs"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    val natSigs = d.select(col("doc_id"),
      call_function("graft_minhash_sigs", col("toks"), lit(3)).as("sigs"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    assert(hofSigs.toSeq === natSigs.toSeq)

    // gram hash set: native vs HOF
    val hofSh = d.select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"), array_sort(array_distinct(transform(col("grams"),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))).as("sh"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    val natSh = d.select(col("doc_id"),
      call_function("graft_gram_hashes", col("toks"), lit(3)).as("sh"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    assert(hofSh.toSeq === natSh.toSeq)

    // sentiment: native vs column pipeline, bit-exact
    val txt = docs.toDF("doc_id", "text")
    val nat = graft.functions.Sentiment.withCompound(txt, "text", "s")
      .orderBy("doc_id").select("s").as[Double].collect()
    val colForm = graft.functions.Sentiment.withCompoundColumns(txt, "text", "s")
      .orderBy("doc_id").select("s").as[Double].collect()
    nat.zip(colForm).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToLongBits(a) === java.lang.Double.doubleToLongBits(b))
    }
  }

  test("hash helpers match the conv(substring(md5)) definition exactly") {
    val rows = Seq("a", "", "the quick", "ünïcødé").toDF("s")
      .select(col("s"),
        conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("h32"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h60"))
      .collect()
    rows.foreach { r =>
      assert(TextSig.hash32(r.getString(0)) === r.getLong(1))
      assert(TextSig.hash60(r.getString(0)) === r.getLong(2))
    }
  }

  test("graft_char_entropy: known values, +0.0 normalization, unicode code points") {
    import org.apache.spark.unsafe.types.UTF8String
    def h(s: String): Double = TextSig.charEntropy(UTF8String.fromString(s))
    assert(h("") === 0.0)
    // single distinct char: entropy 0, and POSITIVE zero (no −0.0)
    val z = h("aaaa")
    assert(z === 0.0 && java.lang.Double.doubleToRawLongBits(z) === 0L)
    assert(math.abs(h("ab") - math.log(2)) < 1e-12)
    assert(math.abs(h("aabb") - math.log(2)) < 1e-12)
    // 4 equally likely code points → ln 4; CJK counted as single chars
    assert(math.abs(h("一二三四") - math.log(4)) < 1e-12)
    // uniform over more symbols → higher entropy than skewed
    assert(h("abcdefgh") > h("aaaaabbb"))
    // the SQL function path evaluates the same values
    val got = Seq((1L, "aabb"), (2L, "aaaa")).toDF("id", "t")
      .select(col("id"), call_function("graft_char_entropy", col("t")).as("e"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - math.log(2)) < 1e-12 && got(2L) === 0.0)
  }
}
