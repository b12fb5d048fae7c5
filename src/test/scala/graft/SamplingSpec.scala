package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling / source mixing: rate accuracy,
  * partition-layout independence, and mix proportions.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 20000L)
    .map(i => (i, Seq("en", "de", "fr")(((i * 7) % 3).toInt)))
    .toDF("doc_id", "lang")

  test("stratified keeps ~rate per stratum and drops unlisted strata") {
    val out = Sampling.stratified(docs, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.1))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("fr"))
    val nEn = docs.filter($"lang" === "en").count().toDouble
    val nDe = docs.filter($"lang" === "de").count().toDouble
    assert(math.abs(byLang("en") / nEn - 0.5) < 0.03)
    assert(math.abs(byLang("de") / nDe - 0.1) < 0.03)
  }

  test("membership is independent of partition layout") {
    val a = Sampling.stratified(docs.repartition(2), "lang", "doc_id", Map("en" -> 0.3))
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratified(docs.repartition(17), "lang", "doc_id", Map("en" -> 0.3))
      .select("doc_id").as[Long].collect().toSet
    assert(a === b, "same rows must survive under any partitioning")
  }

  test("weightedMix approximates target proportions without upsampling") {
    val out = Sampling.weightedMix(docs, "lang", "doc_id",
      Map("en" -> 0.6, "de" -> 0.4))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val total = byLang.values.sum
    assert(math.abs(byLang("en") / total - 0.6) < 0.05)
    assert(math.abs(byLang("de") / total - 0.4) < 0.05)
    // no stratum exceeds its available rows
    assert(byLang("en") <= docs.filter($"lang" === "en").count())
  }

  test("temperatureMix flattens source shares toward uniform, never upsamples") {
    val inCounts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val out = Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 0.5)
    val outCounts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    // α=0.5 targets shares ∝ sqrt(n): the smallest source is kept in
    // full (rate 1) and the largest is downsampled toward sqrt parity
    val smallest = inCounts.minBy(_._2)._1
    val largest = inCounts.maxBy(_._2)._1
    assert(outCounts(smallest) === inCounts(smallest), "smallest source keeps every row")
    assert(outCounts(largest) < inCounts(largest), "largest source is downsampled")
    // output share ratio approximates the sqrt-count ratio
    val wantRatio = math.sqrt(inCounts(largest)) / math.sqrt(inCounts(smallest))
    val gotRatio = outCounts(largest) / outCounts(smallest)
    assert(math.abs(gotRatio - wantRatio) / wantRatio < 0.25,
      s"share ratio $gotRatio should approximate sqrt ratio $wantRatio")
    // deterministic: same survivors on re-run under different layout
    val again = Sampling.temperatureMix(docs.repartition(13), "lang", "doc_id", alpha = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet === again)
  }

  test("exactKPerStratum takes exactly min(k, n) per stratum, layout-independent") {
    val out = Sampling.exactKPerStratum(docs, "lang", "doc_id", k = 100)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.values.forall(_ == 100L), s"every stratum has >100 rows: $byLang")
    // a stratum smaller than k survives whole
    val tiny = docs.filter($"doc_id" <= 30)
    val outTiny = Sampling.exactKPerStratum(tiny, "lang", "doc_id", k = 100)
    assert(outTiny.count() === tiny.count())
    // identical survivors under a different partitioning
    val again = Sampling.exactKPerStratum(docs.repartition(17), "lang", "doc_id", k = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet === again)
  }

  test("exactKPerStratum two-phase form is bit-identical to the single-window rank") {
    // the skew-safe shape (salt → per-(stratum, salt) top-k → per-stratum
    // top-k over survivors) must equal the naive per-stratum row_number
    // EXACTLY — top-k under the (md5, key) total order is associative —
    // for every subparts setting, including the degenerate subparts = 1
    val naive = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang")
        .orderBy(md5(concat($"doc_id".cast("string"), lit(":42"))), $"doc_id")
      docs.withColumn("__rn", row_number().over(w))
        .filter($"__rn" <= 100).drop("__rn")
        .select("doc_id").as[Long].collect().toSet
    }
    for (s <- Seq(1, 7, 64, 256)) {
      val got = Sampling.exactKPerStratum(docs, "lang", "doc_id", k = 100, subparts = s)
        .select("doc_id").as[Long].collect().toSet
      assert(got === naive, s"subparts=$s must reproduce the single-window survivors")
    }
    // a heavily skewed stratum (one domain holding ~90 % of rows) still
    // truncates to exactly k with the same survivors at any layout
    val skewed = (1L to 9000L).map(i => (i, "megasite.com"))
      .++((9001L to 10000L).map(i => (i, s"site${i % 50}.com"))).toDF("doc_id", "domain")
    val a = Sampling.exactKPerStratum(skewed, "domain", "doc_id", k = 5)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.exactKPerStratum(skewed.repartition(23), "domain", "doc_id", k = 5, subparts = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
    assert(Sampling.exactKPerStratum(skewed, "domain", "doc_id", k = 5)
      .filter($"domain" === "megasite.com").count() === 5L)
  }

  test("withExactRank ≡ plain per-group window rank; ntileOfRank ≡ ntile") {
    // quality-like bounded values with heavy ties + a dominant group
    val rows = (1L to 5000L).map { i =>
      (i, if (i % 10 == 0) "de" else "en", // en is 90% of rows — the skew shape
        math.rint(((i * 37) % 101) / 100.0 * 10000) / 10000.0)
    }.toDF("doc_id", "lang", "quality")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"quality", $"doc_id")
    val naive = rows
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lang")))
      .withColumn("tile", ntile(7).over(w).cast("long"))
      .select("doc_id", "rn", "n", "tile")
      .as[(Long, Long, Long, Long)].collect().map { case (d, r, n, t) => d -> ((r, n, t)) }.toMap
    val got = Sampling.withExactRank(rows.repartition(13), "lang", "quality", "doc_id")
      .withColumn("tile", Sampling.ntileOfRank($"__rn", $"__n", 7))
      .select("doc_id", "__rn", "__n", "tile")
      .as[(Long, Long, Long, Long)].collect().map { case (d, r, n, t) => d -> ((r, n, t)) }.toMap
    assert(got === naive, "two-phase rank must equal the single-window rank")
    // n < k: every row its own tile prefix, exactly like SQL ntile
    val tiny = Seq((1L, "x", 0.3), (2L, "x", 0.1), (3L, "x", 0.9)).toDF("doc_id", "lang", "quality")
    val tinyGot = Sampling.withExactRank(tiny, "lang", "quality", "doc_id")
      .withColumn("tile", Sampling.ntileOfRank($"__rn", $"__n", 7))
      .select("doc_id", "tile").as[(Long, Long)].collect().toMap
    val tinyWant = tiny.withColumn("tile", ntile(7).over(w).cast("long"))
      .select("doc_id", "tile").as[(Long, Long)].collect().toMap
    assert(tinyGot === tinyWant)
    // null ranks FIRST and NaN ranks LAST, exactly like the ascending
    // window — and no row is dropped (r17 review: a plain floor bucket
    // would lose null rows at the equi-join and misfile NaN)
    val messy = Seq(
      (1L, "x", Some(0.5)), (2L, "x", None), (3L, "x", Some(Double.NaN)),
      (4L, "x", Some(0.1)), (5L, "x", None), (6L, "x", Some(1.0)))
      .toDF("doc_id", "lang", "quality")
    val messyNaive = messy
      .withColumn("rn", row_number().over(w).cast("long"))
      .select("doc_id", "rn").as[(Long, Long)].collect().toMap
    val messyGot = Sampling.withExactRank(messy.repartition(5), "lang", "quality", "doc_id")
      .select("doc_id", "__rn").as[(Long, Long)].collect().toMap
    assert(messyGot === messyNaive,
      "null/NaN rows must rank exactly like the window form, none dropped")
    // NULL GROUP KEYS form their own group, exactly like partitionBy
    // (r17 advice: the equi-join dropped them; the joins are <=> now)
    val nullGrp = Seq(
      (1L, Some("x"), 0.5), (2L, None, 0.9), (3L, None, 0.1),
      (4L, Some("x"), 0.2), (5L, None, 0.9))
      .toDF("doc_id", "lang", "quality")
    val nullNaive = nullGrp
      .withColumn("rn", row_number().over(w).cast("long"))
      .select("doc_id", "rn").as[(Long, Long)].collect().toMap
    val nullGot = Sampling.withExactRank(nullGrp.repartition(3), "lang", "quality", "doc_id")
      .select("doc_id", "__rn").as[(Long, Long)].collect().toMap
    assert(nullGot === nullNaive,
      "null-group rows must rank as one group, exactly like the window form")
  }

  test("withExactRankScaled ≡ plain window for arbitrary-range values (negatives, infinities, nulls)") {
    val rows = ((1L to 3000L).map { i =>
      (i, if (i % 7 == 0) "b" else "a",
        Some(((i * 53) % 997).toDouble * 40.0 - 17000.0)) // range ~[-17000, 23000]
    } ++ Seq(
      (4001L, "a", Some(Double.PositiveInfinity)),
      (4002L, "a", Some(Double.NegativeInfinity)),
      (4003L, "b", Some(Double.NaN)),
      (4004L, "b", None))).toDF("doc_id", "lang", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"v", $"doc_id")
    val naive = rows
      .withColumn("rn", row_number().over(w).cast("long"))
      .select("doc_id", "rn").as[(Long, Long)].collect().toMap
    val got = Sampling.withExactRankScaled(rows.repartition(11), "lang", "v", "doc_id")
      .select("doc_id", "__rn").as[(Long, Long)].collect().toMap
    assert(got === naive)
    // side-table bound: scaled buckets stay ≤ groups × (buckets + 2)
    // even though the raw floor(v·256) span here is ~10^7
    val constant = Seq((1L, "a", 5.0), (2L, "a", 5.0), (3L, "b", 5.0))
      .toDF("doc_id", "lang", "v") // degenerate range: lo == hi
    val cGot = Sampling.withExactRankScaled(constant, "lang", "v", "doc_id")
      .select("doc_id", "__rn").as[(Long, Long)].collect().toMap
    val cNaive = constant.withColumn("rn", row_number().over(w).cast("long"))
      .select("doc_id", "rn").as[(Long, Long)].collect().toMap
    assert(cGot === cNaive)
  }

  test("composition: near-dup cluster ids feed assignSplit so duplicates never straddle train/eval") {
    import graft.operators.Dedup
    // three near-dup families as explicit pair edges + singleton docs
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("a", "b")
    val groups = Dedup.connectedComponents(pairs) // (doc_id, group_id)
    val singletons = Seq(100L, 101L, 102L).toDF("doc_id")
      .withColumn("group_id", $"doc_id") // a doc with no dup is its own group
    val all = groups.unionByName(singletons)
    val split = Sampling.assignSplit(all, "group_id")
    // every member of a family shares one split — THE leakage guarantee
    val straddlers = split.groupBy("group_id")
      .agg(countDistinct("split").as("k")).filter($"k" > 1).count()
    assert(straddlers === 0L)
    // family {20,21,22,23} specifically lands together
    val fam = split.filter($"doc_id".isin(20L, 21L, 22L, 23L))
      .select("split").distinct().count()
    assert(fam === 1L)
  }

  test("assignSplit is group-atomic: one split per group, fractions ~hold over groups") {
    val grouped = docs.withColumn("source", concat(lit("src"), ($"doc_id" % 200).cast("string")))
    val out = Sampling.assignSplit(grouped, "source")
    // leakage audit: no source straddles two splits
    val straddlers = out.groupBy("source")
      .agg(countDistinct("split").as("k")).filter($"k" > 1).count()
    assert(straddlers === 0L)
    // split fractions hold over the 200 groups within binomial noise
    val bySplit = out.select("source", "split").distinct()
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(math.abs(bySplit("train") / 200.0 - 0.8) < 0.08, bySplit.toString)
    assert(bySplit.getOrElse("val", 0.0) + bySplit.getOrElse("test", 0.0) > 0)
  }

  test("tokenBudgetMix: budgets bound per source, straddler kept, layout independent") {
    val df = (1L to 300L)
      .map(id => (id, s"s${id % 3}", id % 17 + 1L))
      .toDF("id", "source", "n")
    val budgets = Map("s0" -> 150L, "s1" -> 250L, "s2" -> 1000000L)
    def run(parts: Int) = Sampling
      .tokenBudgetMix(df.repartition(parts), "source", "id", "n", budgets)
      .select("id", "source", "n").as[(Long, String, Long)].collect().toSet
    val a = run(3)
    // deterministic across partition layout
    assert(a === run(17))
    val bySource = a.groupBy(_._2).view.mapValues(_.toSeq.map(_._3).sum).toMap
    // each capped source fills its budget: total reaches it, and
    // removing the (largest possible) straddler lands strictly under
    Seq("s0" -> 150L, "s1" -> 250L).foreach { case (s, b) =>
      val kept = bySource(s)
      val maxDoc = a.filter(_._2 == s).map(_._3).max
      assert(kept >= b, s"$s under-filled: $kept < $b")
      assert(kept - maxDoc < b, s"$s kept more than budget + one straddler")
    }
    // an effectively-unbounded budget keeps the whole source
    assert(a.count(_._2 == "s2") === 100)
  }

  test("tokenBudgetMixEpochs: small source repeats to fill its budget, capped by maxEpochs") {
    // uniform doc sizes make expected counts hash-order-independent:
    // "tiny" = 5 docs × 10 tokens (total 50), "big" = 100 × 10
    val df = ((1L to 5L).map(id => (id, "tiny", 10L)) ++
      (101L to 200L).map(id => (id, "big", 10L))).toDF("id", "source", "n")
    val out = Sampling.tokenBudgetMixEpochs(df, "source", "id", "n",
        Map("tiny" -> 120L, "big" -> 100L), maxEpochs = 4)
      .select("id", "source", "epoch").as[(Long, String, Long)].collect()
    // tiny: budget 120 over total 50 → epochs 0,1 full (5 docs each) and
    // epoch 2 partial (before = 100 + bf < 120 ⇒ bf < 20 ⇒ 2 docs)
    val tiny = out.filter(_._2 == "tiny")
    assert(tiny.count(_._3 == 0L) === 5 && tiny.count(_._3 == 1L) === 5)
    assert(tiny.count(_._3 == 2L) === 2 && tiny.forall(_._3 <= 2L))
    // big: budget 100 of 1000 → single epoch, 10 docs
    val big = out.filter(_._2 == "big")
    assert(big.length === 10 && big.forall(_._3 === 0L))
    // the cap binds: maxEpochs = 2 stops tiny at two full passes even
    // though the budget would admit a third
    val capped = Sampling.tokenBudgetMixEpochs(df, "source", "id", "n",
        Map("tiny" -> 1000L), maxEpochs = 2)
      .select("epoch").as[Long].collect()
    assert(capped.length === 10 && capped.max === 1L)
  }

  test("shuffleDeterministic: exact global permutation, shard-aligned, layout-independent") {
    val df = (0L until 300L).map(id => (id, s"doc-$id")).toDF("doc_id", "payload")
    val out = Sampling.shuffleDeterministic(df, "doc_id", nShards = 16)
      .select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().sortBy(_._3)
    // pos is a bijection onto 0..N-1
    assert(out.map(_._3).toSeq === (0L until 300L))
    // the permutation IS md5(key:salt) order with a key tiebreak
    val expected = (0L until 300L).sortBy { id =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:42".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (h, id)
    }
    assert(out.map(_._1).toSeq === expected)
    // shards are contiguous position ranges in shard order (files
    // concatenate into the global order)
    val byShard = out.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (sh, rows) => (sh, rows.map(_._3).min, rows.map(_._3).max) }
    byShard.sliding(2).foreach {
      case Seq((_, _, hiA), (_, loB, _)) => assert(hiA < loB, "shard ranges overlap")
      case _ => ()
    }
    // layout independence: any input partitioning yields the same rows
    val again = Sampling.shuffleDeterministic(df.repartition(7), "doc_id", nShards = 16)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect().sortBy(_._3)
    assert(again.toSeq === out.toSeq)
    // a different salt is a different permutation
    val other = Sampling.shuffleDeterministic(df, "doc_id", nShards = 16, salt = 7)
      .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._2).map(_._1)
    assert(other.toSeq !== out.map(_._1).toSeq)
  }

  test("writeShuffled: shard dirs hold the permutation in pos order, re-runs byte-identical") {
    val df = (0L until 200L).map(id => (id, s"p-$id")).toDF("doc_id", "payload")
    val out = java.nio.file.Files.createTempDirectory("graft-shuf").toString + "/export"
    Sampling.writeShuffled(df, "doc_id", out, nShards = 8)
    val root = new java.io.File(out)
    val shardDirs = root.listFiles().filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.nonEmpty, "expected shard= hive layout")
    // within every shard FILE the rows are in pos order (the loader's
    // sequential-read contract), and concatenating shards in shard
    // order reproduces the exact global permutation
    val all = shardDirs.flatMap { sd =>
      val files = new java.io.File(root, sd).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      files.flatMap { f =>
        val rows = spark.read.parquet(f.getPath)
          .select("doc_id", "pos").as[(Long, Long)].collect()
        assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq,
          s"rows in $sd/${f.getName} not in pos order")
        rows
      }
    }
    assert(all.map(_._2).toSeq === (0L until 200L), "shards do not concatenate into the permutation")
    val expected = Sampling.shuffleDeterministic(df, "doc_id", nShards = 8)
      .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._2).map(_._1)
    assert(all.map(_._1).toSeq === expected.toSeq)
    // re-export over a different input layout is row-identical
    val out2 = java.nio.file.Files.createTempDirectory("graft-shuf2").toString + "/export"
    Sampling.writeShuffled(df.repartition(7), "doc_id", out2, nShards = 8)
    val a = spark.read.parquet(out).select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().toSet
    val b = spark.read.parquet(out2).select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().toSet
    assert(a === b)
  }

  test("zero budget drops the source entirely from BOTH mixers") {
    // a zero budget is the natural "drop this source" config; the
    // epoch mixer's sequence(0, nEp−1) must not descend into a
    // phantom epoch −1 that passes the budget filter
    val df = ((1L to 5L).map(id => (id, "keep", 10L)) ++
      (101L to 110L).map(id => (id, "drop", 10L))).toDF("id", "source", "n")
    val budgets = Map("keep" -> 30L, "drop" -> 0L)
    val flat = Sampling.tokenBudgetMix(df, "source", "id", "n", budgets)
      .select("source").as[String].collect()
    assert(!flat.contains("drop"), "flat mixer leaked a zero-budget source")
    val ep = Sampling.tokenBudgetMixEpochs(df, "source", "id", "n", budgets)
      .select("source", "epoch").as[(String, Long)].collect()
    assert(!ep.exists(_._1 == "drop"), "epoch mixer leaked a zero-budget source")
    assert(ep.forall(_._2 >= 0L), "no phantom negative epochs")
    assert(ep.count(_._1 == "keep") === 3, "positive budgets unaffected")
  }
}
