package graft

import graft.operators.FuzzyJoin

/** Edit-distance join: exact parity with all-pairs levenshtein on a
  * fixture built to stress every pruning path — repeated-gram strings
  * (multiset matching), strings under the gram-bound floor (short
  * band path), empties, and hot shared grams (prefix filtering). */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val names = Seq(
    "jon smith", "john smith", "jonn smith", "jane smythe", "j smith",
    "abcd", "abcde", "aaaa", "aaa", "aa", "a", "", "zzzz",
    "spark engine", "spark engines", "sprak engine", "spark  engine",
    "entirely different string", "mississippi", "mississippe")

  private def brute(k: Int): Set[(Long, Long, Int)] =
    (for {
      (a, i) <- names.zipWithIndex; (b, j) <- names.zipWithIndex
      d = lev(a, b) if d <= k
    } yield (i.toLong, j.toLong, d)).toSet

  test("editDistanceJoin ≡ all-pairs levenshtein at k=2 (repeats, shorts, empties)") {
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = FuzzyJoin.editDistanceJoin(df, df, "id", "s", k = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === brute(2))
  }

  test("k=1 and any partition layout: still exact") {
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    def run(parts: Int) = FuzzyJoin
      .editDistanceJoin(df.repartition(parts), df, "id", "s", k = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(run(2) === brute(1))
    assert(run(7) === brute(1))
  }

  test("randomized parity with brute force: 120 strings over a hot 6-char alphabet, k=1 and k=2") {
    // small alphabet + spaces → dense near-dup space, extremely hot
    // grams, many repeats: the adversarial regime for prefix filtering
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde "
    val strs = (0 until 120).map { i =>
      (i.toLong, (0 until rnd.nextInt(13)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    def bruteAt(k: Int): Set[(Long, Long, Int)] =
      (for {
        a <- strs; b <- strs
        d = lev(a._2, b._2) if d <= k
      } yield (a._1, b._1, d)).toSet
    val df = strs.toDF("id", "s")
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.editDistanceJoin(df, df, "id", "s", k = k)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === bruteAt(k), s"parity broke at k=$k")
    }
  }

  test("duplicate ids fail loudly — they would merge gram partitions and silently drop matches") {
    val dup = Seq((1L, "john smith"), (1L, "jane smythe"), (2L, "jon smith"))
      .toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoin(dup, dup, "id", "s", k = 2)
    }
    assert(e.getMessage.contains("ids are not unique"))
    val clean = Seq((1L, "john smith"), (2L, "jon smith")).toDF("id", "s")
    val e2 = intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoin(clean, dup, "id", "s", k = 2)
    }
    assert(e2.getMessage.contains("right ids are not unique"))
  }

  test("two-table form: dirty batch against a clean catalog") {
    val catalog = Seq((1L, "acme holdings"), (2L, "globex corp"),
      (3L, "initech llc")).toDF("id", "s")
    val dirty = Seq((10L, "acme holding"), (11L, "globexx corp"),
      (12L, "completely unrelated"), (13L, "initech lcl")).toDF("id", "s")
    val got = FuzzyJoin.editDistanceJoin(dirty, catalog, "id", "s", k = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((10L, 1L, 1), (11L, 2L, 1), (13L, 3L, 2)))
  }

  test("editDistanceLookup ≡ editDistanceJoin ≡ brute force (catalog-only order is still complete)") {
    // the lookup form ranks prefixes under the CATALOG's frequency
    // order, with probe-only grams at df = 0 — a DIFFERENT shared
    // order than the general form's two-sided union, so this parity
    // is the prefix-lemma completeness argument made executable.
    // Probe deliberately carries grams the catalog lacks ('x', 'q'),
    // strings on both sides of the short-path floor, and empties.
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde "
    val catalog = (0 until 150).map { i =>
      (i.toLong, (0 until rnd.nextInt(13)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val probe = (0 until 40).map { i =>
      val base = catalog(rnd.nextInt(catalog.length))._2
      val mutated = if (base.isEmpty) "xq" else {
        val p = rnd.nextInt(base.length)
        base.updated(p, "xqz".charAt(rnd.nextInt(3)))
      }
      (1000L + i, mutated)
    } :+ (2000L, "") :+ (2001L, "xxqqxxqq")
    val cDf = catalog.toDF("id", "s")
    val pDf = probe.toDF("id", "s")
    def bruteAt(k: Int): Set[(Long, Long, Int)] =
      (for {
        a <- probe; b <- catalog
        d = lev(a._2, b._2) if d <= k
      } yield (a._1, b._1, d)).toSet
    for (k <- Seq(1, 2)) {
      val lookup = FuzzyJoin.editDistanceLookup(pDf, cDf, "id", "s", k = k)
        .as[(Long, Long, Int)].collect().toSet
      val general = FuzzyJoin.editDistanceJoin(pDf, cDf, "id", "s", k = k)
        .as[(Long, Long, Int)].collect().toSet
      assert(lookup === bruteAt(k), s"lookup lost candidates at k=$k")
      assert(general === bruteAt(k), s"general form parity broke at k=$k")
    }
  }

  test("editDistanceLookup guards unique ids on both sides") {
    val dup = Seq((1L, "john smith"), (1L, "jane smythe")).toDF("id", "s")
    val clean = Seq((2L, "jon smith")).toDF("id", "s")
    assert(intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceLookup(dup, clean, "id", "s", k = 2)
    }.getMessage.contains("probe ids are not unique"))
    assert(intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceLookup(clean, dup, "id", "s", k = 2)
    }.getMessage.contains("catalog ids are not unique"))
  }

  // ── the persisted catalog-index tier (FuzzyLinkIndex) ──────────────

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("indexed lookup ≡ recompute lookup ≡ brute force, incremental ingest + replay") {
    import graft.operators.FuzzyLinkIndex
    val rnd = new scala.util.Random(11)
    val alphabet = "abcde "
    val catalog = (0 until 150).map { i =>
      (i.toLong, (0 until rnd.nextInt(13)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val probe = ((0 until 40).map { i =>
      val base = catalog(rnd.nextInt(catalog.length))._2
      val mutated = if (base.isEmpty) "xq" else {
        val p = rnd.nextInt(base.length)
        base.updated(p, "xqz".charAt(rnd.nextInt(3)))
      }
      (1000L + i, mutated)
    } :+ (2000L, "") :+ (2001L, "xxqqxxqq"))
    val cDf = catalog.toDF("id", "s")
    val pDf = probe.toDF("id", "s")
    val path = tmpRoot("graft-fuzzylink-spec")
    FuzzyLinkIndex.initLinkIndex(spark, path, k = 2)
    // incremental: even-id batch → refresh → odd-id batch → REPLAY
    // batch 0 (fingerprint no-op) → refresh; plus an exact-duplicate
    // row landed under a THIRD key — the union must re-collapse it
    FuzzyLinkIndex.ingestCatalogBatch(cDf.filter($"id" % 2 === 0), path, 0L)
    FuzzyLinkIndex.refreshLinkIndex(spark, path)
    FuzzyLinkIndex.ingestCatalogBatch(cDf.filter($"id" % 2 === 1), path, 1L)
    FuzzyLinkIndex.ingestCatalogBatch(cDf.filter($"id" % 2 === 0), path, 0L)
    FuzzyLinkIndex.ingestCatalogBatch(cDf.filter($"id" === 3L), path, 2L)
    FuzzyLinkIndex.refreshLinkIndex(spark, path)
    val indexed = FuzzyLinkIndex.editDistanceLookupIndexed(pDf, path, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    val recompute = FuzzyJoin.editDistanceLookup(pDf, cDf, "id", "s", k = 2)
      .as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      a <- probe; b <- catalog
      d = lev(a._2, b._2) if d <= 2
    } yield (a._1, b._1, d)).toSet
    assert(indexed === recompute, "indexed tier must equal the recompute path")
    assert(indexed === brute, "indexed tier lost true pairs")
  }

  test("incremental refresh ≡ from-scratch refresh on overlapping batches (r18: per-version gram tier)") {
    import graft.operators.FuzzyLinkIndex
    val rnd = new scala.util.Random(29)
    val alphabet = "abcd "
    val catalog = (0 until 120).map { i =>
      (i.toLong, (0 until rnd.nextInt(11)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val cDf = catalog.toDF("id", "s")
    // A: v_1 on thirds {0}, then overlapping batches {1, and 0..30 again}
    // → v_2 takes the INCREMENTAL path off v_1's gram tier
    val pathA = tmpRoot("graft-fuzzylink-inc")
    FuzzyLinkIndex.initLinkIndex(spark, pathA, k = 2)
    FuzzyLinkIndex.ingestCatalogBatch(cDf.filter($"id" % 3 === 0), pathA, 0L)
    FuzzyLinkIndex.refreshLinkIndex(spark, pathA)
    FuzzyLinkIndex.ingestCatalogBatch(
      cDf.filter($"id" % 3 === 1 || $"id" <= 30), pathA, 1L)
    FuzzyLinkIndex.ingestCatalogBatch(cDf.filter($"id" % 3 === 2), pathA, 2L)
    // bound 0: any rank drift re-ranks, so the incremental refresh
    // derives the same selection a from-scratch one would — the
    // five-tier equality this test pins (the epoch-PINNED path has
    // its own test below; its prefixes differ from from-scratch by
    // design while the OUTPUT stays equal)
    FuzzyLinkIndex.refreshLinkIndex(spark, pathA, orderStaleBound = 0.0)
    // B: identical union, ONE from-scratch refresh
    val pathB = tmpRoot("graft-fuzzylink-scratch")
    FuzzyLinkIndex.initLinkIndex(spark, pathB, k = 2)
    FuzzyLinkIndex.ingestCatalogBatch(cDf, pathB, 0L)
    FuzzyLinkIndex.refreshLinkIndex(spark, pathB)
    def served(path: String): String =
      graft.sources.VersionedRoot.resolve(spark, s"$path/index", "test").get
    def tbl(path: String, name: String): Set[Seq[Any]] =
      spark.read.parquet(s"${served(path)}/$name")
        .collect().map(_.toSeq).toSet
    for (t <- Seq("catalog", "grams", "dfreq", "prefix", "short"))
      assert(tbl(pathA, t) === tbl(pathB, t),
        s"incremental $t diverged from the from-scratch derivation")
    // and the serving surface agrees with a plain recompute
    val probe = Seq((900L, catalog(7)._2 + "x"), (901L, "")).toDF("id", "s")
    val inc = FuzzyLinkIndex.editDistanceLookupIndexed(probe, pathA, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    val rec = FuzzyJoin.editDistanceLookup(probe, cDf, "id", "s", k = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(inc === rec)
  }

  test("epoch-pinned refresh: selection reuse under a deliberately stale order stays complete (r19)") {
    import graft.operators.FuzzyLinkIndex
    val rnd = new scala.util.Random(47)
    val alphabet = "abcd "
    val catalog = (0 until 140).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val cDf = catalog.toDF("id", "s")
    val path = tmpRoot("graft-fuzzylink-epoch")
    FuzzyLinkIndex.initLinkIndex(spark, path, k = 2)
    // v_1: a QUARTER of the catalog — its frequency order is badly
    // stale for the full catalog, the worst case the epoch pin rides
    FuzzyLinkIndex.ingestCatalogBatch(cDf.filter($"id" % 4 === 0), path, 0L)
    FuzzyLinkIndex.refreshLinkIndex(spark, path)
    def served(): String =
      graft.sources.VersionedRoot.resolve(spark, s"$path/index", "test").get
    def tbl(res: String, name: String): Set[Seq[Any]] =
      spark.read.parquet(s"$res/$name").collect().map(_.toSeq).toSet
    val v1 = served()
    val (v1Order, v1Prefix) = (tbl(v1, "order"), tbl(v1, "prefix"))
    // v_2: the rest lands, bound 1.0 pins v_1's epoch — never re-rank
    FuzzyLinkIndex.ingestCatalogBatch(cDf.filter($"id" % 4 =!= 0), path, 1L)
    FuzzyLinkIndex.refreshLinkIndex(spark, path, orderStaleBound = 1.0)
    val v2 = served()
    assert(tbl(v2, "order") === v1Order,
      "the epoch path must carry the served selection order verbatim")
    assert(graft.sources.IndexMeta.read(spark, s"$v2/meta.json", "t")("order_epoch") === 1L)
    assert(v1Prefix.subsetOf(tbl(v2, "prefix")),
      "old strings' selections must be reused verbatim, never re-ranked")
    // dfreq is still the TRUE fold (staleness is measured against it)
    assert(tbl(v2, "dfreq") !== v1Order,
      "the true frequencies must keep folding while the epoch rides")
    // completeness under the stale epoch: the indexed lookup still
    // finds exactly the true pairs (candidates can only widen; the
    // exact levenshtein verify decides every pair)
    val probe = ((0 until 30).map { i =>
      val base = catalog(rnd.nextInt(catalog.length))._2
      (3000L + i, if (base.isEmpty) "zz" else base.updated(0, 'x'))
    } :+ (4000L, "")).toDF("id", "s")
    val indexed = FuzzyLinkIndex.editDistanceLookupIndexed(probe, path, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      a <- probe.as[(Long, String)].collect(); b <- catalog
      d = lev(a._2, b._2) if d <= 2
    } yield (a._1, b._1, d)).toSet
    assert(indexed === brute, "a pinned stale epoch must never lose a true pair")
    // past the bound the epoch re-ranks: a third refresh at bound 0
    // starts a fresh epoch whose order IS the folded frequencies
    FuzzyLinkIndex.ingestCatalogBatch(
      Seq((9000L, "xqzv xqzv")).toDF("id", "s"), path, 2L)
    FuzzyLinkIndex.refreshLinkIndex(spark, path, orderStaleBound = 0.0)
    val v3 = served()
    assert(graft.sources.IndexMeta.read(spark, s"$v3/meta.json", "t")("order_epoch") === 3L)
    assert(tbl(v3, "order") === tbl(v3, "dfreq"),
      "a re-rank epoch's selection order is the true frequency order")
    assert(FuzzyLinkIndex.editDistanceLookupIndexed(probe, path, "id", "s")
      .as[(Long, Long, Int)].collect().toSet === brute)
  }

  test("catalog batch merge-compaction: lookup unchanged, merged-away replay still no-ops") {
    import graft.operators.FuzzyLinkIndex
    val path = tmpRoot("graft-fuzzylink-merge")
    FuzzyLinkIndex.initLinkIndex(spark, path, k = 1)
    val cat = (0L until 90L).map(i => (i, s"name number $i")).toDF("id", "s")
    (0 until 3).foreach { m =>
      FuzzyLinkIndex.ingestCatalogBatch(cat.filter($"id" % 3 === m), path, m.toLong)
    }
    FuzzyLinkIndex.refreshLinkIndex(spark, path)
    val probe = Seq((1000L, "name number 42x")).toDF("id", "s")
    val before = FuzzyLinkIndex.editDistanceLookupIndexed(probe, path, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    FuzzyLinkIndex.mergeCatalogBatches(spark, path, maxDirs = 1)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/parts/b=0_2/_fp")))
    // a refresh off the merged state derives the identical index
    FuzzyLinkIndex.refreshLinkIndex(spark, path)
    assert(FuzzyLinkIndex.editDistanceLookupIndexed(probe, path, "id", "s")
      .as[(Long, Long, Int)].collect().toSet === before)
    // replay of a merged-away catalog batch: no-op; different payload loud
    FuzzyLinkIndex.ingestCatalogBatch(cat.filter($"id" % 3 === 1), path, 1L)
    assert(intercept[IllegalArgumentException] {
      FuzzyLinkIndex.ingestCatalogBatch(cat.filter($"id" % 3 === 2), path, 1L)
    }.getMessage.contains("DIFFERENT contribution"))
    FuzzyLinkIndex.refreshLinkIndex(spark, path)
    assert(FuzzyLinkIndex.editDistanceLookupIndexed(probe, path, "id", "s")
      .as[(Long, Long, Int)].collect().toSet === before)
  }

  test("staleness: growth trigger refreshes only past the bound; a partial index misses new entries") {
    import graft.operators.FuzzyLinkIndex
    val path = tmpRoot("graft-fuzzylink-stale")
    FuzzyLinkIndex.initLinkIndex(spark, path, k = 1)
    val batch0 = (0L until 100L).map(i => (i, s"name number $i")).toDF("id", "s")
    FuzzyLinkIndex.ingestCatalogBatch(batch0, path, 0L)
    // never-published: refreshes unconditionally
    assert(FuzzyLinkIndex.maybeRefreshLinkIndex(spark, path, growthPct = 50) === Some("v_1"))
    // fresh: a tick with no growth is a no-op
    assert(FuzzyLinkIndex.maybeRefreshLinkIndex(spark, path, growthPct = 50) === None)
    // sub-threshold growth (10 % < 50 %): still served stale — and the
    // STALE version resolves old strings but cannot see the new entry
    val late = Seq((500L, "zzgh zzgh")).toDF("id", "s")
    FuzzyLinkIndex.ingestCatalogBatch(late
      .unionByName((100L until 109L).map(i => (i, s"name number $i")).toDF("id", "s")),
      path, 1L)
    assert(FuzzyLinkIndex.maybeRefreshLinkIndex(spark, path, growthPct = 50) === None)
    val probe = Seq((9000L, "zzgh zzghx")).toDF("id", "s")
    assert(FuzzyLinkIndex.editDistanceLookupIndexed(probe, path, "id", "s").count() === 0L,
      "a stale version must not see entries ingested after its derivation")
    // past the bound: refresh publishes v_2 and the entry resolves
    FuzzyLinkIndex.ingestCatalogBatch(
      (200L until 260L).map(i => (i, s"name number $i")).toDF("id", "s"), path, 2L)
    assert(FuzzyLinkIndex.maybeRefreshLinkIndex(spark, path, growthPct = 50) === Some("v_2"))
    assert(FuzzyLinkIndex.editDistanceLookupIndexed(probe, path, "id", "s")
      .as[(Long, Long, Int)].collect().toSet === Set((9000L, 500L, 1)))
  }

  test("index lifecycle fails loudly: bad path, conflicting id, different payload replay, unpublished read") {
    import graft.operators.FuzzyLinkIndex
    // a typo'd/uninitialized path must be loud, not a silent no-op tick
    intercept[Exception] {
      FuzzyLinkIndex.maybeRefreshLinkIndex(spark, tmpRoot("graft-fuzzylink-none"))
    }
    val path = tmpRoot("graft-fuzzylink-loud")
    FuzzyLinkIndex.initLinkIndex(spark, path, k = 2)
    // initialized but nothing ingested: legitimate None, not an error
    assert(FuzzyLinkIndex.maybeRefreshLinkIndex(spark, path) === None)
    // unpublished read is loud
    assert(intercept[RuntimeException] {
      FuzzyLinkIndex.editDistanceLookupIndexed(
        Seq((1L, "a")).toDF("id", "s"), path, "id", "s")
    }.getMessage.contains("no published version"))
    FuzzyLinkIndex.ingestCatalogBatch(Seq((1L, "acme co")).toDF("id", "s"), path, 0L)
    // a DIFFERENT payload under a used batch key is a loud failure
    assert(intercept[IllegalArgumentException] {
      FuzzyLinkIndex.ingestCatalogBatch(Seq((1L, "acme corp")).toDF("id", "s"), path, 0L)
    }.getMessage.contains("DIFFERENT contribution"))
    // two batches claiming one id with different strings fail at refresh
    FuzzyLinkIndex.ingestCatalogBatch(Seq((1L, "acme holdings")).toDF("id", "s"), path, 1L)
    assert(intercept[IllegalArgumentException] {
      FuzzyLinkIndex.refreshLinkIndex(spark, path)
    }.getMessage.contains("catalog ids are not unique"))
  }
}
