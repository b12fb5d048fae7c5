package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame

/** Fixture + recall tests for the dedup family. The LSH variants are
  * verified against brute-force ground truth on a small corpus — the
  * thing the banded implementations must approximate without ever
  * doing an all-pairs join.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val vocab = "key agg row scan slow fast table value part hash merge batch spark line sort window group".split(" ")

  /** Synthetic corpus: 40 base docs + near-dup copies with small edits. */
  private lazy val corpus: DataFrame = {
    val rng = new scala.util.Random(7)
    val base = (0L until 40L).map { i =>
      (i, Seq.fill(30)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val nearDups = base.take(10).map { case (i, t) =>
      val toks = t.split(" ").toVector
      val j = rng.nextInt(toks.length)
      (i + 100, toks.updated(j, vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val exactDups = base.slice(10, 15).map { case (i, t) => (i + 200, t) }
    docs((base ++ nearDups ++ exactDups): _*)
  }

  private def bruteforcePairs(threshold: Double, k: Int): Set[(Long, Long)] = {
    val all = corpus.as[(Long, String)].collect()
    def sh(t: String) = t.split(" ").sliding(k).map(_.mkString(" ")).toSet
    (for {
      (a, ta) <- all; (b, tb) <- all if a < b
      j = { val sa = sh(ta); val sb = sh(tb); sa.intersect(sb).size.toDouble / sa.union(sb).size }
      if j >= threshold
    } yield (a, b)).toSet
  }

  test("exact dedup keeps min doc_id per distinct normalized text") {
    val d = docs((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
    val out = Dedup.exact(d).as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L), (3L, 1L)))
  }

  test("minhash-LSH finds all exact dups and near-dups above threshold (recall vs brute force)") {
    val truth = bruteforcePairs(0.5, 3)
    assert(truth.nonEmpty, "fixture must contain real near-dup pairs")
    val got = Dedup.minhashPairs(corpus, shingleK = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    // verified-candidates ⊆ truth always (exact verify step)…
    assert(got.subsetOf(truth))
    // …and banding must recover the high-similarity mass
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall over ${truth.size} true pairs")
  }

  test("simhash flags exact dups at hamming 0 and near-dups at small distance") {
    val got = Dedup.simhashPairs(corpus, maxHamming = 6)
      .as[(Long, Long, Long)].collect()
    val exactPairs = got.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    assert((10L until 15L).map(i => (i, i + 200)).forall(exactPairs.contains))
  }

  test("ngram-Jaccard pairs match brute force at threshold (min-k bucket recall)") {
    val truth = bruteforcePairs(0.5, 3)
    val got = Dedup.ngramJaccardPairs(corpus, n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(got.subsetOf(truth))
    assert(got.size.toDouble / truth.size >= 0.9)
  }

  test("jaccard helper: identical sets → 1, disjoint → 0") {
    assert(Dedup.jaccard(Set("a"), Set("a")) === 1.0)
    assert(Dedup.jaccard(Set("a"), Set("b")) === 0.0)
  }

  test("connectedComponents resolves chain, star and singleton-pair graphs") {
    // chain 1-2-3-...-10 (diameter 9: kills naive one-hop label
    // propagation), star 20-{21,22,23}, isolated pair 30-31
    val chain = (1L until 10L).map(i => (i, i + 1))
    val star = Seq((20L, 21L), (20L, 22L), (23L, 20L))
    val pair = Seq((31L, 30L))
    val pairs = (chain ++ star ++ pair).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val want =
      (1L to 10L).map(_ -> 1L).toMap ++
        Seq(20L, 21L, 22L, 23L).map(_ -> 20L).toMap ++
        Map(30L -> 30L, 31L -> 30L)
    assert(got === want)
  }

  test("connectedComponents labels every corpus near-dup with its group min") {
    val pairs = Dedup.minhashPairs(corpus).select("doc_a", "doc_b")
    val truth = bruteforcePairs(0.5, 3)
    // union-find over the brute-force truth graph
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    truth.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val want = truth.flatMap(p => Seq(p._1, p._2)).map(x => x -> find(x)).toMap
    val got = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    // minhash pairs ⊆ truth pairs recall-wise; components over the SAME
    // pair set must match union-find over that pair set
    val parent2 = scala.collection.mutable.Map[Long, Long]()
    def find2(x: Long): Long = { val p = parent2.getOrElse(x, x); if (p == x) x else { val r = find2(p); parent2(x) = r; r } }
    val sparkPairs = pairs.as[(Long, Long)].collect()
    sparkPairs.foreach { case (a, b) => val (ra, rb) = (find2(a), find2(b)); if (ra != rb) parent2(math.max(ra, rb)) = math.min(ra, rb) }
    val wantSame = sparkPairs.flatMap(p => Seq(p._1, p._2)).map(x => x -> find2(x)).toMap
    assert(got === wantSame)
    assert(want.nonEmpty) // corpus really has duplicate groups
  }

  test("decontaminate flags train docs overlapping the benchmark, and only those") {
    val bench = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "one two three four five six seven eight nine ten")
    val train = docs(
      // verbatim copy of bench doc 1 behind a prefix → contaminated
      100L -> "prefix words then alpha beta gamma delta epsilon zeta eta theta iota kappa",
      // shares a run of bench doc 2 → contaminated (6 shared 3-grams)
      101L -> "two three four five six seven eight unrelated tail here",
      // shares only scattered words, no 3-gram runs → clean
      102L -> "alpha unrelated beta unrelated gamma unrelated delta unrelated",
      103L -> "totally fresh training content with no benchmark overlap at all")
    val got = Dedup.decontaminate(train, bench, n = 3, minShared = 5)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(got === Set((100L, 1L), (101L, 2L)), s"flagged $got")
  }

  test("decontaminateBloom is exactly decontaminate (bloom prunes, join confirms)") {
    // the planted-contamination shape q_decontaminate uses, plus the
    // near-dup corpus as a noisy training side
    val bench = corpus.filter("doc_id < 10")
    val train = corpus.filter("doc_id >= 10")
    def rows(df: DataFrame) = df.as[(Long, Long, Long)].collect().toSet
    val exact = rows(Dedup.decontaminate(train, bench, n = 3, minShared = 2))
    val bloom = rows(Dedup.decontaminateBloom(train, bench, n = 3, minShared = 2))
    assert(exact.nonEmpty, "fixture should contain contaminated docs")
    assert(bloom === exact)
    // a tight filter (low fpp) must not lose matches either
    assert(rows(Dedup.decontaminateBloom(train, bench, n = 3, minShared = 2,
      fpp = 0.0001)) === exact)
  }

  test("decontaminateWithFilter: frozen build+append artifact ≡ fresh decontaminate") {
    val path = java.nio.file.Files.createTempDirectory("graft-decontam-spec").toString
    val bench = corpus.filter("doc_id < 10")
    val train = corpus.filter("doc_id >= 10")
    def rows(df: DataFrame) = df.as[(Long, Long, Long)].collect().toSet
    Dedup.saveDecontaminationFilter(bench.filter("doc_id < 5"), path, n = 3)
    Dedup.appendToDecontaminationFilter(bench.filter("doc_id >= 5"), path)
    val exact = rows(Dedup.decontaminate(train, bench, n = 3, minShared = 2))
    assert(exact.nonEmpty, "fixture should contain contaminated docs")
    assert(rows(Dedup.decontaminateWithFilter(train, path, n = 3, minShared = 2)) === exact)
    // replayed append (same suite re-delivered) is a no-op: the
    // anti-join keeps duplicate rows out, the result is unchanged
    Dedup.appendToDecontaminationFilter(bench.filter("doc_id >= 5"), path)
    assert(rows(Dedup.decontaminateWithFilter(train, path, n = 3, minShared = 2)) === exact)
    // probing with an n different from build time fails loudly
    val e = intercept[IllegalArgumentException](
      Dedup.decontaminateWithFilter(train, path, n = 4, minShared = 2).collect())
    assert(e.getMessage.contains("n="))
    // a meta-less (crashed-build) artifact is rejected by every consumer
    val torn = java.nio.file.Files.createTempDirectory("graft-decontam-torn").toString
    spark.read.parquet(s"$path/grams").write.parquet(s"$torn/grams")
    intercept[IllegalArgumentException](
      Dedup.decontaminateWithFilter(train, torn, n = 3, minShared = 2).collect())
    intercept[IllegalArgumentException](
      Dedup.appendToDecontaminationFilter(bench, torn))
  }

  test("decontaminateNearDup flags approximate bench copies, not exact-gram-only overlap") {
    val bench = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon",
      2L -> "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen")
    val train = docs(
      // lightly edited copy of bench doc 1 → near-dup contamination
      100L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau revised",
      // shares a 6-gram run with bench 2 but most content differs →
      // exact decontamination would flag it, FUZZY must not (low Jaccard)
      101L -> "two three four five six seven eight unrelated tail content goes on and on entirely differently here now",
      102L -> "totally fresh training content with no benchmark overlap at all in any shingle window of any size")
    val got = Dedup.decontaminateNearDup(train, bench, threshold = 0.7)
      .as[(Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === Set((100L, 1L)), s"flagged ${got.toSeq}")
    assert(got.head._3 >= 0.7 && got.head._3 < 1.0)
    // and the exact-gram path does flag 101 — the two modes are
    // complements, not substitutes
    val exactFlags = Dedup.decontaminate(train, bench, n = 3, minShared = 4)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(exactFlags.contains((101L, 2L)))
  }

  test("passageDedup removes cross-doc repeated passages, keeps unique prose in order") {
    // passages are 4-token windows here; docs 1 and 2 share their first
    // 4 tokens exactly (a repeated boilerplate passage); doc 3 is unique
    val d = docs(
      1L -> "subscribe to our newsletter alpha beta gamma delta",
      2L -> "subscribe to our newsletter one two three four",
      3L -> "completely unique prose with eight distinct tokens here")
    val got = Dedup.passageDedup(d, window = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) === ((2L, 1L, "alpha beta gamma delta")))
    assert(got(2L) === ((2L, 1L, "one two three four")))
    assert(got(3L) === ((2L, 0L, "completely unique prose with eight distinct tokens here")))
  }

  test("passageDedup: duplicate WITHIN one doc survives; remainder window handled") {
    val d = docs(
      // 9 tokens → windows [a b c d] [a b c d] [x]: the repeat is
      // within ONE doc (distinct-doc count 1) so nothing is removed
      1L -> "a b c d a b c d x",
      2L -> "totally different content words")
    val got = Dedup.passageDedup(d, window = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) === ((3L, 0L, "a b c d a b c d x")))
    assert(got(2L) === ((1L, 0L, "totally different content words")))
  }

  test("minhashIncremental flags exactly the cross-split slice of the full self-join") {
    // split the fixture so the planted dups (base id i vs copy id
    // i+100/i+200) land one per side, and ask the incremental form
    // which "new" docs duplicate an "existing" one: the answer must be
    // the full self-join's pairs restricted to one endpoint per side
    // (same signatures, same banding, same verify — indexed differently)
    val existing = corpus.filter($"doc_id" < 100)
    val batch = corpus.filter($"doc_id" >= 100)
    val full = Dedup.minhashPairs(corpus)
      .as[(Long, Long, Double)].collect()
    val expected = full.flatMap { case (a, b, j) =>
      if (a < 100 && b >= 100) Some((b, a, j))
      else if (a >= 100 && b < 100) Some((a, b, j))
      else None
    }.toSet
    val got = Dedup.minhashIncremental(existing, batch)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty, "fixture must exercise at least one cross-split near-dup")
  }

  test("persisted LSH index: indexed probe ≡ in-memory incremental; append ≡ rebuild") {
    val existing = corpus.filter($"doc_id" < 100)
    val batch = corpus.filter($"doc_id" >= 100)
    val path = java.nio.file.Files.createTempDirectory("graft-lsh").toString
    // build on the first half of the corpus, append the second half:
    // probing the grown index must equal both the one-shot build and
    // the in-memory incremental over the same corpus
    val (h1, h2) = (existing.filter($"doc_id" < 20), existing.filter($"doc_id" >= 20))
    Dedup.buildLshIndex(h1, path)
    Dedup.appendToLshIndex(h2, path)
    val viaIndex = Dedup.minhashIncrementalIndexed(batch, path)
      .as[(Long, Long, Double)].collect().toSet
    val inMemory = Dedup.minhashIncremental(existing, batch)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaIndex === inMemory)
    assert(viaIndex.nonEmpty, "fixture must exercise at least one indexed hit")
  }

  test("ingest loop: later batches dedup against docs ACCEPTED in earlier batches") {
    // the property that makes the index incremental rather than a
    // cached self-join: batch 2's duplicate of a doc that only entered
    // the corpus via batch 1 must be caught, because batch 1's
    // accepted docs were appended to the index
    def words(seed: Int) = (1 to 30).map(i => s"w${seed}x$i").mkString(" ")
    val path = java.nio.file.Files.createTempDirectory("graft-loop").toString
    Dedup.buildLshIndex(docs(1L -> words(1), 2L -> words(2)), path)

    // batch 1: a near-dup of corpus doc 2 (one token changed) and a
    // genuinely new doc 11
    val nearDup2 = words(2).replace("w2x15", "zz")
    val batch1 = docs(10L -> nearDup2, 11L -> words(11))
    val flagged1 = Dedup.minhashIncrementalIndexed(batch1, path)
      .select("doc_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(flagged1 === Set((10L, 2L)))
    val accepted1 = batch1.filter(!$"doc_id".isin(flagged1.map(_._1).toSeq: _*))
    Dedup.appendToLshIndex(accepted1, path)

    // batch 2: an exact copy of doc 11 — which exists ONLY because
    // batch 1 was accepted into the index — plus another fresh doc
    val batch2 = docs(20L -> words(11), 21L -> words(21))
    val flagged2 = Dedup.minhashIncrementalIndexed(batch2, path)
      .select("doc_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(flagged2 === Set((20L, 11L)),
      "batch-2 duplicate of a batch-1-accepted doc must be flagged")
  }

  test("LSH index meta: parameter mismatch fails loudly, re-append does not duplicate") {
    def words(seed: Int) = (1 to 30).map(i => s"m${seed}x$i").mkString(" ")
    val path = java.nio.file.Files.createTempDirectory("graft-meta").toString
    Dedup.buildLshIndex(docs(1L -> words(1), 2L -> words(2)), path, bands = 16)
    // probing or appending with different LSH params than build time
    // would silently return wrong (mostly empty) candidates — it must
    // throw instead
    intercept[IllegalArgumentException] {
      Dedup.minhashIncrementalIndexed(docs(9L -> words(1)), path, bands = 8, rowsPerBand = 8)
    }
    intercept[IllegalArgumentException] {
      Dedup.appendToLshIndex(docs(9L -> words(9)), path, shingleK = 5)
    }
    // a retried append of the same batch must be a no-op, not a
    // duplication: doc 3 appended twice still verifies each pair once
    val b = docs(3L -> words(3))
    Dedup.appendToLshIndex(b, path)
    Dedup.appendToLshIndex(b, path)
    val out = Dedup.minhashIncrementalIndexed(docs(30L -> words(3)), path)
      .select("doc_id", "corpus_id").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((30L, 3L)), "re-append duplicated index rows")

    // compaction: append-accumulated part files collapse, probe
    // results are unchanged, meta survives
    def parts(sub: String) = new java.io.File(s"$path/$sub").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    (4L to 7L).foreach(i => Dedup.appendToLshIndex(docs(i -> words(i.toInt)), path))
    val before = Dedup.minhashIncrementalIndexed(docs(40L -> words(5)), path)
      .select("doc_id", "corpus_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(parts("bands") > 1, "fixture must accumulate multiple part files")
    Dedup.compactLshIndex(spark, path)
    assert(parts("bands") === 1 && parts("sketches") === 1, "compaction collapsed files")
    val after = Dedup.minhashIncrementalIndexed(docs(40L -> words(5)), path)
      .select("doc_id", "corpus_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(after === before && after === Set((40L, 5L, 1.0)),
      "compaction changed probe results")
  }

  test("dupSpans: unaligned shared span detected with exact run length; aligned passages miss it") {
    val a = (1 to 24).map(i => s"alpha$i")
    val fixture = Seq(
      (1L, a.mkString(" ")),                                // 24 tokens
      (2L, ("j1 j2 " + a.take(12).mkString(" "))),          // span shifted by 2
      (3L, (1 to 10).map(i => s"c$i").mkString(" ")))       // unique
      .toDF("doc_id", "text")
    val out = Dedup.dupSpans(fixture, window = 8)
      .select("doc_id", "n_windows", "n_dup", "dup_frac", "max_run")
      .as[(Long, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // shared 12-token span → 12 − 8 + 1 = 5 duplicated shingles in
    // BOTH copies, consecutively, regardless of the 2-token shift
    assert(out(1L) === ((1L, 17L, 5L, 0.2941, 5L)))
    assert(out(2L) === ((2L, 7L, 5L, 0.7143, 5L)))
    assert(out(3L) === ((3L, 3L, 0L, 0.0, 0L)))
    // the aligned-window census misses the same span entirely — the
    // gap dupSpans exists to close
    val aligned = Dedup.passageDedup(fixture, window = 8)
      .select("doc_id", "n_dup").as[(Long, Long)].collect()
    assert(aligned.forall(_._2 === 0L), "aligned passages must miss the shifted span")
  }

  test("stripDupSpans removes the shared span from ALL copies, keeps unique prose in order") {
    val a = (1 to 24).map(i => s"alpha$i")
    val fixture = Seq(
      (1L, a.mkString(" ")),                                // 24 tokens
      (2L, ("j1 j2 " + a.take(12).mkString(" "))),          // same 12-token span, shifted by 2
      (3L, (1 to 10).map(i => s"c$i").mkString(" ")))       // unique
      .toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(fixture, window = 8)
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // the 5 duplicated shingles (starts 0..4 in doc 1, 2..6 in doc 2)
    // cover exactly the shared 12 tokens in each copy
    assert(out(1L) === ((1L, 24L, 12L, a.drop(12).mkString(" "))))
    assert(out(2L) === ((2L, 14L, 12L, "j1 j2")))
    assert(out(3L) === ((3L, 10L, 0L, (1 to 10).map(i => s"c$i").mkString(" "))))
  }

  test("stripDupSpans: within-doc repetition alone never strips; short dup docs vanish") {
    val rep = ((1 to 8) ++ (1 to 8)).map(i => s"r$i").mkString(" ")
    val short = "tiny shared fragment"
    val fixture = Seq((1L, rep), (2L, short), (3L, short), (4L, "all by itself here"))
      .toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(fixture, window = 8)
      .select("doc_id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 0L && out(1L)._3 === rep,
      "within-doc repeat must survive (cross-DOC census)")
    // the 3-token docs share their single sub-window window → fully removed
    assert(out(2L) === ((2L, 3L, "")) && out(3L) === ((3L, 3L, "")))
    assert(out(4L)._2 === 0L)
  }

  test("boilerplateStrip: site-wide footer stripped, small-site and cross-site recurrence kept") {
    val footer = "visit our site for more info today ok" // 8 tokens = one window
    def uniq(seed: Int, n: Int) = (1 to n).map(i => s"u${seed}w$i").mkString(" ")
    val rows =
      // siteA: 5 docs of 16 unique tokens + the aligned footer window
      (1L to 5L).map(i => (i, "siteA", uniq(i.toInt, 16) + " " + footer)) ++ Seq(
        // siteB: one doc carries siteA's footer (cross-site — kept),
        // one doc is clean; a 2-doc recurrence would also be under minDocs
        (10L, "siteB", uniq(10, 8) + " " + footer),
        (11L, "siteB", uniq(11, 16)))
    val out = Dedup.boilerplateStrip(rows.toDF("doc_id", "source", "text"),
        minDocs = 3, minFrac = 0.5)
      .select("doc_id", "n_passages", "n_boiler", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // siteA: footer recurs in 5/5 docs ≥ minDocs and ≥ 50 % → stripped
    out.filter(_._1 <= 5L).foreach { case (id, np, nb, clean) =>
      assert(np === 3L && nb === 1L, s"doc $id")
      assert(clean === uniq(id.toInt, 16), s"doc $id keeps only its own content")
    }
    // siteB: the same footer appears in ONE siteB doc — census is
    // source-scoped, so it survives there
    val (_, np10, nb10, clean10) = out.find(_._1 == 10L).get
    assert(np10 === 2L && nb10 === 0L && clean10 === uniq(10, 8) + " " + footer)
    val (_, _, nb11, clean11) = out.find(_._1 == 11L).get
    assert(nb11 === 0L && clean11 === uniq(11, 16))
  }

  test("survivors: exactly one keeper per group — argmax quality, tie toward min id") {
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "group_id")
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (10L, 0.1), (11L, 0.1))
      .toDF("doc_id", "quality")
    val out = Dedup.survivors(groups, scores)
      .select("group_id", "doc_id", "keep")
      .as[(Long, Long, Boolean)].collect()
    assert(out.length === 5, "every group member comes back, flagged")
    val keepers = out.filter(_._3).map(r => r._1 -> r._2).toMap
    // group 1: quality tie 0.9 between docs 2 and 3 → min id 2 wins
    // group 10: quality tie 0.1 between 10 and 11 → min id 10 wins
    assert(keepers === Map(1L -> 2L, 10L -> 10L))
    assert(out.count(_._3) === 2, "one keeper per group, no more")
  }

  test("survivors: keeper join shuffles (no broadcast) and is layout-independent") {
    // group count is corpus-proportional, so the keeper table must
    // never be broadcast — and the argmax must not depend on how the
    // input happens to be partitioned
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "group_id")
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (10L, 0.1), (11L, 0.1))
      .toDF("doc_id", "quality")
    val base = Dedup.survivors(groups, scores)
    assert(!base.queryExecution.sparkPlan.toString.contains("BroadcastExchange"),
      "survivors must not statically broadcast any side")
    val expected = base.select("group_id", "doc_id", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    for ((gp, sp) <- Seq((1, 7), (7, 1), (5, 3))) {
      val got = Dedup.survivors(groups.repartition(gp), scores.repartition(sp))
        .select("group_id", "doc_id", "keep")
        .as[(Long, Long, Boolean)].collect().toSet
      assert(got === expected, s"layout ($gp, $sp) changed the survivor set")
    }
  }
}
