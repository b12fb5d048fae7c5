package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity join — the fuzzy-string
  * complement of [[SetSimilarityJoin]]: find (left, right) pairs with
  * levenshtein ≤ k without the all-pairs product. Titles, names,
  * near-identical boilerplate lines — the record-linkage staple.
  *
  * Candidate generation is q-gram PREFIX filtering (Ed-Join, Xiao
  * 2008; the same prefix principle as [[SetSimilarityJoin]]): a pair
  * within edit distance k shares at least
  * t = max(|a|,|b|) − q + 1 − k·q of its q-gram OCCURRENCES (each
  * edit destroys at most q grams — Gravano 2001), so by the prefix
  * lemma the k·q + 1 globally-RAREST gram occurrences of each string
  * must already intersect. Only those prefixes are joined — a hot
  * gram like "e " never fans out unless it is among a string's
  * rarest, which by construction it is not. Grams are matched as
  * (gram, occurrence-index) pairs, a true MULTISET intersection
  * (distinct-set matching would under-count repeats — "aaaa" has
  * three "aa" occurrences but one distinct gram — and silently drop
  * true pairs). The global rarity order is computed over BOTH sides'
  * gram rows, so the two prefixes order consistently.
  *
  * Pairs whose bound is non-positive (both strings shorter than
  * q·(k+1)) can evade the gram filter entirely and go through a
  * length-banded path instead; the two paths partition the pair
  * space (the gram path requires max-length ≥ q·(k+1)), so no pair
  * is emitted twice. Every candidate is verified with an exact
  * levenshtein — the filters only prune, never decide.
  *
  * Scale shape: one gram explode per side (rows ∝ total characters),
  * one vocabulary-sized frequency aggregate, per-string top-(kq+1)
  * selection (window over the string's own ≤ |s| grams), an
  * equi-join of prefix rows on (gram, occ) — never a theta join —
  * and a hash join back to the strings for the verify (Spark's
  * thresholded levenshtein exits early past k). The short-string
  * band path explodes 2k+1 length keys per row over the SHORT subset
  * only, a sliver for title/name workloads.
  *
  * Determinism: gram positions, occurrence indices, frequency ranks
  * (tie-broken on (gram, occ)) and the final distances are all
  * integer/string ops that replay verbatim in DuckDB (levenshtein
  * included) — q_editdist_join is value-exact. */
object FuzzyJoin {

  /** (id, s, len, g, occ) — grams carry their per-gram occurrence
    * index so downstream joins intersect MULTISETS. Strings shorter
    * than q yield no rows (they only pair through the short path). */
  private def gramRows(df: DataFrame, idCol: String, strCol: String,
                       q: Int, side: String): DataFrame =
    df.select(col(idCol).as(s"${side}_id"), col(strCol).as(s"${side}_s"),
        length(col(strCol)).as(s"${side}_len"))
      .select(col(s"${side}_id"), col(s"${side}_s"), col(s"${side}_len"),
        posexplode(expr(
          s"CASE WHEN ${side}_len >= $q THEN " +
            s"transform(sequence(0, ${side}_len - $q), i -> substring(${side}_s, i + 1, $q)) " +
            "ELSE array() END")).as(Seq("pos", "g")))
      .withColumn("occ", row_number().over(
        Window.partitionBy(col(s"${side}_id"), col("g")).orderBy(col("pos"))))
      .drop("pos")

  /** Keep each string's kq+1 rarest (g, occ) keys under the shared
    * global order (df asc, g, occ). */
  private def prefixRows(grams: DataFrame, dfreq: DataFrame,
                         side: String, prefixLen: Int): DataFrame =
    grams.join(dfreq.hint("shuffle_hash"), Seq("g", "occ"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(s"${side}_id"))
          .orderBy(col("df"), col("g"), col("occ"))))
      .filter(col("rk") <= prefixLen)
      .select(col(s"${side}_id"), col(s"${side}_s"), col(s"${side}_len"),
        col("g"), col("occ"))

  /** All (a_id, b_id, dist) with levenshtein(a_s, b_s) ≤ k. Inputs
    * carry (idCol, strCol); ids must be unique per side. Self-join
    * callers filter `a_id < b_id` afterwards. */
  def editDistanceJoin(left: DataFrame, right: DataFrame,
                       idCol: String, strCol: String,
                       k: Int, q: Int = 2): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in 1..8, got $k")
    require(q >= 2 && q <= 4, s"q must be in 2..4, got $q")
    val minLong = q * (k + 1) // gram bound positive iff max len ≥ this
    val prefixLen = k * q + 1
    // pin the inputs: each side feeds its gram explode, the shared
    // frequency table, the short band path and the verify strings —
    // without the checkpoint every consumer re-derives the source
    // subtree (an 18-scan plan on the registry fixture)
    val lSrc = Checkpoints.pin(left.select(col(idCol), col(strCol)))
    val rSrc = if (right eq left) lSrc
      else Checkpoints.pin(right.select(col(idCol), col(strCol)))
    // loud unique-id guard (the generated oracle replays duplicate-id
    // corruption identically, so no downstream gate would catch it)
    requireUniqueIds(lSrc, idCol, "left")
    if (!(right eq left)) requireUniqueIds(rSrc, idCol, "right")
    val selfJoin = right eq left
    val ga = gramRows(lSrc, idCol, strCol, q, "a")
    val gb = if (selfJoin) null else gramRows(rSrc, idCol, strCol, q, "b")
    // one shared rarity order over both sides' gram occurrences —
    // vocab-sized, consumed by both prefix selections. Self-join:
    // count ONE side; the two-side union would exactly double every
    // count, and the prefix selection depends only on the ORDER
    // (df asc, g, occ), which a monotone doubling cannot change — so
    // the selected prefixes, hence the result, are identical (the
    // oracle keeps the doubled form; both verify to the same pairs)
    val dfreq = (if (selfJoin) ga.select(col("g"), col("occ"))
      else ga.select(col("g"), col("occ"))
        .unionByName(gb.select(col("g"), col("occ"))))
      .groupBy("g", "occ").agg(count(lit(1)).as("df"))
      .transform(Checkpoints.pin)
    // self-join: ONE gram explode + ONE prefix window pass, pinned,
    // then renamed for the b side — halves the dominant stages
    val pa = if (selfJoin) Checkpoints.pin(prefixRows(ga, dfreq, "a", prefixLen))
      else prefixRows(ga, dfreq, "a", prefixLen)
    val pb = if (selfJoin)
      pa.select(col("a_id").as("b_id"), col("a_s").as("b_s"),
        col("a_len").as("b_len"), col("g"), col("occ"))
      else prefixRows(gb, dfreq, "b", prefixLen)
    val verifyCols = Seq(col("a_id"), col("b_id"),
      levenshtein(col("a_s"), col("b_s"), k).as("dist"))
    // The candidate join is CPU-dense and byte-light (its output is
    // pairs of short strings, its work is hash-probing plus the
    // per-candidate length filters feeding the exact verify), so
    // AQE's byte-based partition coalescing collapses it to ONE task
    // — a 2.6 s serial stage on the sf0.1 bench while 31 cores idle
    // (guide §2.5: a partition's cost is not its bytes). Explicit
    // same-key repartitioning at the session's shuffle parallelism
    // pins the planner's own pre-AQE width — scale-parameterised via
    // spark.sql.shuffle.partitions, no new exchange (the join needs
    // this exact hash partitioning; AQE honors user-specified counts).
    val nVerify = left.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val gramPairs = pa.repartition(nVerify, col("g"), col("occ"))
      .join(pb.repartition(nVerify, col("g"), col("occ")).hint("shuffle_hash"),
        Seq("g", "occ"))
      .filter(abs(col("a_len") - col("b_len")) <= k)
      .filter(greatest(col("a_len"), col("b_len")) >= minLong)
      .select("a_id", "a_s", "b_id", "b_s").distinct()
      .select(verifyCols: _*)
    // short path: BOTH sides under the gram-bound floor — banded
    // equi-join on candidate length (2k+1 keys per row), never a
    // cartesian
    val shortA = lSrc
      .select(col(idCol).as("a_id"), col(strCol).as("a_s"),
        length(col(strCol)).as("a_len"))
      .filter(col("a_len") < minLong)
      .withColumn("cand_len",
        explode(sequence(col("a_len") - k, col("a_len") + k)))
    val shortB = rSrc
      .select(col(idCol).as("b_id"), col(strCol).as("b_s"),
        length(col(strCol)).as("cand_len"))
      .filter(col("cand_len") < minLong)
    val shortPairs = shortA.join(shortB.hint("shuffle_hash"), Seq("cand_len"))
      .select(verifyCols: _*)
    gramPairs.unionByName(shortPairs)
      .filter(col("dist") >= 0 && col("dist") <= k)
  }

  /** The record-linkage deployment form of [[editDistanceJoin]]: a
    * SMALL dirty `probe` batch resolved against a large clean
    * `catalog` — same output contract (all (a_id, b_id, dist) with
    * levenshtein ≤ k, probe ids on the a side), restructured around
    * the size asymmetry so the catalog pays its heavy passes ONCE
    * and nothing probe-sized ever shuffles the catalog:
    *
    *  - the rarity order is the CATALOG's gram-occurrence frequency
    *    alone; probe grams absent from the catalog take df = 0 (the
    *    rarest possible). The Ed-Join prefix lemma needs only a
    *    SHARED total order on (gram, occ) keys — df is a fixed
    *    function of the key, so completeness is untouched; the
    *    general form's two-sided union order is a constant-factor
    *    pruning tweak, not a correctness requirement (the verify
    *    decides every pair either way, and FuzzyJoinSpec pins
    *    lookup ≡ general ≡ brute force).
    *  - the probe's prefix rows and its short-path rows BROADCAST
    *    onto the catalog's — the catalog's prefix table is joined
    *    where its own window pass left it, never reshuffled by
    *    (g, occ), and the per-(g, occ) fan-out is bounded by the
    *    probe's kq+1-row prefixes.
    *
    * vs the general form on the registry fixture: 12 shuffles → the
    * catalog's two window passes + frequency agg + candidate dedup.
    * Contract: the probe side must be broadcastable (a dirty inbound
    * batch — thousands of rows, not a corpus); for two corpus-sized
    * sides use [[editDistanceJoin]]. */
  def editDistanceLookup(probe: DataFrame, catalog: DataFrame,
                         idCol: String, strCol: String,
                         k: Int, q: Int = 2): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in 1..8, got $k")
    require(q >= 2 && q <= 4, s"q must be in 2..4, got $q")
    val pSrc = Checkpoints.pin(probe.select(col(idCol), col(strCol)))
    val cSrc = Checkpoints.pin(catalog.select(col(idCol), col(strCol)))
    requireUniqueIds(pSrc, idCol, "probe")
    requireUniqueIds(cSrc, idCol, "catalog")
    val (dfreq, pb, shortB) = catalogTables(cSrc, idCol, strCol, k, q)
    probeLookup(pSrc, dfreq, pb, shortB, idCol, strCol, k, q)
  }

  /** The catalog's three derived tables — the heavy half of
    * [[editDistanceLookup]], factored out so [[FuzzyLinkIndex]] can
    * PERSIST exactly what the recompute path derives (index ≡
    * recompute is structural, not re-implemented):
    *  - `dfreq` (g, occ, df): the catalog-only gram-occurrence rarity
    *    order (a GRAM VOCABULARY — bounded by alphabet^q × repeat
    *    count, never corpus-proportional);
    *  - `prefix` (b_id, b_s, b_len, g, occ): each catalog string's
    *    kq+1 rarest keys under that order;
    *  - `short` (b_id, b_s, cand_len): the under-gram-bound strings
    *    keyed by their exact length for the band path. */
  private[operators] def catalogTables(cSrc: DataFrame, idCol: String,
      strCol: String, k: Int, q: Int): (DataFrame, DataFrame, DataFrame) = {
    val gb = catalogGramRows(cSrc, idCol, strCol, q)
    val dfreq = gb.select(col("g"), col("occ"))
      .groupBy("g", "occ").agg(count(lit(1)).as("df"))
      .transform(Checkpoints.pin)
    catalogTablesFromGrams(cSrc, gb, dfreq, idCol, strCol, k, q)
  }

  /** The catalog's raw gram tier — [[gramRows]] under the catalog's
    * "b" side naming: (b_id, b_s, b_len, g, occ). Derivation is
    * per-string (explode ∝ characters + the per-(id, g) occ window),
    * which is what lets [[FuzzyLinkIndex]] PERSIST it per version and
    * pay it only for NEW catalog rows on refresh. */
  private[operators] def catalogGramRows(cSrc: DataFrame, idCol: String,
      strCol: String, q: Int): DataFrame =
    gramRows(cSrc, idCol, strCol, q, "b")

  /** [[catalogTables]]'s selection half, from ALREADY-DERIVED gram
    * rows and a selection ORDER table — the path an incremental
    * refresh takes (persisted grams ∪ new strings' grams). The
    * prefix-filter lemma needs one total order on (gram, occ) keys
    * SHARED by catalog and probe (Xiao 2008) — but ANY fixed order is
    * complete (the verify decides every candidate); the true
    * frequency order is only the optimal PRUNING choice. So `order`
    * may be the fresh folded frequencies (a re-rank epoch) or a
    * served version's pinned epoch order (r18 verdict #4 — selection
    * cost ∝ new strings instead of re-ranking the whole catalog per
    * refresh); grams absent from it rank rarest (df = 0, ties by
    * (g, occ)), exactly [[probeLookup]]'s rule, so the two sides
    * can never order a key differently. Structurally the same
    * selection code the from-scratch derivation runs (for which
    * `order` covers every gram and the left join degenerates to the
    * inner), so incremental ≡ from-scratch is by construction. */
  private[operators] def catalogTablesFromGrams(cSrc: DataFrame, gb: DataFrame,
      order: DataFrame, idCol: String, strCol: String,
      k: Int, q: Int): (DataFrame, DataFrame, DataFrame) = {
    val minLong = q * (k + 1)
    val prefixLen = k * q + 1
    // Same §2.5 width pin as editDistanceJoin's candidate stage (r21,
    // driver-confirmed 1.48×): the df-attach join and the per-string
    // prefix window are CPU-dense and byte-light, so AQE's byte-based
    // coalescing collapses each to ONE task (two ~0.5 s serial stages
    // on the sf0.1 lookup probe). Explicit same-key repartitions at
    // the session's shuffle parallelism pin the planner's own pre-AQE
    // width — each sits exactly where the join/window already requires
    // that hash distribution, so NO extra exchange is added.
    val nW = cSrc.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val pb = gb.repartition(nW, col("g"), col("occ"))
      .join(order.hint("shuffle_hash"), Seq("g", "occ"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .repartition(nW, col("b_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("b_id"))
          .orderBy(col("df"), col("g"), col("occ"))))
      .filter(col("rk") <= prefixLen)
      .select(col("b_id"), col("b_s"), col("b_len"), col("g"), col("occ"))
    val shortB = cSrc
      .select(col(idCol).as("b_id"), col(strCol).as("b_s"),
        length(col(strCol)).as("cand_len"))
      .filter(col("cand_len") < minLong)
    (order, pb, shortB)
  }

  /** The probe-side serving half of [[editDistanceLookup]]: resolve a
    * small dirty batch against the catalog's three derived tables
    * (from [[catalogTables]] live, or read back from a
    * [[FuzzyLinkIndex]] version — same schemas, same plan). Probe
    * prefixes rank under the catalog's order; absent grams rank
    * rarest (df = 0), ties broken (g, occ) as everywhere. The df
    * attach BROADCASTS the frequency table so neither side is
    * exchanged by (g, occ) for a probe-sized lookup, and the probe's
    * prefix/short rows broadcast onto the catalog's — the catalog
    * tables are joined where they stand, never reshuffled by a
    * probe-sized key. */
  private[operators] def probeLookup(pSrc: DataFrame, dfreq: DataFrame,
      pb: DataFrame, shortB: DataFrame, idCol: String, strCol: String,
      k: Int, q: Int): DataFrame = {
    val minLong = q * (k + 1)
    val prefixLen = k * q + 1
    val ga = gramRows(pSrc, idCol, strCol, q, "a")
    val pa = ga.join(broadcast(dfreq), Seq("g", "occ"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("a_id"))
          .orderBy(col("df"), col("g"), col("occ"))))
      .filter(col("rk") <= prefixLen)
      .select(col("a_id"), col("a_s"), col("a_len"), col("g"), col("occ"))
    val verifyCols = Seq(col("a_id"), col("b_id"),
      levenshtein(col("a_s"), col("b_s"), k).as("dist"))
    val gramPairs = broadcast(pa).join(pb, Seq("g", "occ"))
      .filter(abs(col("a_len") - col("b_len")) <= k)
      .filter(greatest(col("a_len"), col("b_len")) >= minLong)
      .select("a_id", "a_s", "b_id", "b_s").distinct()
      .select(verifyCols: _*)
    val shortA = pSrc
      .select(col(idCol).as("a_id"), col(strCol).as("a_s"),
        length(col(strCol)).as("a_len"))
      .filter(col("a_len") < minLong)
      .withColumn("cand_len",
        explode(sequence(col("a_len") - k, col("a_len") + k)))
    val shortPairs = broadcast(shortA).join(shortB, Seq("cand_len"))
      .select(verifyCols: _*)
    gramPairs.unionByName(shortPairs)
      .filter(col("dist") >= 0 && col("dist") <= k)
  }

  /** Duplicate ids don't error downstream — they MERGE two strings'
    * gram partitions, so each keeps fewer than its kq+1 rarest grams
    * and true matches are silently pruned before the verify. Two
    * cheap aggs buy a loud failure instead. */
  private[operators] def requireUniqueIds(src: DataFrame, idCol: String, side: String): Unit = {
    val Array(n, d) = src
      .agg(count(lit(1)), count_distinct(col(idCol))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    require(n == d, s"edit-distance join: $side ids are not unique " +
      s"($n rows, $d distinct $idCol) — duplicate ids merge gram " +
      "partitions and silently drop true matches")
  }

  /** The DuckDB replay of [[editDistanceJoin]] for WITH-scope
    * relations `sa` (a_id, a_s) and `sb` (b_id, b_s) — emitted from
    * the same constants; closes over a relation `ed` (a_id, b_id,
    * dist). The prefix selection replays exactly: same rarity order,
    * same tie-breaks, same prefix length. */
  def editDistanceJoinSql(k: Int, q: Int = 2): String = {
    val minLong = q * (k + 1)
    val prefixLen = k * q + 1
    def gramCte(side: String) =
      s"""${side}g AS (
         |  SELECT ${side}_id, ${side}_s, length(${side}_s) AS ${side}_len, g,
         |         row_number() OVER (PARTITION BY ${side}_id, g ORDER BY pos) AS occ
         |  FROM (
         |    SELECT ${side}_id, ${side}_s,
         |           unnest(list_transform(range(greatest(length(${side}_s) - $q + 1, 0)),
         |                                 i -> substring(${side}_s, i + 1, $q))) AS g,
         |           unnest(range(greatest(length(${side}_s) - $q + 1, 0))) AS pos
         |    FROM s${side}))"""
    def prefixCte(side: String) =
      s"""${side}p AS (
         |  SELECT ${side}_id, ${side}_s, ${side}_len, g, occ
         |  FROM (
         |    SELECT ${side}g.*, row_number() OVER (
         |      PARTITION BY ${side}_id ORDER BY fq.df, g, occ) AS rk
         |    FROM ${side}g JOIN fq USING (g, occ))
         |  WHERE rk <= $prefixLen)"""
    s"""${gramCte("a")},
       |${gramCte("b")},
       |fq AS (
       |  SELECT g, occ, count(*) AS df
       |  FROM (SELECT g, occ FROM ag UNION ALL SELECT g, occ FROM bg)
       |  GROUP BY g, occ),
       |${prefixCte("a")},
       |${prefixCte("b")},
       |gcand AS (
       |  SELECT DISTINCT a_id, a_s, b_id, b_s
       |  FROM ap JOIN bp USING (g, occ)
       |  WHERE abs(a_len - b_len) <= $k AND greatest(a_len, b_len) >= $minLong),
       |scand AS (
       |  SELECT a.a_id, a.a_s, b.b_id, b.b_s
       |  FROM sa a JOIN sb b
       |    ON abs(length(a.a_s) - length(b.b_s)) <= $k
       |  WHERE length(a.a_s) < $minLong AND length(b.b_s) < $minLong),
       |ed AS (
       |  SELECT a_id, b_id, CAST(levenshtein(a_s, b_s) AS INTEGER) AS dist
       |  FROM (SELECT * FROM gcand UNION ALL SELECT * FROM scand)
       |  WHERE levenshtein(a_s, b_s) <= $k)"""
  }
}
