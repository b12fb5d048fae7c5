package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the
  * corpus-scale half of building a tokenizer (Sennrich et al. 2016,
  * public algorithm). The reference has no tokenizer, but a training
  * -data engine feeding an LLM does: merge rules must be learned over
  * the SAME corpus the engine curates.
  *
  * Scale shape (100 TB): the ONLY corpus-scale step is [[wordCensus]]
  * — one tokenize + one shuffle into (word, count). Everything after
  * operates on the census, whose size is the VOCABULARY (tens of
  * millions of rows at web scale), not the corpus. Each merge
  * iteration is one hash aggregation over the census plus a map-only
  * string rewrite; [[Checkpoints.pin]] truncates the iteration lineage
  * so the plan stays flat. The winning pair per iteration is a 1-row
  * collect — the merge DECISION is driver-side by construction
  * (it is a global argmax), the counting never is.
  *
  * Word representation: symbols are wrapped as \u0001 sym \u0002 and
  * concatenated, so applying a merge is ONE literal `replace` (Java
  * and DuckDB share its non-overlapping left-to-right scan, which IS
  * greedy BPE merge order) and never touches symbol or word
  * boundaries. Engine-portable: the whole learn loop — census, pair
  * counts, argmax, rewrite — replays in DuckDB SQL, so the merge
  * table itself is oracle-checkable (q_bpe_learn).
  */
object BpeTrainer {

  /** Symbol-boundary delimiters. Control chars never produced by
    * [[TextStats.normalize]]d text; [[wordCensus]] drops the (absurd)
    * words containing them rather than corrupt the representation. */
  val D1 = "\u0001"
  val D2 = "\u0002"

  /** (word, wc) census — the one corpus-scale pass. */
  def wordCensus(docs: DataFrame): DataFrame =
    docs.select(explode(TextStats.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "" &&
        !col("word").contains(D1) && !col("word").contains(D2))
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Initial symbolization: every char wrapped (\u0001 c \u0002). */
  def wrap(word: Column): Column =
    regexp_replace(word, "(.)", D1 + "$1" + D2)

  /** Symbol array of a wrapped string. */
  def symsOf(wstr: Column): Column =
    split(regexp_replace(wstr, s"^$D1|$D2$$", ""), D2 + D1)

  /** Adjacent-symbol pair counts weighted by word count, over a census
    * with a `wstr` column. One hash aggregation; vocabulary-sized. */
  def pairCounts(census: DataFrame): DataFrame = {
    val syms = symsOf(col("wstr"))
    val idx = when(size(syms) >= 2, sequence(lit(1), size(syms) - 1))
      .otherwise(array().cast("array<int>"))
    census
      .select(col("wc"), syms.as("s"), idx.as("idx"))
      .select(col("wc"), explode(col("idx")).as("j"), col("s"))
      .select(col("wc"), element_at(col("s"), col("j")).as("lhs"),
        element_at(col("s"), col("j") + 1).as("rhs"))
      .groupBy("lhs", "rhs").agg(sum(col("wc")).as("pc"))
  }

  /** The literal `replace` applying merge (lhs, rhs) to a wrapped
    * string — shared by [[learn]]'s census rewrite and [[encode]]. */
  private def applyMerge(wstr: Column, lhs: String, rhs: String): Column =
    replace(wstr, lit(D1 + lhs + D2 + D1 + rhs + D2), lit(D1 + lhs + rhs + D2))

  /** Learn `nMerges` merge rules over the corpus. Returns
    * (rank, lhs, rhs, pc) — rank 1 = first merge learned. Ties break
    * deterministically on (pc desc, lhs, rhs): binary string order,
    * identical in Spark and DuckDB (UTF-8 order = code-point order). */
  def learn(spark: SparkSession, docs: DataFrame, nMerges: Int): DataFrame = {
    var census = wordCensus(docs)
      .select(wrap(col("word")).as("wstr"), col("wc"))
      .transform(Checkpoints.pin)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var i = 1
    var done = false
    while (i <= nMerges && !done) {
      val best = pairCounts(census)
        .orderBy(col("pc").desc, col("lhs"), col("rhs")).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (lhs, rhs, pc) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((i, lhs, rhs, pc))
        census = census
          .withColumn("wstr", applyMerge(col("wstr"), lhs, rhs))
          .transform(Checkpoints.pin)
        i += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "lhs", "rhs", "pc")
  }

  /** Encode documents with a learned merge list: tokens wrapped,
    * merges applied IN RANK ORDER (the BPE reference semantics),
    * words joined with ' ' so no merge crosses a word boundary.
    * Returns (doc_id, enc) where `enc` is the wrapped encoding —
    * count tokens with [[tokenCount]], split with [[symsOf]] per
    * word. Map-only, fully codegen'd (a chain of literal replaces);
    * for production-size merge tables (30k rules, where a 30k-deep
    * expression would not codegen) use [[encodeLarge]]. */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val encTok = (t: Column) =>
      merges.foldLeft(wrap(t)) { case (e, (l, r)) => applyMerge(e, l, r) }
    docs.select(col("doc_id"),
      concat_ws(" ",
        transform(filter(TextStats.tokens(col("text")),
          t => t =!= "" && !t.contains(D1) && !t.contains(D2)),
          encTok)).as("enc"))
  }

  /** BPE token count of a wrapped encoding: one \u0001 per symbol. */
  def tokenCount(enc: Column): Column =
    length(enc) - length(replace(enc, lit(D1)))

  /** [[encode]] for production-size merge tables: merges broadcast to
    * a typed per-partition loop (rank-ordered scan-merge per rule,
    * same greedy left-to-right semantics as the literal replace).
    * Output is byte-identical to [[encode]] (BpeSpec pins it). */
  def encodeLarge(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(merges)
    import spark.implicits._
    val src = docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
    src.mapPartitions { it =>
      val rules = bc.value
      it.map { case (id, text) =>
        val words = text.trim.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(w => w.nonEmpty && !w.contains(D1) && !w.contains(D2))
        val enc = words.map { w =>
          // symbolize per CODE POINT (not UTF-16 unit) to match wrap's
          // regex '(.)' — a supplementary-plane char is ONE symbol on
          // both paths, keeping encode ≡ encodeLarge byte-identical
          var syms = scala.collection.mutable.ArrayBuffer(
            w.codePoints().toArray.map(cp => new String(Character.toChars(cp))): _*)
          for ((l, r) <- rules) {
            var j = 0
            while (j < syms.length - 1) {
              if (syms(j) == l && syms(j + 1) == r) {
                syms(j) = l + r
                syms.remove(j + 1)
              }
              j += 1
            }
          }
          syms.map(s => D1 + s + D2).mkString
        }.mkString(" ")
        (id, enc)
      }
    }.toDF("doc_id", "enc")
  }

  /** Post-merge vocabulary census: (sym, n) token-weighted symbol
    * counts after applying `merges` to the word census — the symbol
    * table a loader ships beside the merge rules. Vocabulary-sized
    * work (the census is the input), one hash aggregation. */
  def vocab(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val applied = merges.foldLeft(wrap(col("word"))) {
      case (e, (l, r)) => applyMerge(e, l, r)
    }
    wordCensus(docs)
      .select(applied.as("wstr"), col("wc"))
      .select(explode(symsOf(col("wstr"))).as("sym"), col("wc"))
      .groupBy("sym").agg(sum(col("wc")).as("n"))
  }

  /** Persist a learned merge table as a tokenizer artifact — the
    * third thing (after indexes and ML models) a 100 TB pipeline
    * trains once and ships everywhere: the encode pass on every
    * ingest batch must use the EXACT merge list the corpus was
    * curated with, so it lives on disk with an integrity meta, not
    * in a notebook. Rank order is the artifact's semantics
    * ([[encode]] applies rules in rank order), hence the meta pins
    * the rule count and [[loadMerges]] re-sorts by rank. */
  def saveMerges(merges: DataFrame, path: String): Unit = {
    val spark = merges.sparkSession
    val n = merges.count()
    merges.coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    graft.sources.IndexMeta.write(spark, s"$path/meta.json", Seq("nMerges" -> n))
  }

  /** Load a persisted merge table, rank-ordered, integrity-checked
    * against its meta (a lost or duplicated rule row fails loudly). */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] = {
    val df = spark.read.parquet(s"$path/merges")
    graft.sources.IndexMeta.check(spark, s"$path/meta.json", "BPE merges",
      Seq("nMerges" -> df.count()))
    df.orderBy("rank").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
  }

  /** The DuckDB replay of [[learn]] — `nMerges` chained CTE rounds of
    * (pair count → argmax → rewrite) over `table`'s text column,
    * emitted as the oracle for q_bpe_learn. Kept HERE so the SQL and
    * the Scala loop evolve together. */
  def learnOracleSql(table: String, nMerges: Int): String = {
    val union = (1 to nMerges)
      .map(i => s"SELECT CAST($i AS BIGINT) AS rank, lhs, rhs, pc FROM best$i")
      .mkString("\nUNION ALL ")
    s"${learnCtes(table, nMerges)}\n$union\nORDER BY rank"
  }

  /** Shared CTE prefix (census + `nMerges` merge rounds, ending at
    * `words<nMerges>`/`best<i>`), consumed by [[learnOracleSql]],
    * [[vocabOracleSql]] and [[encodeOracleSql]]. */
  private def learnCtes(table: String, nMerges: Int): String = {
    require(nMerges >= 1, s"nMerges=$nMerges: the oracle CTE chain needs ≥1 round")
    val census =
      s"""words0 AS (
         |  SELECT regexp_replace(w, '(.)', chr(1)||'\\1'||chr(2), 'g') AS wstr,
         |         count(*) AS wc
         |  FROM (SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS w
         |        FROM $table) t
         |  WHERE w <> '' AND w NOT LIKE '%'||chr(1)||'%' AND w NOT LIKE '%'||chr(2)||'%'
         |  GROUP BY 1)""".stripMargin
    val rounds = (1 to nMerges).map { i =>
      val prev = s"words${i - 1}"
      s"""pairs$i AS (
         |  SELECT s[j] AS lhs, s[j+1] AS rhs, CAST(sum(wc) AS BIGINT) AS pc
         |  FROM (SELECT string_split(trim(wstr, chr(1)||chr(2)), chr(2)||chr(1)) AS s, wc
         |        FROM $prev) t, unnest(range(1, len(s))) AS u(j)
         |  GROUP BY 1, 2),
         |best$i AS (SELECT lhs, rhs, pc FROM pairs$i ORDER BY pc DESC, lhs, rhs LIMIT 1),
         |words$i AS (
         |  SELECT replace(wstr, chr(1)||b.lhs||chr(2)||chr(1)||b.rhs||chr(2),
         |                 chr(1)||b.lhs||b.rhs||chr(2)) AS wstr, wc
         |  FROM $prev, best$i b)""".stripMargin
    }
    s"WITH $census,\n${rounds.mkString(",\n")}"
  }

  /** The DuckDB replay of [[learn]]+[[vocab]]: the top-`k` symbol
    * census over the post-merge word table. */
  def vocabOracleSql(table: String, nMerges: Int, k: Int): String =
    s"""${learnCtes(table, nMerges)},
       |syms AS (
       |  SELECT unnest(string_split(trim(wstr, chr(1)||chr(2)), chr(2)||chr(1))) AS sym, wc
       |  FROM words$nMerges)
       |SELECT sym, CAST(sum(wc) AS BIGINT) AS n
       |FROM syms GROUP BY sym ORDER BY n DESC, sym LIMIT $k""".stripMargin

  /** The DuckDB replay of [[learn]]+[[encode]]: re-learns the merge
    * rounds, then applies them to every document as the same nested
    * literal replaces, emitting per-doc BPE token count and an md5
    * fingerprint of the full encoding — one wrong merge, ordering, or
    * boundary byte shifts the hash. */
  def encodeOracleSql(table: String, nMerges: Int): String = {
    val wrapped =
      "array_to_string(list_transform(list_filter(string_split(norm, ' '), " +
        "w -> w <> '' AND NOT contains(w, chr(1)) AND NOT contains(w, chr(2))), " +
        "w -> regexp_replace(w, '(.)', chr(1)||'\\1'||chr(2), 'g')), ' ')"
    val applied = (1 to nMerges).foldLeft(wrapped) { (e, i) =>
      s"replace($e, chr(1)||b$i.lhs||chr(2)||chr(1)||b$i.rhs||chr(2), " +
        s"chr(1)||b$i.lhs||b$i.rhs||chr(2))"
    }
    val bests = (1 to nMerges).map(i => s"best$i b$i").mkString(", ")
    s"""${learnCtes(table, nMerges)},
       |enc AS (
       |  SELECT doc_id, $applied AS e
       |  FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
       |        FROM $table) d, $bests)
       |SELECT doc_id,
       |       CAST(length(e) - length(replace(e, chr(1), '')) AS BIGINT) AS n_bpe,
       |       md5(e) AS fp
       |FROM enc ORDER BY doc_id""".stripMargin
  }
}
