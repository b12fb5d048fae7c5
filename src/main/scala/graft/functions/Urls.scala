package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain extraction — the
  * CCNet/RefinedWeb stage BEFORE source-scoped dedup and per-domain
  * curation: raw crawl URLs vary in case, default ports, `www.`,
  * fragments, trailing slashes and tracking parameters, so grouping by
  * the raw string undercounts duplicates and splinters domains.
  *
  * Pure string expressions (regexp chains + array ops) — map-only,
  * codegen'd, no UDF — and every step replays in DuckDB's RE2, so the
  * canonical forms themselves are oracle-checkable (q_domain_health).
  *
  * Deliberately a NORMALIZER, not a validator: inputs that are not
  * URLs pass through the regex chain unchanged-ish rather than
  * erroring — at corpus scale a crawler's url column always carries
  * garbage and a throwing canonicalizer would kill the batch.
  */
object Urls {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Query parameters dropped by canonicalization: click/campaign
    * trackers that vary per crawl visit without changing the resource. */
  private val trackingParamRe = "^(utm_[a-z]+|gclid|fbclid|ref|mc_cid|mc_eid)(=|$)"

  /** Lowercased scheme ('' when the input has none). */
  def scheme(u: Column): Column = lower(regexp_extract(trim(u), schemeRe, 1))

  /** Everything after scheme://, fragment stripped. */
  private def afterScheme(u: Column): Column =
    regexp_replace(regexp_replace(trim(u), "#.*$", ""), schemeRe, "")

  /** Canonical host[:port]: lowercased, userinfo stripped, the
    * scheme's DEFAULT port stripped (a non-default port is identity-
    * relevant and kept), leading `www.` stripped. */
  def host(u: Column): Column = {
    val hp = regexp_replace(
      lower(regexp_extract(afterScheme(u), "^([^/?]*)", 1)), "^[^@]*@", "")
    val noPort = when(scheme(u) === "http", regexp_replace(hp, ":80$", ""))
      .when(scheme(u) === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
    regexp_replace(noPort, "^www\\.", "")
  }

  private def pathQuery(u: Column): Column =
    regexp_replace(afterScheme(u), "^[^/?]*", "")

  /** Path with trailing slashes stripped (case preserved: URL paths
    * are case-sensitive, unlike hosts). */
  private def canonPath(u: Column): Column =
    regexp_replace(regexp_extract(pathQuery(u), "^([^?]*)", 1), "/+$", "")

  /** Query with tracking params dropped and the rest SORTED (param
    * order is transport noise; sorting makes a=1&b=2 ≡ b=2&a=1). */
  private def canonQuery(u: Column): Column =
    array_join(
      array_sort(filter(split(regexp_extract(pathQuery(u), "\\?(.*)$", 1), "&"),
        p => p =!= "" && !p.rlike(trackingParamRe))), "&")

  /** The full canonical form: scheme://host[:port]path[?sortedquery]. */
  def canonicalizeUrl(u: Column): Column = {
    val q = canonQuery(u)
    concat(scheme(u), lit("://"), host(u), canonPath(u),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Public-suffix rules parsed from the bundled PSL snapshot
    * (`/graft/public_suffix_snapshot.dat` — see that file's header:
    * a documented subset of publicsuffix.org, structurally complete:
    * exact, wildcard and exception rules). Grouped into the shapes
    * the column matcher needs: exact suffixes by label count,
    * wildcard PARENTS by label count (rule `*.kobe.jp` → parent
    * `kobe.jp`), exceptions by label count (rule `!city.kobe.jp`
    * stored as `city.kobe.jp`; per PSL its public suffix is the rule
    * minus its leftmost label). 1-label exact entries are redundant
    * with the implicit default `*` rule and rejected, as is any rule
    * shape the matcher doesn't cover — a silently unmatchable rule
    * would mis-group hosts with no error. */
  private[graft] object SuffixRules {
    val (exact2, exact3, wild1, wild2, exc2, exc3): (Seq[String], Seq[String],
        Seq[String], Seq[String], Seq[String], Seq[String]) = {
      val in = Option(getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat"))
        .getOrElse(sys.error("public_suffix_snapshot.dat missing from resources"))
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toList
      finally in.close()
      def labels(r: String) = r.split("\\.").length
      val (exc, rest) = lines.partition(_.startsWith("!"))
      val (wild, exact) = rest.partition(_.startsWith("*."))
      val excs = exc.map(_.stripPrefix("!"))
      val wildParents = wild.map(_.stripPrefix("*."))
      def bucket(rs: Seq[String], what: String, allowed: Set[Int]): Map[Int, Seq[String]] = {
        rs.groupBy(labels).map { case (n, g) =>
          require(allowed(n), s"PSL snapshot: unsupported $what rule size $n (${g.head})")
          n -> g
        }
      }
      val e = bucket(exact, "exact", Set(2, 3))
      val w = bucket(wildParents, "wildcard-parent", Set(1, 2))
      val x = bucket(excs, "exception", Set(2, 3))
      (e.getOrElse(2, Nil), e.getOrElse(3, Nil), w.getOrElse(1, Nil),
        w.getOrElse(2, Nil), x.getOrElse(2, Nil), x.getOrElse(3, Nil))
    }
  }

  /** Registered domain of the canonical host, by the PSL algorithm
    * over the bundled snapshot: the prevailing rule is any matching
    * EXCEPTION, else the LONGEST matching exact/wildcard rule, else
    * the implicit `*`; the registered domain is the public suffix
    * plus one label. Hosts that ARE a public suffix (or shorter)
    * degrade to themselves — the normalizer contract, not an error.
    * Pure codegen'd expressions (set membership compiles to InSet) —
    * map-only, no UDF, and the identical rule sets generate the
    * DuckDB replay (q_domain_health's oracle), so both engines read
    * ONE resource. The grouping key for per-domain curation rollups
    * and leakage-safe splits ([[graft.operators.Sampling.assignSplit]]
    * on this column keeps a domain's pages on one side of the
    * train/eval boundary). */
  def registeredDomain(u: Column): Column = {
    val h = regexp_replace(host(u), ":\\d+$", "")
    val labels = split(h, "\\.")
    val n = size(labels)
    // lastK via reverse-slice-reverse: never indexes out of bounds
    // (ANSI-safe), and degrades to the whole host on short inputs
    def lastK(k: Int) = array_join(reverse(slice(reverse(labels), 1, k)), ".")
    def inSet(c: Column, s: Seq[String]) = if (s.isEmpty) lit(false) else c.isin(s: _*)
    val r = SuffixRules
    when(n >= 2 && inSet(lastK(2), r.exc2), lastK(2))
      .when(n >= 3 && inSet(lastK(3), r.exc3), lastK(3))
      .when(n >= 3 && (inSet(lastK(3), r.exact3) || inSet(lastK(2), r.wild2)),
        when(n >= 4, lastK(4)).otherwise(h))
      .when(n >= 2 && (inSet(lastK(2), r.exact2) || inSet(lastK(1), r.wild1)),
        when(n >= 3, lastK(3)).otherwise(h))
      .otherwise(when(n >= 2, lastK(2)).otherwise(h))
  }

  /** The DuckDB replay of [[registeredDomain]], generated from the
    * SAME parsed rule sets so the two engines cannot drift: given a
    * SQL expression for the port-stripped host, emits the CASE chain
    * with the snapshot's rules inlined as IN lists. */
  def registeredDomainSql(hostExpr: String): String = {
    val r = SuffixRules
    def ll(k: Int) = s"array_to_string(string_split($hostExpr, '.')[-$k:], '.')"
    val n = s"len(string_split($hostExpr, '.'))"
    def inList(c: String, s: Seq[String]) =
      if (s.isEmpty) "FALSE"
      else s"$c IN (${s.sorted.map(x => s"'$x'").mkString(",")})"
    s"""CASE WHEN $n >= 2 AND ${inList(ll(2), r.exc2)} THEN ${ll(2)}
       |     WHEN $n >= 3 AND ${inList(ll(3), r.exc3)} THEN ${ll(3)}
       |     WHEN $n >= 3 AND (${inList(ll(3), r.exact3)} OR ${inList(ll(2), r.wild2)})
       |          THEN CASE WHEN $n >= 4 THEN ${ll(4)} ELSE $hostExpr END
       |     WHEN $n >= 2 AND (${inList(ll(2), r.exact2)} OR ${inList(ll(1), r.wild1)})
       |          THEN CASE WHEN $n >= 3 THEN ${ll(3)} ELSE $hostExpr END
       |     ELSE CASE WHEN $n >= 2 THEN ${ll(2)} ELSE $hostExpr END END""".stripMargin
  }
}
