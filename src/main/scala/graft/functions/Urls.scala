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

  /** Two-level public suffixes where the registered domain is three
    * labels (news.example.co.uk → example.co.uk). A pragmatic subset
    * of the public-suffix list — the heuristic grain a corpus rollup
    * needs, not a parser of record. */
  private[graft] val twoLevelSuffixes = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "co.kr", "co.in",
    "co.nz", "co.za", "com.au", "net.au", "org.au", "com.br", "com.cn",
    "com.mx", "com.sg", "com.tr")

  /** Registered domain of the canonical host: last two labels, or last
    * three over a two-level public suffix. The grouping key for
    * per-domain curation rollups and leakage-safe splits
    * ([[graft.operators.Sampling.assignSplit]] on this column keeps a
    * domain's pages on one side of the train/eval boundary). */
  def registeredDomain(u: Column): Column = {
    val h = regexp_replace(host(u), ":\\d+$", "")
    val labels = split(h, "\\.")
    // lastK via reverse-slice-reverse: never indexes out of bounds
    // (ANSI-safe), and degrades to the whole host on short inputs
    def lastK(k: Int) = array_join(reverse(slice(reverse(labels), 1, k)), ".")
    when(size(labels) >= 3 && lastK(2).isin(twoLevelSuffixes: _*), lastK(3))
      .when(size(labels) >= 2, lastK(2))
      .otherwise(h)
  }
}
