package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and registrable-domain extraction — the web-corpus
  * curation primitives that sit in front of per-domain quotas, domain
  * blocklists, and URL-keyed dedup. Crawl URLs for the SAME page vary by
  * case, default ports, fragments, tracking params and trailing slashes;
  * keying anything by raw URL double-counts. Every transform here is a
  * pure column expression (codegen'd, no UDF), so canonicalization runs
  * map-side at scan speed and the canonical form is reproducible in any
  * engine with regex support — which keeps it oracle-checkable.
  *
  * Canonical form (applied in this order, each step idempotent):
  *   1. fragment stripped (`#...` — never sent to the server);
  *   2. scheme and host(:port) lowercased (path/query case preserved —
  *      paths are case-sensitive by spec);
  *   3. default ports dropped (`:80` for http, `:443` for https);
  *   4. `utm_*` tracking params dropped, `?`/`&` separators re-normalized
  *      (a query left empty disappears entirely);
  *   5. trailing slashes on the path dropped.
  *
  * Registrable domain is the PSL-lite heuristic: last two host labels,
  * or last three when the penultimate pair is a known multi-part public
  * suffix (co.uk, com.au, …). The real public-suffix list is a data file
  * revved independently of code; at scale it joins in as a broadcast
  * lookup keyed by candidate suffix — the two-level heuristic here keeps
  * the operator dependency-free and is exact on the suffixes it knows.
  */
object UrlOps {

  private val multiPartSuffixes = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za")

  /** Lowercased `host[:port]` of a URL (empty string when the input
    * doesn't parse as scheme://authority...).
    */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  /** Canonical URL per the object doc's five steps. */
  def normalizeUrl(url: Column): Column = {
    // 1. fragment
    val noFrag = regexp_replace(url, "#.*$", "")
    // 2. lowercase scheme://authority, keep path/query case
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1))
    // 3. default ports (no lookahead — RE2 engines lack it; an unmatched
    // optional tail group substitutes as empty in both Java and RE2)
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/?#]*):80([/?#].*)?$", "$1$2"),
      "^(https://[^/?#]*):443([/?#].*)?$", "$1$2")
    // 4. utm params: mid-query, query-leading (keep the ?), then sole
    val noUtm = regexp_replace(
      regexp_replace(
        regexp_replace(noPort, "&utm_[^&#]*", ""),
        "\\?utm_[^&#]*&", "?"),
      "\\?utm_[^&#]*$", "")
    // 5. trailing path slashes
    regexp_replace(noUtm, "/+$", "")
  }

  /** PSL-lite registrable domain of a host column: `sld.tld`, or
    * `third.sld.tld` for known multi-part suffixes. Hosts with fewer
    * than two labels pass through unchanged.
    */
  def registrableDomain(hostCol: Column): Column = {
    // domains are properties of the HOSTNAME — drop any :port first
    val bare = regexp_replace(hostCol, ":[0-9]+$", "")
    val labels = split(bare, "\\.")
    val n = size(labels)
    val lastTwo = array_join(slice(labels, -2, 2), ".")
    val lastThree = array_join(slice(labels, -3, 3), ".")
    when(n <= 2, bare)
      .when(lastTwo.isin(multiPartSuffixes: _*), lastThree)
      .otherwise(lastTwo)
  }
}
