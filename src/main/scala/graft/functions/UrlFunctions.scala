package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization for crawl dedup/join keys — the normalization a
 * web pipeline applies before url-level dedup, resume keying, and
 * host-level salting (the reference keys its whole queue on the url,
 * /root/reference/src/queue.py:24-33, with no normalization at all: two
 * spellings of one page are two jobs; canonicalization collapses them).
 *
 * Deterministic rule set (RFC 3986 §6 normalizations that are safe
 * without fetching):
 *   1. scheme and host lowercased (case-insensitive per spec);
 *   2. default ports stripped (:80 for http, :443 for https);
 *   3. fragment dropped (never sent to the server);
 *   4. query parameters SORTED bytewise (param order is almost always
 *      insignificant; sorting makes the key canonical) — empty query
 *      ("?") dropped;
 *   5. empty path normalized to "/".
 *
 * Deliberately NOT done (lossy without server knowledge): percent-decode,
 * dot-segment removal, tracking-param stripping, www-folding.
 *
 * Everything is composed from codegen built-ins (regexp over RE2/Java-
 * identical ASCII classes, split/array_sort/array_join) — no UDF, so the
 * key computes inside the scan projection, and an external SQL engine
 * reproduces it function-for-function.
 */
object UrlFunctions {

  // scheme://host[:port][/path...][?query][#fragment] — authority-form
  // urls only; anything unparseable passes through unchanged.
  private val SchemeHostPort = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$"

  /** Canonical url per the rule set above. Non-authority strings (no
    * scheme://) are returned unchanged. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeHostPort, 1))
    val authority = regexp_extract(url, SchemeHostPort, 2)
    val rest = regexp_extract(url, SchemeHostPort, 3)

    // authority: userinfo (before the last '@') is case-SENSITIVE per
    // RFC 3986 and preserved; host[:port] lowercases, then the scheme's
    // default port strips
    val userinfo = regexp_extract(authority, "^(.*@)", 1)
    val hostLower = lower(regexp_replace(authority, "^.*@", ""))
    val hostPort = when(scheme === "http", regexp_replace(hostLower, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostLower, ":443$", ""))
      .otherwise(hostLower)
    val host = concat(userinfo, hostPort)

    // rest = [/path...][?query][#fragment] -> drop fragment
    val noFrag = regexp_replace(rest, "#.*$", "")
    // split path vs query
    val path = regexp_replace(noFrag, "\\?.*$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val pathNorm = when(path === "", lit("/")).otherwise(path)
    // sort query params bytewise; "?" with nothing after it drops
    val sortedQuery = array_join(array_sort(split(query, "&")), "&")
    val queryNorm = when(sortedQuery === "", lit(""))
      .otherwise(concat(lit("?"), sortedQuery))

    when(scheme === "", url) // unparseable: pass through
      .otherwise(concat(scheme, lit("://"), host, pathNorm, queryNorm))
  }

  /** The canonical dedup/salting key: xxhash64 of the canonical url. */
  def urlKey(url: Column): Column = xxhash64(canonicalizeUrl(url))
}
