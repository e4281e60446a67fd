package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup key of any web-crawl corpus.
  *
  * Two crawls of the same page rarely present byte-identical URLs:
  * scheme and host case varies, default ports appear and disappear,
  * tracking parameters (utm_*, fbclid, gclid, ...) churn per referral,
  * query-parameter order is whatever the emitting site felt like, and
  * fragments are client-side only. Canonicalizing before URL-level
  * dedup collapses those variants; skipping it inflates the corpus with
  * exact-duplicate pages that even content-hash dedup then has to
  * re-fetch and re-process.
  *
  * Everything here is built from codegen'd builtin functions
  * (try_parse_url — null on junk, a crawl corpus always has junk —
  * plus higher-order array ops) — no UDFs — so the
  * canonicalization runs map-side inside whole-stage codegen and the
  * downstream dedup groupBy is the only shuffle.
  *
  * Deliberate non-goals, documented so the contract is clear:
  * dot-segment resolution (`/a/../b`) is NOT performed (crawler
  * frontiers resolve those before fetch), percent-encoding is NOT
  * normalized (decoding can change semantics; crawl pipelines compare
  * post-fetch redirects instead), and the host is NOT IDNA-mapped
  * (punycode stays punycode).
  */
object UrlOps {

  /** Query parameters dropped during canonicalization: per-click
    * tracking state that never affects page content.
    */
  val TrackingParamPattern: String = "^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)(=.*)?$"

  /** Lower-cased scheme, or null for a non-URL string. */
  def urlScheme(url: Column): Column = lower(try_parse_url(url, lit("PROTOCOL")))

  /** Lower-cased authority (host[:port]) with the scheme's default port
    * stripped (`:80` for http, `:443` for https).
    */
  def urlAuthority(url: Column): Column = {
    val auth = lower(try_parse_url(url, lit("AUTHORITY")))
    when(urlScheme(url) === "http", regexp_replace(auth, ":80$", ""))
      .when(urlScheme(url) === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
  }

  /** Canonical query string: parameters split on `&`, tracking
    * parameters removed, the rest sorted byte-wise and rejoined. Null
    * when no parameters survive (so `?` can be omitted cleanly).
    */
  def canonicalQuery(url: Column): Column = {
    val q = try_parse_url(url, lit("QUERY"))
    val kept = filter(
      split(q, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))
    when(q.isNull || size(kept) === 0, lit(null))
      .otherwise(array_join(array_sort(kept), "&"))
  }

  /** Full canonical form:
    * `lower(scheme)://lower(host[:nondefault_port])path[?sorted_kept_params]`
    * — fragment dropped, empty path normalized to `/`. Null if the
    * input has no parseable scheme or authority.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val auth = urlAuthority(url)
    val rawPath = try_parse_url(url, lit("PATH"))
    val path = when(rawPath.isNull || rawPath === "", lit("/")).otherwise(rawPath)
    val q = canonicalQuery(url)
    when(scheme.isNull || auth.isNull, lit(null))
      .otherwise(concat(
        scheme, lit("://"), auth, path,
        when(q.isNull, lit("")).otherwise(concat(lit("?"), q))))
  }
}
