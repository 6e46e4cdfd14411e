package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing for web-corpus curation — domain quotas, registered-
  * domain grouping, blocklist filtering all key off these. Pure
  * regexp_extract column functions (codegen'd, engine-portable — the
  * same pattern runs in DuckDB for the oracle), not java.net.URI (a
  * per-row object parse, and its exceptions turn one malformed URL
  * into a task failure). Unparseable input yields NULL, never an error.
  */
object UrlFunctions {

  private val HostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"

  /** Hostname of a URL (no scheme, userinfo, port, path), lowercased;
    * NULL when no `scheme://host` shape is present.
    */
  def host(url: Column): Column = {
    val h = lower(regexp_extract(url, HostRe, 1))
    when(h =!= "", h)
  }

  /** Last `n` dot-separated labels of the host — the cheap registered-
    * domain approximation ("docs.example.com" → "example.com" at n=2).
    * A real public-suffix-list lookup is a broadcast join against the
    * PSL table; this is the join-free heuristic for quota keys.
    */
  def registeredDomain(url: Column, n: Int = 2): Column = {
    require(n >= 1, "n must be >= 1")
    val h = host(url)
    val parts = split(h, "\\.")
    when(h.isNotNull, concat_ws(".", slice(parts, greatest(size(parts) - (n - 1), lit(1)), lit(n))))
  }

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val PortRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?[^/:?#]+:([0-9]+)"
  private val PathRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
  /** Tracking params dropped by [[canonicalize]] (name match, `=`-or-end
    * anchored): the ubiquitous analytics/click identifiers that make two
    * fetches of the same page hash differently.
    */
  private val TrackingRe = "^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref)(=.*)?$"

  /** Canonical URL form for exact web-corpus dedup keys: lowercase the
    * scheme and host, drop userinfo and fragment, drop default ports
    * (http:80, https:443), strip one trailing slash from a non-root
    * path, remove tracking params ([[TrackingRe]]), and byte-sort the
    * surviving query params so param order stops mattering. The crawl
    * dedup normalizer: two spellings of one page become one key BEFORE
    * the exact/minhash stages, which no similarity threshold does as
    * cheaply. `www.` is kept (it is not always an alias; strip it via
    * [[registeredDomain]] grouping instead). Row-local regexp/array
    * work (codegen'd, engine-portable, NULL on unparseable — never an
    * error), same discipline as [[host]].
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val h = host(url)
    val port = regexp_extract(url, PortRe, 1)
    val portPart = when(
      port =!= "" &&
        !(scheme === "http" && port === "80") &&
        !(scheme === "https" && port === "443"),
      concat(lit(":"), port)).otherwise(lit(""))
    val path = regexp_replace(regexp_extract(url, PathRe, 1), "/$", "")
    // query = from the first '?' BEFORE any '#': strip the fragment
    // first, else a '#' that precedes the only '?' (http://h/p#sec?x=1)
    // would resurrect fragment content as query params
    val q0 = regexp_extract(regexp_replace(url, "#.*$", ""), "\\?(.*)", 1)
    val kept = sort_array(filter(split(q0, "&"),
      p => p =!= "" && !p.rlike(TrackingRe)))
    val queryPart = when(size(kept) > 0, concat(lit("?"), concat_ws("&", kept)))
      .otherwise(lit(""))
    when(scheme =!= "" && h.isNotNull,
      concat(scheme, lit("://"), h, portPart, path, queryPart))
  }
}
