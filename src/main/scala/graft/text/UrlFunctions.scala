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
}
