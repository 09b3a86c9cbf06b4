package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-entry normalization C4/RefinedWeb run
  * BEFORE any content work, so that `http://Example.com:80/a?b=2&a=1#x`
  * and `http://example.com/a?a=1&b=2` dedup as one page and the fetch
  * frontier never re-enqueues a known URL under a cosmetic variant.
  * Extension scope — no reference counterpart.
  *
  * Pure string expressions in the Pii/HtmlExtract discipline (Java ∩ RE2
  * regex subset, one split+sort HOF for the query params): zero shuffles,
  * linear in corpus bytes, byte-replayable by an external engine (the
  * q112 oracle). Canonical form:
  *
  *   lower(scheme)://lower(host)[:port] path ["?" sorted-query]
  *
  *  - the FRAGMENT is stripped (never sent to the server);
  *  - the default port for the scheme (http:80, https:443) is stripped;
  *  - query parameters are sorted bytewise (param ORDER is almost never
  *    semantic; sorting canonicalizes `?b=2&a=1` = `?a=1&b=2` — the
  *    standard C4-style choice, accepting the rare order-sensitive app);
  *  - an empty path before a query/end becomes "/" (http://h = http://h/);
  *  - path case, duplicate params, and empty-value params are PRESERVED
  *    (paths are case-sensitive; dropping params changes semantics).
  */
object UrlCanon {

  /** Canonical URL as one column expression. Non-URL strings (no
    * `scheme://`) pass through with only the fragment stripped — a
    * crawl's job is to normalize what it can parse, not to null out the
    * rest. */
  def canonicalize(url: Column): Column = {
    // 1. fragment off (first '#' to end), surrounding whitespace off
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    // 2. split authority (scheme://host[:port]) from the rest at the first
    //    '/' or '?' after the authority — [^/?]* stops at either
    val auth = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    // 3. authority lowercases; scheme-default ports drop
    val authLower = lower(auth)
    val authCanon = regexp_replace(
      regexp_replace(authLower, "^(http://[^/:]+):80$", "$1"),
      "^(https://[^/:]+):443$", "$1")
    // 4. path/query split at the first '?'
    val hasQuery = rest.contains("?")
    val path = when(hasQuery, regexp_extract(rest, "^([^?]*)", 1)).otherwise(rest)
    val query = when(hasQuery, regexp_replace(rest, "^[^?]*\\?", "")).otherwise(lit(""))
    // 5. empty path → "/" (only when there was an authority to anchor it)
    val pathCanon = when(path === "" && auth =!= "", lit("/")).otherwise(path)
    // 6. sort query params bytewise; keep duplicates and empty values
    val queryCanon = when(query === "", lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(split(query, "&")), "&")))
    when(auth === "", noFrag) // unparseable: fragment-stripped passthrough
      .otherwise(concat(authCanon, pathCanon, queryCanon))
  }

  /** The lowercase host of a URL (port and userinfo stripped, `www.`
    * preserved — host identity, not site grouping): the key the
    * per-domain pipeline stages (C4 blocklists, RefinedWeb per-domain
    * caps) group on. Empty string for non-URLs. */
  def host(url: Column): Column =
    lower(regexp_extract(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))

  /** Keep-first URL-level dedup: one row per canonical URL, the winner
    * chosen by the least `tieBreak` (deterministic, partitioning-
    * invariant). Rides Relational.keepFirstPerKey — one per-key window
    * over the canonical-URL shuffle — keyed on [[canonicalize]]; the
    * canonical form is kept as `url_canon` (downstream stages and the
    * oracle both want to see what the key was). */
  def dedupByUrl(df: org.apache.spark.sql.DataFrame, urlCol: String,
      tieBreak: Seq[Column]): org.apache.spark.sql.DataFrame =
    graft.operators.Relational.keepFirstPerKey(
      df.withColumn("url_canon", canonicalize(col(urlCol))),
      Seq("url_canon"), tieBreak)
}
