package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization for the Common-Crawl-shaped page table — the
 * dedup key every web pipeline actually groups on (raw crawl urls vary
 * in case, default ports, fragment noise, and query-param order while
 * naming the same resource).
 *
 * Rules (all pure string algebra — no network, no IDN):
 *   1. drop the `#fragment`;
 *   2. lowercase the scheme and host;
 *   3. strip the scheme-default port (`:80` for http, `:443` for https);
 *   4. empty path -> `/`;
 *   5. sort query parameters byte-lexicographically (the one
 *      order-insensitive piece of a URL), keeping duplicates.
 *
 * Everything is built from codegen'd builtin functions (no UDF), so the
 * normalization runs inside whole-stage codegen and pushes through
 * Catalyst like any other projection. Each Column builder has a
 * `...Sql` twin emitting the equivalent DuckDB expression for the
 * oracle duals (same decomposition, step for step).
 */
object UrlOps {

  /** url minus any `#fragment`. */
  private def noFrag(u: Column): Column = substring_index(u, "#", 1)

  /** Query string after `?` (empty when there is none). */
  def queryOf(u: Column): Column = {
    val nf = noFrag(u)
    when(instr(nf, "?") > 0, nf.substr(instr(nf, "?") + 1, length(nf)))
      .otherwise(lit(""))
  }

  /** Lowercased scheme (text before `://`). */
  def schemeOf(u: Column): Column =
    lower(substring_index(substring_index(noFrag(u), "?", 1), "://", 1))

  /** host[:port] as crawled, lowercased, before default-port stripping. */
  private def hostPortOf(u: Column): Column = {
    val base = substring_index(noFrag(u), "?", 1)
    val rest = base.substr(
      length(substring_index(base, "://", 1)) + 4, length(base))
    lower(substring_index(rest, "/", 1))
  }

  /** Path including the leading `/` (empty path -> `/`). */
  def pathOf(u: Column): Column = {
    val base = substring_index(noFrag(u), "?", 1)
    val rest = base.substr(
      length(substring_index(base, "://", 1)) + 4, length(base))
    val p = rest.substr(length(substring_index(rest, "/", 1)) + 1, length(rest))
    when(p === "", lit("/")).otherwise(p)
  }

  /** Lowercased host with the scheme-default port stripped. */
  def hostOf(u: Column): Column = {
    val s = schemeOf(u)
    val hp = hostPortOf(u)
    when(s === "http" && hp.endsWith(":80"), hp.substr(lit(1), length(hp) - 3))
      .when(s === "https" && hp.endsWith(":443"), hp.substr(lit(1), length(hp) - 4))
      .otherwise(hp)
  }

  /** Heuristic registered domain: the last two dot-labels of the host
    * (`a.b.site.example.com` -> `example.com`). A retained non-default
    * port (`hostOf` keeps `:8080`) is stripped first so one domain never
    * splits into per-port keys. Public-suffix lists are out of scope;
    * two labels is the standard cheap approximation. */
  def registeredDomain(host: Column): Column =
    regexp_extract(substring_index(host, ":", 1), "([^.]+\\.[^.]+)$", 1)

  /** Canonical form per the rules above. Urls without a `://` scheme
    * separator (relative links, bare hosts — real crawls are full of
    * them) cannot be decomposed by this algebra and pass through
    * unchanged rather than being mangled into case-folded garbage. */
  def normalize(u: Column): Column = {
    val q = queryOf(u)
    val sortedQ = array_join(array_sort(split(q, "&")), "&")
    val canonical = concat(
      schemeOf(u), lit("://"), hostOf(u), pathOf(u),
      when(q === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
    when(instr(u, "://") > 0, canonical).otherwise(u)
  }

  // ---- DuckDB duals (same decomposition, DuckDB function names) ---------

  /** CTE body computing (url, scheme, host, path, q, norm_url) from
    * relation `rel`'s `url` column — splice into `WITH u AS (...)`. */
  def normalizeCteSql(rel: String): String =
    s"""s0 AS (SELECT url, split_part(url, '#', 1) AS nofrag FROM $rel),
       |s1 AS (SELECT url, nofrag, split_part(nofrag, '?', 1) AS base,
       |  CASE WHEN instr(nofrag, '?') > 0
       |       THEN substr(nofrag, instr(nofrag, '?') + 1) ELSE '' END AS q
       |  FROM s0),
       |s2 AS (SELECT url, base, q,
       |  lower(split_part(base, '://', 1)) AS scheme,
       |  substr(base, length(split_part(base, '://', 1)) + 4) AS rest
       |  FROM s1),
       |s3 AS (SELECT url, q, scheme,
       |  lower(split_part(rest, '/', 1)) AS hostport,
       |  CASE WHEN substr(rest, length(split_part(rest, '/', 1)) + 1) = ''
       |       THEN '/' ELSE substr(rest, length(split_part(rest, '/', 1)) + 1)
       |  END AS path
       |  FROM s2),
       |s4 AS (SELECT url, q, scheme, path,
       |  CASE WHEN scheme = 'http' AND ends_with(hostport, ':80')
       |       THEN substr(hostport, 1, length(hostport) - 3)
       |       WHEN scheme = 'https' AND ends_with(hostport, ':443')
       |       THEN substr(hostport, 1, length(hostport) - 4)
       |       ELSE hostport END AS host
       |  FROM s3),
       |u AS (SELECT url, scheme, host, path, q,
       |  CASE WHEN instr(url, '://') > 0
       |       THEN scheme || '://' || host || path ||
       |            CASE WHEN q = '' THEN ''
       |                 ELSE '?' ||
       |                   array_to_string(list_sort(string_split(q, '&')), '&')
       |            END
       |       ELSE url END AS norm_url,
       |  regexp_extract(split_part(host, ':', 1),
       |                 '([^.]+\\.[^.]+)$$', 1) AS reg_domain
       |  FROM s4)""".stripMargin
}
