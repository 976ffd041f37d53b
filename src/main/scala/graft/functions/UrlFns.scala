package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/host canonicalization — every web-corpus pipeline's first stage
  * (round-11 verdict #5): fold the variants crawlers emit for the same
  * resource onto ONE canonical key so per-host statistics and URL-level
  * dedup see through scheme case, default ports, fragments, tracking
  * params, and query-key order.
  *
  * Canonical form (applied in this order):
  *   1. scheme and host lowercased (RFC 3986 §6.2.2.1 — path stays
  *      case-sensitive);
  *   2. a leading `www.` stripped from the host;
  *   3. the default port dropped (`:80` for http, `:443` for https);
  *   4. the fragment dropped entirely (never sent to the server);
  *   5. tracking parameters removed (`utm_*` keys, `gclid`, `fbclid`,
  *      `ref`);
  *   6. remaining query params sorted bytewise; an empty path becomes
  *      `/`; an emptied query drops its `?`.
  *
  * Everything is built from codegen'd regexp/string/array expressions —
  * no UDF — and each rule has a DuckDB twin in [[canonicalSql]] built
  * from the SAME regexes, so the oracle replays the canonicalization
  * rather than trusting it.
  *
  * Scale shape: per-row projection, no shuffle of its own; the per-host
  * rollup it feeds groups on the (low-cardinality) canonical host.
  *
  * Reference anchor: the reference corpus carries no URL column
  * (fmi_client.py builds request URLs but never stores them), so q362
  * plants deterministic URLs in-query — the q52 planted-PII pattern.
  */
object UrlFns {

  private val trackingKeys = Seq("gclid", "fbclid", "ref")

  def scheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def hostport(u: Column): Column =
    lower(regexp_extract(u, "^[^:/?#]+://([^/?#]*)", 1))

  /** Lowercased host, `www.` stripped, port removed. */
  def host(u: Column): Column =
    regexp_replace(regexp_extract(hostport(u), "^([^:]*)", 1), "^www\\.", "")

  /** Explicit port digits, or '' when absent. */
  def port(u: Column): Column =
    regexp_extract(hostport(u), ":([0-9]+)$", 1)

  /** Path component ('' when absent; canonicalization maps '' to '/'). */
  def path(u: Column): Column =
    regexp_extract(u, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)

  /** Raw query string between '?' and fragment ('' when absent). The
    * fragment is stripped FIRST: in `/p#x?y` the `?y` belongs to the
    * fragment, not the query (a spec fixture caught the unordered regex
    * matching it).
    */
  def query(u: Column): Column =
    regexp_extract(regexp_replace(u, "#.*", ""), "\\?(.*)", 1)

  /** Query params minus tracking keys, sorted bytewise, re-joined. */
  def canonicalQuery(u: Column): Column = {
    val params = filter(split(query(u), "&"), p => {
      val key = regexp_extract(p, "^([^=]*)", 1)
      p =!= "" && !key.startsWith("utm_") &&
        !trackingKeys.map(lit(_): Column).foldLeft(lit(false))(
          (acc, k) => acc || key === k)
    })
    array_join(sort_array(params), "&")
  }

  /** The full canonical URL (rules 1-6 above). */
  def canonical(u: Column): Column = {
    val sch = scheme(u)
    val prt = port(u)
    val keepPort = prt =!= "" &&
      !((sch === "http" && prt === "80") || (sch === "https" && prt === "443"))
    val pth = when(path(u) === "", "/").otherwise(path(u))
    val q = canonicalQuery(u)
    concat(sch, lit("://"), host(u),
      when(keepPort, concat(lit(":"), prt)).otherwise(""),
      pth,
      when(q =!= "", concat(lit("?"), q)).otherwise(""))
  }

  /** DuckDB replay of [[host]] over SQL expression `e`. */
  def hostSql(e: String): String = {
    val hp = s"lower(regexp_extract($e, '^[^:/?#]+://([^/?#]*)', 1))"
    s"regexp_replace(regexp_extract($hp, '^([^:]*)', 1), '^www\\.', '')"
  }

  /** DuckDB replay of [[canonical]] over SQL expression `e` — the same
    * regexes, the same param filter, the same bytewise sort (list_sort
    * on ASCII = sort_array on ASCII).
    */
  def canonicalSql(e: String): String = {
    val sch = s"lower(regexp_extract($e, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val hp = s"lower(regexp_extract($e, '^[^:/?#]+://([^/?#]*)', 1))"
    val host = hostSql(e)
    val prt = s"regexp_extract($hp, ':([0-9]+)" + "$', 1)"
    val pth = s"regexp_extract($e, '^[^:/?#]+://[^/?#]*([^?#]*)', 1)"
    val q = s"regexp_extract(regexp_replace($e, '#.*', ''), '\\?(.*)', 1)"
    val keyOf = "regexp_extract(p, '^([^=]*)', 1)"
    val keep = trackingKeys.map(k => s"$keyOf <> '$k'").mkString(" AND ")
    val params = s"list_filter(string_split($q, '&'), " +
      s"p -> p <> '' AND NOT starts_with($keyOf, 'utm_') AND $keep)"
    val cq = s"array_to_string(list_sort($params), '&')"
    s"($sch || '://' || $host || " +
      s"(CASE WHEN $prt <> '' AND NOT (($sch = 'http' AND $prt = '80') " +
      s"OR ($sch = 'https' AND $prt = '443')) THEN ':' || $prt ELSE '' END) || " +
      s"(CASE WHEN $pth = '' THEN '/' ELSE $pth END) || " +
      s"(CASE WHEN $cq <> '' THEN '?' || $cq ELSE '' END))"
  }
}
