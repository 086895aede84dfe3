package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL / domain structure operators — the step a web-corpus curation
  * pipeline needs BEFORE any per-site policy can exist: per-site
  * dedup caps, domain mixing weights, and containment limits are all
  * keyed by the REGISTRABLE domain (eTLD+1), not by the raw host
  * (every `*.blogspot.com` subdomain is a different site; every
  * `www.`/`cdn.` of one site is the same).
  *
  * eTLD+1 derivation follows the public-suffix-list algorithm —
  * longest matching suffix, then one more label — over a SEED subset
  * of the PSL ([[twoLabelSuffixes]]): every single label is a suffix
  * (com, org, any ccTLD), plus the curated two-label entries
  * (co.uk-class ccTLD composites and github.io-class private
  * registries). The full PSL is a drop-in replacement for the seed
  * list — the algorithm and plan shape don't change; only the
  * literal set grows (a few thousand entries, still a literal
  * in-expression set, no join).
  *
  * Scale shape: host extraction and eTLD+1 are pure narrow
  * expressions (parse_url + split + literal-set membership) — the
  * 100 TB pass is one codegen'd projection; the per-domain profile
  * aggregates once on the derived key.
  */
object UrlOps {

  /** Two-label public suffixes (PSL seed): ccTLD composites + private
    * registries. Single labels are implicitly suffixes; suffixes of
    * three or more labels are out of the seed's scope (documented).
    */
  val twoLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn",
    "com.mx", "co.in", "co.nz", "co.za", "co.kr",
    "com.sg", "com.tw", "com.tr", "com.ar",
    "github.io", "blogspot.com", "herokuapp.com")

  /** Lowercased host of a URL — parse_url semantics (strips scheme,
    * userinfo, port, path, query, fragment).
    */
  def host(url: Column): Column = lower(parse_url(url, lit("HOST")))

  /** Registrable domain (eTLD+1) of a lowercased host: the public
    * suffix (longest match: two-label seed entries, else the last
    * label) plus one label. NULL when the host IS a bare suffix —
    * there is no registrable domain to attribute (PSL rule), and a
    * per-site policy keyed on it would lump unrelated sites.
    */
  def etld1(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    // element_at(-k) is NULL-safe out of range under ANSI-off;
    // concat_ws skips NULLs, so a single-label host yields just that
    // label here — which can never collide with a two-label entry
    val last2 = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val suffixLen = when(last2.isin(twoLabelSuffixes: _*), lit(2))
      .otherwise(lit(1))
    when(n > suffixLen,
      concat_ws(".", slice(labels, n - suffixLen, suffixLen + 1)))
      .otherwise(lit(null).cast("string"))
  }

  /** DuckDB mirror of [[host]]: scheme/userinfo stripped, port and
    * path excluded by the character class. Matches parse_url on every
    * well-formed absolute URL (the only kind the pipeline feeds it).
    */
  def hostSql(url: String): String =
    s"lower(regexp_extract($url, '^[^:/?#]+://(?:[^/@]*@)?([^/:?#]+)', 1))"

  /** Tracking query parameters a recrawl/share variant injects without
    * changing the page: the standard strip set (utm_* campaign tags,
    * Google/Facebook/Microsoft click ids, bare ref).
    */
  val TrackingParamRe = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)="

  /** Canonical dedup KEY for a well-formed absolute URL — the
    * normalization crawl pipelines apply before exact-URL dedup, so
    * that recrawl/share variants of one page collapse to one key:
    * scheme and host lowercased, leading `www.` dropped, default
    * ports (http:80, https:443) dropped — other ports kept, fragment
    * dropped, tracking params ([[TrackingParamRe]]) dropped, the
    * REMAINING params sorted bytewise, trailing path slashes dropped.
    *
    * Pure narrow expression (parse_url + regexp + array ops — one
    * codegen'd projection over 100 TB of URLs, no shuffle, no UDF).
    * Unparseable URLs yield NULL (parse_url semantics) — the caller
    * decides whether to quarantine or pass them through raw.
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([^:/?#]+)://", 1))
    val h = regexp_replace(host(url), "^www\\.", "")
    val port = regexp_extract(url,
      "^[^:/?#]+://(?:[^/@]*@)?[^/:?#]*:([0-9]+)", 1)
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path = regexp_replace(
      coalesce(parse_url(url, lit("PATH")), lit("")), "/+$", "")
    val params = filter(
      split(coalesce(parse_url(url, lit("QUERY")), lit("")), "&"),
      p => (p =!= "") && !p.rlike(TrackingParamRe))
    val qs = array_join(sort_array(params), "&")
    concat(scheme, lit("://"), h,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(qs =!= "", concat(lit("?"), qs)).otherwise(lit("")))
  }

  /** DuckDB mirror of [[canonicalize]] — same regexps, same list ops
    * (DuckDB regexp_extract also yields '' on no-match; list_sort is
    * the same bytewise order as sort_array).
    */
  def canonicalizeSql(url: String): String = {
    val scheme = s"lower(regexp_extract($url, '^([^:/?#]+)://', 1))"
    val h = s"regexp_replace(${hostSql(url)}, '^www\\.', '')"
    val port =
      s"regexp_extract($url, '^[^:/?#]+://(?:[^/@]*@)?[^/:?#]*:([0-9]+)', 1)"
    val path = s"""regexp_replace(coalesce(
      regexp_extract($url, '://[^/?#]*(/[^?#]*)', 1), ''), '/+${"$"}', '')"""
    val params = s"""list_filter(
      string_split(coalesce(regexp_extract($url, '\\?([^#]*)', 1), ''), '&'),
      p -> p <> '' AND NOT regexp_matches(p, '$TrackingParamRe'))"""
    s"""($scheme || '://' || $h ||
       |  CASE WHEN $port <> '' AND NOT (($scheme = 'http' AND $port = '80')
       |      OR ($scheme = 'https' AND $port = '443'))
       |    THEN ':' || $port ELSE '' END ||
       |  $path ||
       |  CASE WHEN array_to_string(list_sort($params), '&') <> ''
       |    THEN '?' || array_to_string(list_sort($params), '&')
       |    ELSE '' END)""".stripMargin
  }

  /** DuckDB mirror of [[etld1]] over a PRE-SPLIT label-list column
    * (the caller stages `string_split(host, '.') AS <ls>` in a CTE —
    * a correlated scalar subquery here would re-split per reference).
    */
  def etld1Sql(ls: String): String = {
    val set = twoLabelSuffixes.map(s => s"'$s'").mkString("(", ",", ")")
    val sufLen = s"(CASE WHEN len($ls) >= 2 AND " +
      s"$ls[len($ls)-1] || '.' || $ls[len($ls)] IN $set THEN 2 ELSE 1 END)"
    s"""CASE WHEN len($ls) > $sufLen
       |  THEN array_to_string(list_slice($ls, len($ls) - $sufLen, len($ls)), '.')
       |  ELSE NULL END""".stripMargin
  }
}
