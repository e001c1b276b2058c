package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing, normalization and reference resolution with a PINNED,
  * engine-replayable grammar — the other half of the crawl-frontier
  * stage ([[HtmlExtract.extractLinks]] produces hrefs; this turns them
  * into canonical next-round fetch URLs, and hosts for the per-domain
  * grouping every politeness/quota/dedup policy runs on). Everything
  * is a Column expression over regexp_extract/regexp_replace — map
  * only, no UDF — and every construct is common to Java regex and RE2
  * so DuckDB oracles replay it verbatim.
  *
  * THE PINNED GRAMMAR:
  *  - component split: the RFC 3986 appendix-B regex
  *    `^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?`
  *    (groups: 2 scheme, 4 authority, 5 path, 7 query, 9 fragment);
  *  - host = the authority minus `userinfo@` and `:port`, lowercased;
  *    port = trailing `:digits` of the authority;
  *  - [[normalize]]: scheme and host lowercase; fragment DROPPED (a
  *    frontier never refetches by fragment); default ports drop
  *    (http:80, https:443); empty path with an authority → `/`;
  *    dot-segment removal (RFC 3986 5.2.4) as a bounded K=8 fold of
  *    `/./`-collapse then `segment/../`-collapse (segments that are
  *    themselves `..` never collapse; paths nested deeper than 8
  *    levels of `..` stay partially unresolved — pinned bound, real
  *    URLs don't approach it); query preserved byte-for-byte;
  *  - [[resolve]]: absolute href → itself; `//x` → base scheme;
  *    `/x` → base origin; `?q` → base origin + path; `#f` or empty →
  *    NULL (not a fetchable frontier edge); anything else → base
  *    origin + base path's directory + href. The result normalizes,
  *    which is where `../` climbs resolve.
  */
object UrlParse {

  private val UriRe = "^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\\?([^#]*))?(#(.*))?"

  def scheme(url: Column): Column = lower(regexp_extract(url, UriRe, 2))
  private def authority(url: Column): Column = regexp_extract(url, UriRe, 4)
  def host(url: Column): Column =
    lower(regexp_extract(authority(url), "^(?:[^@]*@)?([^:]*)", 1))
  def port(url: Column): Column =
    regexp_extract(authority(url), ":([0-9]+)$", 1)
  def path(url: Column): Column = regexp_extract(url, UriRe, 5)
  def query(url: Column): Column = regexp_extract(url, UriRe, 7)

  /** `scheme://host[:port]` with case/default-port normalization —
    * the frontier-dedup key prefix. */
  private def origin(url: Column): Column = {
    val p = port(url)
    val keepPort = length(p) > 0 &&
      !(scheme(url) === "http" && p === "80") &&
      !(scheme(url) === "https" && p === "443")
    concat(scheme(url), lit("://"), host(url),
      when(keepPort, concat(lit(":"), p)).otherwise(lit("")))
  }

  /** RFC 3986 5.2.4 dot-segment removal as a pinned bounded fold. */
  private def dropDots(p: Column): Column = {
    // a path segment that is NOT `..` (and `.` segments are already
    // collapsed before this runs): no leading dot, or one leading dot
    // with more, or two leading dots with more
    val seg = "(?:[^/.][^/]*|\\.[^/.][^/]*|\\.\\.[^/]+)"
    val deDot = (c: Column) =>
      regexp_replace(regexp_replace(c, "/\\.(/|$)", "/"), "^\\./", "")
    val deUp = (c: Column) =>
      regexp_replace(regexp_replace(c, s"/$seg/\\.\\.(/|$$)", "/"), "^/\\.\\.(/|$$)", "/")
    val folded = (1 to 8).foldLeft(p)((acc, _) => deUp(deDot(acc)))
    deDot(folded)
  }

  /** Canonical fetch URL (the pinned normalization above); NULL for
    * inputs with no host (a frontier entry must be fetchable). */
  def normalize(url: Column): Column = {
    val rawPath = path(url)
    val p = dropDots(when(length(rawPath) === 0, lit("/")).otherwise(rawPath))
    val q = when(length(query(url)) > 0, concat(lit("?"), query(url)))
      .otherwise(lit(""))
    when(length(host(url)) > 0, concat(origin(url), p, q))
      .otherwise(lit(null).cast("string"))
  }

  /** Resolve an extracted href against its page's base URL into a
    * canonical frontier URL (NULL = not a frontier edge: fragments,
    * empty hrefs, unfetchable results). */
  def resolve(base: Column, href: Column): Column = {
    val baseDir = regexp_replace(path(base), "[^/]*$", "")
    val absolute = length(scheme(href)) > 0
    val joined =
      when(absolute, href)
        .when(href.startsWith("//"), concat(scheme(base), lit(":"), href))
        .when(href.startsWith("/"), concat(origin(base), href))
        .when(href.startsWith("?"), concat(origin(base), path(base), href))
        .when(href.startsWith("#") || length(href) === 0, lit(null).cast("string"))
        .otherwise(concat(origin(base),
          when(length(baseDir) === 0, lit("/")).otherwise(baseDir), href))
    normalize(joined)
  }
}
