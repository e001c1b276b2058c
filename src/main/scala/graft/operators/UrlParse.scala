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

  /** LET-binding for Column expressions: evaluate `x` ONCE, reference
    * it many times. Catalyst does not common-subexpression-eliminate
    * duplicated non-codegen regex trees, so composing [[resolve]] ∘
    * [[normalize]] by textual substitution multiplies the whole
    * upstream expression into every component extract — measured 13.6s
    * on the sf0.1 frontier census before this, 35k rows of pure
    * expression re-evaluation. A single-element `transform` lambda
    * binds the value to a lambda variable, which IS Catalyst's let. */
  private def let(x: Column)(f: Column => Column): Column =
    element_at(transform(array(x), f), 1)

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
    * inputs with no host (a frontier entry must be fetchable). The
    * input binds through [[let]] so the component extracts all read a
    * cheap lambda variable, not N copies of the caller's expression. */
  def normalize(url: Column): Column = let(url) { u =>
    val rawPath = path(u)
    val p = dropDots(when(length(rawPath) === 0, lit("/")).otherwise(rawPath))
    val q = when(length(query(u)) > 0, concat(lit("?"), query(u)))
      .otherwise(lit(""))
    when(length(host(u)) > 0, concat(origin(u), p, q))
      .otherwise(lit(null).cast("string"))
  }

  /** Resolve an extracted href against its page's base URL into a
    * canonical frontier URL (NULL = not a frontier edge: fragments,
    * empty hrefs, unfetchable results). */
  def resolve(base: Column, href: Column): Column =
    let(base) { b =>
      let(href) { h =>
        val baseDir = regexp_replace(path(b), "[^/]*$", "")
        val joined =
          when(length(scheme(h)) > 0, h)
            .when(h.startsWith("//"), concat(scheme(b), lit(":"), h))
            .when(h.startsWith("/"), concat(origin(b), h))
            .when(h.startsWith("?"), concat(origin(b), path(b), h))
            .when(h.startsWith("#") || length(h) === 0, lit(null).cast("string"))
            .otherwise(concat(origin(b),
              when(length(baseDir) === 0, lit("/")).otherwise(baseDir), h))
        normalize(joined)
      }
    }

  /** Tracking-parameter cleanup + canonical query ordering — the
    * SEMANTIC layer above [[normalize]]'s syntactic canonicalization:
    * two fetches of the same page routinely differ only in analytics
    * baggage (`utm_*`, click ids) and parameter order, so a frontier
    * keyed on the normalized URL alone schedules the same page many
    * times and the recrawl delta misclassifies it as `new`. PINNED
    * grammar (replayable, purely syntactic — no percent-decoding):
    * the query splits on `&`; empty segments drop; a parameter drops
    * iff its raw text starts with any of `dropPrefixes` (PREFIX
    * semantics — `utm_` covers the family, an exact name like
    * `gclid` also drops `gclid=...` because the `=` terminates
    * nothing: prefixes match the raw `name=value` token, so pass
    * `gclid=` to be exact-name strict); survivors sort bytewise
    * ascending and rejoin; an emptied query loses its `?`. Fragments
    * are assumed already gone ([[normalize]] drops them — compose
    * AFTER normalize/[[resolve]]). Map-only. */
  def canonicalQuery(url: Column, dropPrefixes: Seq[String]): Column = {
    require(dropPrefixes.nonEmpty, "pass at least one drop prefix")
    let(url) { u =>
      val q = query(u)
      val keep = array_sort(filter(split(q, "&"), p =>
        length(p) > 0 &&
          !dropPrefixes.map(d => p.startsWith(lit(d))).reduce(_ || _)))
      val head = substring_index(u, "?", 1)
      when(length(q) === 0, u).otherwise(
        concat(head,
          when(size(keep) > 0, concat(lit("?"), array_join(keep, "&")))
            .otherwise(lit(""))))
    }
  }
}
