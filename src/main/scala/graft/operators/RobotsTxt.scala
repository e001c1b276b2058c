package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt exclusion rules (RFC 9309, the Robots Exclusion
  * Protocol) with a PINNED, engine-replayable grammar — the
  * politeness filter between the crawl frontier
  * ([[HtmlExtract.extractLinks]] ∘ [[UrlParse.resolve]]) and the next
  * fetch round: a 100 TB crawl that ignores robots rules is not a
  * pipeline anyone can run.
  *
  * THE PINNED GRAMMAR:
  *  - line structure: records split on `\n`; `#` starts a comment to
  *    end of line; fields are case-insensitive `user-agent` / `allow`
  *    / `disallow`, values trimmed;
  *  - grouping (RFC 9309 §2.1): consecutive `user-agent` lines open
  *    ONE group; every rule line attaches to every agent of the most
  *    recent group; rule lines before any `user-agent` line attach to
  *    nothing (dropped); empty-pattern rules are dropped (an empty
  *    `Disallow:` means "no restriction");
  *  - agent selection (§2.2.1): a crawler obeys its OWN group when one
  *    names it (exact match, lowercased) and the `*` group otherwise —
  *    never both;
  *  - matching (§2.2.2): patterns match URL PATHS as prefixes;
  *    `*` matches any char run, a trailing `$` anchors the end; the
  *    longest (most octets) matching pattern wins, allow winning
  *    length ties; no matching rule → allowed.
  *
  * Scale shape: a rules table is O(#hosts × rules/host) — never
  * corpus-sized — and [[evaluate]] joins it BROADCAST against the
  * frontier, so the politeness pass is map-side; the only wide
  * operation in frontier → polite-frontier is the caller's own
  * census.
  */
object RobotsTxt {

  /** Regex metachars escaped before wildcard translation — the pinned
    * pattern→regex rule: escape, then `*` → `.*`, trailing `$`
    * (already escaped) → restored as the end anchor. */
  private def patternRx(pattern: Column): Column = {
    val escaped = Seq("\\", ".", "[", "]", "(", ")", "{", "}", "+", "?", "^", "$", "|")
      .foldLeft(pattern)((acc, ch) => replace(acc, lit(ch), lit("\\" + ch)))
    val wild = replace(escaped, lit("*"), lit(".*"))
    // a trailing '$' in the source pattern is the end anchor, not a
    // literal: restore it after the escape pass
    concat(lit("^"),
      when(wild.endsWith("\\$"),
        concat(wild.substr(lit(1), length(wild) - 2), lit("$")))
        .otherwise(wild))
  }

  /** Parse robots.txt bodies into the rules table
    * `(host, agent, seq, allow, pattern, rx)` — one row per
    * (group-agent × rule), `seq` the rule's line ordinal (the
    * deterministic final tiebreak), `rx` the precompiled match regex.
    * Input: one row per host with its robots.txt body. */
  def rules(df: DataFrame, host: Column, body: Column): DataFrame = {
    val lines = df
      .select(host.cast("string").as("host"),
        posexplode(split(coalesce(body, lit("")), "\n")).as(Seq("seq", "raw")))
      .select(col("host"), col("seq"),
        trim(regexp_replace(col("raw"), "#.*", "")).as("ln"))
      .select(col("host"), col("seq"),
        lower(regexp_extract(col("ln"), "^([A-Za-z-]+)\\s*:", 1)).as("field"),
        trim(regexp_extract(col("ln"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1)).as("value"))
      .filter(col("field").isin("user-agent", "allow", "disallow"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("seq")
    // a user-agent line opens a NEW group iff the previous kept line
    // was not itself a user-agent line (consecutive UA lines share)
    val grouped = lines
      .withColumn("prev", lag(col("field"), 1, "").over(w))
      .withColumn("gid", sum(
        when(col("field") === "user-agent" && col("prev") =!= "user-agent", 1)
          .otherwise(0)).over(w))
      .filter(col("gid") > 0) // rules before any user-agent line attach to nothing
    val agents = grouped.filter(col("field") === "user-agent")
      .select(col("host"), col("gid"), lower(col("value")).as("agent"))
      .distinct()
    val ruleRows = grouped
      .filter(col("field") =!= "user-agent" && length(col("value")) > 0)
      .select(col("host"), col("gid"), col("seq"),
        (col("field") === "allow").as("allow"), col("value").as("pattern"))
    ruleRows.join(agents, Seq("host", "gid"))
      .select(col("host"), col("agent"), col("seq"), col("allow"),
        col("pattern"), patternRx(col("pattern")).as("rx"))
  }

  /** Sitemap discovery (RFC 9309 §2.3 plus the sitemaps.org
    * extension every crawler honors): `Sitemap:` lines are
    * GROUP-INDEPENDENT — they apply regardless of user-agent and may
    * appear anywhere in the file, including before any group — so
    * they parse on their own pass, not through [[rules]]' grouping.
    * Same line grammar (comment strip, case-insensitive field name,
    * trimmed value); empty values drop; `seq` is the line ordinal
    * (a file can list many sitemaps, order preserved). These URLs
    * seed the frontier ALONGSIDE extracted outlinks — the publisher's
    * own index of what to crawl. Map-only. */
  def sitemaps(df: DataFrame, host: Column, body: Column): DataFrame =
    df.select(host.cast("string").as("host"),
        posexplode(split(coalesce(body, lit("")), "\n")).as(Seq("seq", "raw")))
      .select(col("host"), col("seq"),
        trim(regexp_replace(col("raw"), "#.*", "")).as("ln"))
      .filter(lower(regexp_extract(col("ln"), "^([A-Za-z-]+)\\s*:", 1)) === "sitemap")
      .select(col("host"), col("seq"),
        trim(regexp_extract(col("ln"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1)).as("sitemap"))
      .filter(length(col("sitemap")) > 0)

  /** Decide every URL in `urls` for `agent` against a [[rules]] table:
    * returns the input plus `allowed`. The rules table broadcasts (it
    * is host-census-sized); each URL matches only its own host's
    * applicable group — packed as ONE array per host, so the decision
    * is MAP-ONLY: one broadcast equi-join probe per URL and a
    * higher-order fold over that host's handful of rules (longest
    * matching pattern wins, allow winning length ties; no matching
    * rule → allowed). The previous shape exploded URL × matching-group
    * rules into rows and ranked them with a row_number window — a
    * full-frontier shuffle and sort for a per-row decision. */
  def evaluate(urls: DataFrame, urlCol: Column, agent: String,
      rulesDf: DataFrame): DataFrame = {
    val a = agent.toLowerCase
    // the applicable group per host: the agent's own if any row names
    // it, else the '*' group (RFC 9309: never both)
    val wh = org.apache.spark.sql.expressions.Window.partitionBy("host")
    val applicable = rulesDf
      .filter(col("agent").isin(a, "*"))
      .withColumn("has_own", max(when(col("agent") === a, 1).otherwise(0)).over(wh))
      .filter((col("has_own") === 1 && col("agent") === a) ||
        (col("has_own") === 0 && col("agent") === "*"))
      .select(col("host").as("__rhost"), col("seq"), col("allow"),
        col("pattern"), col("rx"))
    // one row per host: its applicable rules as (len, allow, rx)
    // structs — rule-census-sized, the broadcast side
    val perHost = applicable
      .groupBy(col("__rhost"))
      .agg(collect_list(struct(length(col("pattern")).as("len"),
        col("allow").as("allow"), col("rx").as("rx"))).as("__rules"))
    // EQUI-join on host (a regex predicate in the join condition
    // degenerates a broadcast join to nested-loop — every URL against
    // every rule; measured 17.8 s on the sf0.1 frontier). The path is
    // LET-bound (single-element transform) so the UrlParse extract
    // chain evaluates once per URL, not once per rule (the
    // UrlParse.let lesson); the fold carries (best len so far, allow
    // at that len): a longer match replaces it, an equal-length match
    // ORs allow in — exactly the window's (len DESC, allow DESC) head.
    val decide = element_at(transform(array(
      when(length(UrlParse.path(urlCol)) === 0, lit("/"))
        .otherwise(UrlParse.path(urlCol))), p =>
      aggregate(
        filter(col("__rules"), r => regexp_like(p, r("rx"))),
        struct(lit(-1).as("len"), lit(true).as("allow")),
        (acc, r) =>
          when(r("len") > acc("len"),
            struct(r("len").as("len"), r("allow").as("allow")))
            .when(r("len") === acc("len"),
              struct(acc("len").as("len"),
                (acc("allow") || r("allow")).as("allow")))
            .otherwise(acc),
        acc => acc("allow"))), 1)
    urls
      .join(broadcast(perHost),
        UrlParse.host(urlCol) === col("__rhost"), "left")
      .withColumn("allowed",
        when(col("__rhost").isNull, lit(true)).otherwise(decide))
      .drop("__rhost", "__rules")
  }
}
