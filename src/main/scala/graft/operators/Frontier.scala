package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl fetch-budget apportionment — the scheduling step between
  * "hosts are ranked" ([[Graph.pageRankWeighted]] over the link
  * graph) and "issue this round's fetches": split an integer budget
  * of N fetches across hosts PROPORTIONALLY to rank mass, exactly,
  * then clip each host to its demand/politeness ceiling.
  *
  * Method: Hamilton largest-remainder apportionment in exact integer
  * arithmetic — rank mass enters as its already-exact micro-units
  * (`floor(rank·1e12)`, the PageRank pipeline's own representation),
  * `base_i = (N·R_i) div ΣR`, and the `N - Σbase` leftover seats go
  * to the largest remainders `(N·R_i) mod ΣR` (host ascending on
  * ties). Σalloc == N exactly, before clipping. Products run in
  * DECIMAL(38,0): |N·R_i| ≤ N·10¹² stays exact for any budget below
  * ~10²⁶ — no overflow guard needed at crawl scales (the adjustedRand
  * bound convention, comfortably not binding here).
  *
  * Clipping (`least(alloc, cap)`) happens AFTER the proportional
  * split and the clipped mass is NOT redistributed within the call —
  * one call is one apportionment ROUND. A scheduler that wants
  * cap-aware redistribution runs the op again on the unclipped hosts
  * with the residual budget (FrontierSpec pins that the iteration
  * converges); keeping the op single-round keeps it replayable and
  * side-effect-free.
  *
  * Scale shape: the input is the HOST census (one row per ranked
  * host — already aggregated, never corpus-sized); the two global
  * windows (remainder ranking, Σbase) sort that census, which is the
  * same bounded cost every census-consumer here accepts. */
object Frontier {

  /** Crawl-trap census — the frontier-hygiene detector for URL-space
    * explosions (calendar pages, session ids in query strings,
    * faceted-search grids): a single (host, path) that fans out into
    * unboundedly many distinct URLs is a trap the crawler must cap or
    * skip, because every fetch discovers more of the same page.
    * PINNED rule: group the frontier by (host, path — query
    * excluded), count DISTINCT full URLs, flag groups whose count
    * exceeds `cap`. Path-EMBEDDED ids (e.g. `;sid=` path params) are
    * out of scope by construction — they need a path-prefix
    * generalization census, a different operator.
    *
    * Scale shape: one groupBy bounded by the distinct (host, path)
    * set with an exact in-group distinct count — exact because this
    * census IS the detector (an approximate count that under-reports
    * right at the cap silently admits the trap); the frontier is
    * already URL-deduped upstream, so the count is a row count per
    * group in the common case. */
  def trapCensus(urls: DataFrame, urlCol: Column, cap: Long): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    urls.select(UrlParse.host(urlCol).as("host"),
        UrlParse.path(urlCol).as("path"), urlCol.as("__u"))
      .groupBy("host", "path")
      .agg(countDistinct(col("__u")).as("n_urls"))
      .filter(col("n_urls") > cap)
  }

  /** @param hosts  one row per host: `host` (string), `rank` (the
    *               1e-12-floored double the PR pipeline emits) and
    *               `cap` (per-host ceiling: min(frontier demand,
    *               politeness limit); negative caps are invalid)
    * @param budget this round's total fetch budget, ≥ 0
    * @return (host, alloc_raw, alloc): the exact Hamilton share and
    *         its clipped value */
  def apportion(hosts: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val base = hosts.select(col("host"),
      expr("CAST(floor(rank * 1e12) AS DECIMAL(38,0))").as("__r"),
      when(col("cap") < 0,
        raise_error(concat(lit("apportion: negative cap on host "), col("host"))))
        .otherwise(col("cap").cast("long")).as("__cap"))
    val tot = base.agg(sum(col("__r")).as("__tot"))
    val w = base.crossJoin(broadcast(tot))
      .withColumn("__num", expr(s"CAST($budget AS DECIMAL(38,0)) * __r"))
      // a positive budget with zero total rank mass is a config error
      // (nothing to be proportional TO) — fail loudly, don't invent a
      // distribution
      .withColumn("__base", expr(
        s"""CASE WHEN __tot > 0 THEN __num DIV __tot
           |WHEN $budget = 0 THEN CAST(0 AS DECIMAL(38,0))
           |ELSE CAST(raise_error('apportion: total rank mass is zero but budget > 0')
           |  AS DECIMAL(38,0)) END""".stripMargin))
      .withColumn("__frac",
        expr("CASE WHEN __tot > 0 THEN __num - __base * __tot ELSE CAST(0 AS DECIMAL(38,0)) END"))
    val ord = Window.orderBy(col("__frac").desc, col("host").asc)
    val sb = w.agg(sum(col("__base")).as("__sb"))
    w.crossJoin(broadcast(sb))
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__alloc",
        (col("__base") + when(col("__rn") <= expr(s"CAST($budget AS DECIMAL(38,0)) - __sb"),
          lit(1)).otherwise(lit(0))).cast("long"))
      .select(col("host"), col("__alloc").as("alloc_raw"),
        least(col("__alloc"), col("__cap")).as("alloc"))
  }
}
