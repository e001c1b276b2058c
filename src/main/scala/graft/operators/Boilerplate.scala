package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-template boilerplate removal — the CROSS-PAGE frequency
  * census the per-page density rule
  * ([[HtmlExtract.extractMainText]]'s stage-8 length + link-density
  * cut) cannot express: a block that repeats across most pages of one
  * HOST is site chrome (nav, footer, cookie banner, legal disclaimer)
  * no matter how long or link-free it is. This is the CCNet/C4-class
  * template cut real crawl pipelines run AFTER tag stripping — the
  * canonical counter-example is a 200-char link-free legal footer:
  * the density rule keeps it on every page (long, zero links), the
  * frequency census kills it once per host. (Extension surface: the
  * reference corpus is clean prose — `semantic_search.py:6-13` — so
  * it has no extraction analog.)
  *
  * DESIGN, and why it holds at 100 TB:
  *   - the census is one `array_distinct` + explode + `groupBy
  *     (host, block)` count — distinct-per-page BEFORE the explode so
  *     a block repeated within one page counts that page once, and
  *     partial aggregation combines map-side. Shuffle volume is
  *     bounded by the DISTINCT (host, block) set, not the corpus.
  *   - per-host page counts are a second O(#hosts) aggregate joined
  *     equi on host (no broadcast assumption — #hosts at crawl scale
  *     is large, but the frame is tiny per partition).
  *   - a block is a TEMPLATE iff it appears on ≥ `minPages` pages AND
  *     on ≥ `minPct`% of the host's pages — integer cross-multiply,
  *     no float threshold, replayable in SQL.
  *   - [[stripTemplates]] folds each host's template set into ONE
  *     array (chrome is bounded per host by construction — a site has
  *     one nav, one footer, a handful of banners; a host whose
  *     "template" list explodes signals a crawl bug and shows up in
  *     the census row count loudly), equi-joins it to the pages, and
  *     filters per row with `array_contains` — map-shaped after the
  *     one join, no per-block shuffle.
  */
object Boilerplate {

  /** The template census: for every (host, visible block) that
    * clears the frequency thresholds, one row
    * `(host, block, n_pages, host_pages)`.
    *
    * @param pages    one row per crawled page
    * @param host     the page's host (census partition key)
    * @param pageId   page identity (distinct-page counting)
    * @param blocks   visible block texts, `array<string>`
    *                 ([[HtmlExtract.visibleBlocks]])
    * @param minPages absolute floor — below it a "template" is just a
    *                 coincidence between two pages
    * @param minPct   host-coverage floor in percent (50 = the block
    *                 must sit on at least half the host's pages)
    */
  def templateCensus(pages: DataFrame, host: Column, pageId: Column,
      blocks: Column, minPages: Int = 2, minPct: Int = 50): DataFrame = {
    require(minPages >= 2, s"minPages must be >= 2, got $minPages")
    require(minPct >= 1 && minPct <= 100, s"minPct must be in [1,100], got $minPct")
    val base = pages.select(host.as("host"), pageId.as("__pid"), blocks.as("__bs"))
    val perHost = base.groupBy("host")
      .agg(countDistinct(col("__pid")).as("host_pages"))
    base
      .select(col("host"), col("__pid"),
        explode(array_distinct(col("__bs"))).as("block"))
      .groupBy("host", "block")
      .agg(countDistinct(col("__pid")).as("n_pages"))
      .join(perHost, "host")
      .filter(col("n_pages") >= lit(minPages.toLong) &&
        col("n_pages") * lit(100L) >= col("host_pages") * lit(minPct.toLong))
      .select(col("host"), col("block"), col("n_pages"), col("host_pages"))
  }

  /** Fold a [[templateCensus]] result into one `(host,
    * templates array)` row per host — the shape [[stripTemplates]]
    * joins. Separated so a pipeline can census once and strip many
    * partitions/epochs against the same artifact. */
  def templateSets(census: DataFrame): DataFrame =
    census.groupBy("host")
      .agg(array_sort(collect_list(col("block"))).as("templates"))

  /** Strip each host's template blocks from its pages: returns
    * `pages` plus `__templates` (the host's template array, empty
    * for hosts with none) — callers filter their own block columns
    * with `array_contains` against it, so the cut composes with
    * whatever block representation the caller carries (plain visible
    * text, census structs, marked blocks). One equi-join, map-shaped
    * filtering after it. */
  def stripTemplates(pages: DataFrame, host: Column, sets: DataFrame): DataFrame =
    pages
      .join(sets.withColumnRenamed("host", "__th"),
        host === col("__th"), "left")
      .withColumn("__templates",
        coalesce(col("templates"), array().cast("array<string>")))
      .drop("__th", "templates")
}
