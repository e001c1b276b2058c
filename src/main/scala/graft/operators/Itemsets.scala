package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining, pair tier (extension — the reference has
  * no relational surface): the co-occurrence census a pipeline runs to
  * find items/tokens/domains that systematically appear together
  * (co-purchase graphs, co-citation, template detection in a crawl).
  */
object Itemsets {

  /** A-Priori frequent-PAIR mining (Agrawal & Srikant, VLDB '94; run
    * as the classic two-pass distributed shape — the SON/Park-Chen-Yu
    * lineage): pass 1 counts per-item support and keeps items at
    * `itemMinSupport`+; pass 2 counts only pairs whose BOTH members
    * survived pass 1 (the a-priori pruning rule: a pair can't be
    * frequent unless both items are), then thresholds at
    * `pairMinSupport`. Input is an exploded basket table; (basket,
    * item) dedups internally so multiplicity inside one basket can't
    * inflate support. Output `(item_a, item_b, supp)` with
    * `item_a < item_b`, all-integer (exactly SQL-replayable).
    *
    * Scale shape: pass 1 is one map-side-combined count. Pass 2
    * semi-joins baskets against the surviving item set — at a real
    * support threshold that set is MODEL-sized (≤ Σ|baskets| /
    * itemMinSupport ids) and broadcasts — then self-joins the
    * filtered basket table on `basket`: one hash-partitioning that
    * Spark reuses for both sides (same frame), with per-basket output
    * bounded by the surviving-item count per basket squared. Nothing
    * enumerates the item×item domain; candidate pairs exist only
    * where a basket witnesses them. At 100 TB the pair census shuffle
    * is O(Σ sz²) of the PRUNED baskets — the a-priori filter is what
    * keeps that quadratic term on frequent items only. */
  def frequentPairs(baskets: DataFrame, basketCol: String, itemCol: String,
      itemMinSupport: Long, pairMinSupport: Long): DataFrame = {
    require(itemMinSupport >= 1, s"itemMinSupport must be >= 1, got $itemMinSupport")
    require(pairMinSupport >= 1, s"pairMinSupport must be >= 1, got $pairMinSupport")
    // checkpoint the deduped basket table: both passes read it, and
    // without the barrier the scan + distinct run once per pass (the
    // two column-pruned consumers canonicalize differently, so AQE
    // exchange reuse does not collapse them — profiled as two full
    // input scans of one warm execution)
    val b = baskets
      .select(col(basketCol).cast("long").as("basket"),
        col(itemCol).cast("long").as("item"))
      .distinct()
      .localCheckpoint()
    val freq = b.groupBy("item").agg(count(lit(1)).as("c"))
      .filter(col("c") >= itemMinSupport)
      .select("item")
    // model-sized by construction: broadcast the survivors so the
    // pass-2 prune is a map-side semi-join, not an O(E) shuffle
    // NOT explicitly repartitioned: an explicit basket-keyed exchange
    // before the self-join was A/B'd in round 17 (flat time, shuffle
    // bytes 5 → 22 MB) — at this table's shape the exchange costs what
    // the extra parallelism buys
    val fb = b.join(broadcast(freq), Seq("item"), "left_semi")
    fb.as("x")
      .join(fb.as("y"),
        col("x.basket") === col("y.basket") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= pairMinSupport)
  }
}
