package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Time-range join: for each left row, aggregate the right rows of the
  * same key whose timestamp falls in the trailing window
  * `[left.ts − window, left.ts)` — the attribution/feature-window
  * primitive (clicks before a purchase, requests before an error) that
  * Spark only offers as an inequality theta-join, which planners
  * execute as a per-key cross product.
  *
  * Implementation BINS both sides by the window width: a right row in
  * the trailing window of a left row always lands in the left row's
  * bin or the one before it, so each left row joins exactly TWO
  * (key, bin) buckets and the candidate set is bounded by bin
  * occupancy — never a key's whole history. At 100 TB this turns the
  * O(|L|·|R|) per-key blowup into one equi-shuffle on (key, bin) plus
  * a residual filter, the same standard trick interval-join engines
  * (e.g. stream processors' interval joins) use.
  *
  * (Extension — the reference has no joins at all; this joins the
  * as-of operator in the relational suite as the second temporal-join
  * shape.)
  */
object RangeJoin {

  /** Returns one row per left row: (`leftId`, `key`, `n` = count of
    * right rows with the same key and `rightTs` in
    * `[leftTs − windowMicros, leftTs)`). Left rows with no matches
    * appear with n = 0 (left semantics); timestamps are epoch-micros
    * longs. */
  def countInWindow(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftId: String,
      leftTs: String,
      rightTs: String,
      windowMicros: Long,
      outCol: String = "n"): DataFrame = {
    require(windowMicros > 0, "window must be positive")
    val w = lit(windowMicros)
    // floor-divide (not integer-divide) so pre-epoch timestamps bin
    // consistently on both sides
    def binOf(c: org.apache.spark.sql.Column) = floor(c.cast("double") / w).cast("long")
    val r = right.select(col(key), col(rightTs).as("__rts"))
      .withColumn("__bin", binOf(col("__rts")))
    val l = left.select(col(key), col(leftId), col(leftTs).as("__lts"))
      // a trailing-window candidate lives in the left row's bin or the
      // previous one — exactly two buckets per left row
      .withColumn("__bin", explode(array(binOf(col("__lts")) - 1, binOf(col("__lts")))))
    val matched = l.join(r, Seq(key, "__bin"))
      .filter(col("__rts") >= col("__lts") - w && col("__rts") < col("__lts"))
      .groupBy(col(leftId))
      .agg(count(lit(1)).as(outCol))
    left.select(col(leftId), col(key))
      .join(matched, Seq(leftId), "left")
      .na.fill(0L, Seq(outCol))
  }
}
