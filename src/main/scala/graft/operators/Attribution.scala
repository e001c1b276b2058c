package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversion attribution over an event log (extension — the reference
  * has no event surface): the census that decides which upstream
  * touchpoint "earns" each conversion, the standard funnel-adjacent
  * question an events pipeline answers after sessionization.
  */
object Attribution {

  /** LAST-TOUCH attribution: each conversion event credits the user's
    * most recent PRIOR non-conversion event type (the industry-default
    * single-touch model); conversions with no prior touch in the log
    * credit `"none"`. Returns the per-touch-type census
    * `(touch_type, n_conv, value_sum)` where `value_sum` adds the
    * conversion values DECIMAL-exactly before one final 4-dp rounding
    * — no merge-order float noise, the moments-profile convention.
    *
    * `id` breaks timestamp ties deterministically (two events in the
    * same microsecond would otherwise make the "most recent" pick
    * partition-dependent and ungateable).
    *
    * Scale shape: ONE window shuffle partitioned by user — state per
    * task is a single running "last touch" value per user sequence,
    * never the whole history — then one map-side-combined census over
    * O(#event types) groups. Nothing collects; nothing is quadratic
    * in the log. */
  def lastTouch(events: DataFrame, user: Column, ts: Column, id: Column,
      typ: Column, value: Column, convType: String): DataFrame = {
    val base = events.select(user.as("__u"), ts.as("__ts"), id.as("__id"),
      typ.as("__t"), value.as("__v"))
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__ts").asc, col("__id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("__touch",
        last(when(col("__t") =!= convType, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__t") === convType)
      .groupBy(coalesce(col("__touch"), lit("none")).as("touch_type"))
      .agg(count(lit(1)).as("n_conv"),
        round(sum(col("__v").cast("decimal(18,6)")).cast("double"), 4)
          .as("value_sum"))
  }

  /** Top-k length-3 behavioural paths: the census of consecutive
    * event-type triples across every user sequence (`t1>t2>t3`,
    * ordered by time with the id tiebreak), counted corpus-wide and
    * top-k'd by (count DESC, path) — the sequence-mining staple that
    * feeds funnel design and next-event models. Paths never cross
    * users; sequences shorter than 3 contribute nothing.
    *
    * Scale shape: one user-partitioned window (two `lead`s of a
    * one-byte-ish type column — O(1) state), one map-side-combined
    * path census over O(|types|³) keys, and a bounded top-k — never a
    * global sort over the log. */
  def topPaths(events: DataFrame, user: Column, ts: Column, id: Column,
      typ: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__ts").asc, col("__id").asc)
    events.select(user.as("__u"), ts.as("__ts"), id.as("__id"), typ.as("__t"))
      .select(col("__t").as("t1"),
        lead(col("__t"), 1).over(w).as("t2"),
        lead(col("__t"), 2).over(w).as("t3"))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(concat_ws(">", col("t1"), col("t2"), col("t3")).as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }
}
