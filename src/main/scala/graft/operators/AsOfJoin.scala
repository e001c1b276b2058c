package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` within the same key — the temporal-join
  * primitive (trades-vs-quotes, event attribution) that Spark lacks as
  * a built-in operator.
  *
  * Implementation is the union-window rendering: tag both sides, union,
  * and take `last(right_payload, ignoreNulls)` over a per-key window
  * ordered by (ts, tag) with right rows first at equal timestamps (so
  * "<=" includes same-instant matches). One shuffle on the key — the
  * same cost as a sort-merge join, with no range-condition blowup; at
  * 100 TB this is the shape that avoids a per-row range probe.
  */
object AsOfJoin {

  /** Returns `left` plus `asof_<payloadCol>`: the payload of the
    * latest right row at-or-before the left row's timestamp (null when
    * no prior right row exists). `tieBreak` orders rows within equal
    * (ts, side) for full determinism. */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payloadCol: String,
      tieBreak: String): DataFrame = {
    val l = left.select(col(key), col(ts), col(tieBreak),
      lit(1).as("__tag"), lit(null).cast(right.schema(payloadCol).dataType).as("__p"))
    val r = right.select(col(key), col(ts), col(tieBreak),
      lit(0).as("__tag"), col(payloadCol).as("__p"))
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__tag").asc, col(tieBreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn(s"asof_$payloadCol", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col(key), col(ts), col(tieBreak), col(s"asof_$payloadCol"))
  }
}
