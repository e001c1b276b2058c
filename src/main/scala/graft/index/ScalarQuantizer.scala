package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization for vector compression: per-dimension
  * min/max over the corpus define a linear code, each float becomes a
  * byte in [0, 255] — 4x memory reduction on the stored index, with
  * approximate distances computed directly on codes (the memory lever
  * that keeps a 100 TB vector corpus in cluster RAM).
  *
  * Everything is deterministic: min/max are exact order-independent
  * aggregates, the encode floor is tie-free on identical doubles, so
  * encode/decode/distance all have exact DuckDB twins for the oracle.
  * (Extension: the reference stores raw f32 only, `disk_store.rs:7-11`.)
  */
object ScalarQuantizer {

  /** Per-dimension (min, max) bounds: Model rows = (pos, lo, hi). */
  def train(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x")).cast("double").as("lo"), max(col("x")).cast("double").as("hi"))

  /** Bounds packed to arrays (pos-sorted), for the expression API. */
  def bounds(model: DataFrame): (Seq[Double], Seq[Double]) = {
    val rows = model.orderBy("pos").collect()
    (rows.map(_.getDouble(1)).toSeq, rows.map(_.getDouble(2)).toSeq)
  }

  /** Encode a float vector column to int codes in [0, 255]:
    * floor((x - lo) / (hi - lo) * 255), clamped; degenerate dims
    * (hi == lo) encode to 0. Native fused loop (bounds ship as
    * reference arrays). */
  def encodeExpr(vec: Column, lo: Seq[Double], hi: Seq[Double]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    toCol(graft.functions.expressions.SqEncode(
      toExpr(vec.cast("array<float>")), lo.toArray, hi.toArray))
  }

  /** Decode codes back to (approximate) doubles: lo + code/255*(hi-lo). */
  def decodeExpr(codes: Column, lo: Seq[Double], hi: Seq[Double]): Column = {
    val loLit = typedLit(lo)
    val hiLit = typedLit(hi)
    zip_with(
      zip_with(codes, loLit, (c, l) => struct(c.cast("double").as("c"), l.as("l"))),
      hiLit,
      (s, h) => s("l") + s("c") / 255.0 * (h - s("l")))
  }

  /** Squared L2 between a code array and a raw float query, via decode
    * (asymmetric distance — query stays full precision). Native fused
    * loop with the same decode arithmetic and dim-ascending
    * accumulation as the HOF form the oracle mirrors. */
  def adcL2Sq(codes: Column, queryVec: Column, lo: Seq[Double], hi: Seq[Double]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    toCol(graft.functions.expressions.SqAdc(
      toExpr(codes), toExpr(queryVec.cast("array<float>")), lo.toArray, hi.toArray))
  }
}
