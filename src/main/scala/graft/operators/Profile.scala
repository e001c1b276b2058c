package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric corpus profiling — the ANALYZE-TABLE pass a 100 TB pipeline
  * runs before layout/skew decisions (extension; the reference has no
  * statistics surface). Everything is deterministic and exactly
  * SQL-replayable: histograms use fixed equi-width binning from an
  * exact min/max pass (no sampled boundaries), and moments accumulate
  * through per-row DECIMAL casts (order-independent exact sums — the
  * repo's numeric-determinism convention), so the oracle reproduces
  * every value bit-for-bit. */
object Profile {

  /** Deterministic equi-width histogram of `value`: one exact
    * min/max aggregate fixes the bin grid, then one map-side-combined
    * count per bin — two narrow passes, shuffle O(bins). The maximum
    * lands in the last bin (right-closed top edge). Output:
    * (bin, lo, hi, n) for every NON-EMPTY bin ascending. */
  def histogram(df: DataFrame, value: Column, bins: Int = 32): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val v = value.cast("double")
    val mm = df.agg(min(v).as("lo"), max(v).as("hi")).head()
    if (mm.isNullAt(0))
      return Seq.empty[(Int, Double, Double, Long)].toDF("bin", "lo", "hi", "n")
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = (hi - lo) / bins
    val bin =
      if (width == 0.0) lit(0)
      else least(floor((v - lit(lo)) / lit(width)).cast("int"), lit(bins - 1))
    df.filter(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (lit(lo) + col("bin") * lit(width)).as("lo"),
        (lit(lo) + (col("bin") + 1) * lit(width)).as("hi"),
        col("n"))
      .orderBy("bin")
  }

  /** Exact first/second moments of `value` plus null census, in ONE
    * map-side-combined aggregate: count, nulls, min, max, mean, and
    * population variance — the sums go through DECIMAL(28,10) per-row
    * casts so accumulation order cannot change a bit, and the final
    * divisions are the only floating steps (identical in any engine).
    * Output: one row (n, n_null, min, max, mean, variance). */
  def moments(df: DataFrame, value: Column): DataFrame = {
    val v = value.cast("double")
    // squares compute per-row in double (IEEE-identical in any engine)
    // and only then cast to decimal: a decimal×decimal product would
    // hit engine-specific precision-capping rules
    df.agg(
        count(v).as("n"),
        (count(lit(1)) - count(v)).as("n_null"),
        min(v).as("min"),
        max(v).as("max"),
        sum(v.cast("decimal(28,10)")).cast("double").as("__s1"),
        sum((v * v).cast("decimal(28,10)")).cast("double").as("__s2"))
      .select(col("n"), col("n_null"), col("min"), col("max"),
        (col("__s1") / col("n")).as("mean"),
        (col("__s2") / col("n") - (col("__s1") / col("n")) * (col("__s1") / col("n")))
          .as("variance"))
  }
}
