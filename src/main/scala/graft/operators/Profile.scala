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

  /** EXACT quantiles in two narrow passes plus one tiny sorted fetch
    * per quantile — the scale shape that replaces a full global sort
    * (`approx_percentile`'s summaries are merge-order-dependent, so
    * they can't be oracle-gated; a global `orderBy` serializes 100 TB
    * onto one task; this is exact AND bounded):
    *
    * pass 1 = the deterministic equi-width [[histogram]] (min/max
    * aggregate + per-bin counts, O(bins) to the driver); for each
    * requested quantile the target RANK locates its bin by cumulative
    * count, then pass 2 sorts ONLY that bin's rows — the scan is
    * pruned by a one-bin-slack value-range predicate (reaches the
    * parquet source) with the exact floor-bin predicate on top (float
    * rounding at a bin edge can never drop a row), and `limit(rank
    * within bin) → max` fetches the order statistic without ever
    * materializing the bin on the driver.
    *
    * Quantiles are RATIONALS (num, den): the target rank is
    * `ceil(num·N/den)` in integer arithmetic — `(num·N + den − 1) /
    * den` — so both engines compute the identical rank (a double
    * `ceil(0.9 · N)` rounds differently between decimal- and
    * double-typed literals). Returns (q, value) ascending, q =
    * num/den as double. NULL values are excluded from ranking (the
    * SQL convention). */
  def exactQuantiles(df: DataFrame, value: Column,
      quantiles: Seq[(Int, Int)], bins: Int = 64): DataFrame = {
    require(quantiles.nonEmpty, "at least one quantile required")
    quantiles.foreach { case (num, den) =>
      require(num >= 1 && num <= den, s"quantile $num/$den out of (0, 1]")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val v = value.cast("double")
    val rows = df.filter(v.isNotNull)
    val hist = histogram(rows, value, bins).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    if (hist.isEmpty)
      return Seq.empty[(Double, Double)].toDF("q", "value")
    val n = hist.map(_._4).sum
    // bin grid (same exact arithmetic as histogram's)
    val lo = hist.head._2
    val width = hist.head._3 - hist.head._2
    val binExpr =
      if (width == 0.0) lit(0)
      else least(floor((v - lit(lo)) / lit(width)).cast("int"), lit(bins - 1))
    val cum = hist.scanLeft(0L)(_ + _._4).init // cumulative BEFORE each listed bin
    val out = quantiles.map { case (num, den) =>
      val k = (num.toLong * n + den - 1) / den // ceil(num·N/den), exact
      // the first listed bin whose cumulative count reaches k
      val i = cum.indices.find(i0 => cum(i0) + hist(i0)._4 >= k).get
      val (b, bLo, bHi, _) = hist(i)
      val rank = (k - cum(i)).toInt
      val value0 = rows
        .filter(v >= lit(bLo - width) && v <= lit(bHi + width)) // pushable slack range
        .filter(binExpr === b) // exact membership
        .orderBy(v.asc)
        .limit(rank)
        .agg(max(v))
        .head().getDouble(0)
      (num.toDouble / den, value0)
    }
    out.toDF("q", "value").orderBy("q")
  }
}
