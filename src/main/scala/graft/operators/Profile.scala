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

  /** Calibration (reliability-diagram) census — the diagnostic
    * companion of the ranking trio ([[aucCensus]] / [[youden]] /
    * [[averagePrecision]]): those say whether and where a score
    * separates a class; this says whether the score's MAGNITUDE means
    * anything — per equi-width score bin ([[histogram]]'s exact grid
    * convention: one min/max aggregate fixes the edges, max lands in
    * the last bin), the bin's observed positive rate beside its mean
    * score. A calibrated score tracks the diagonal; a ranking-only
    * score doesn't, and a review needs to know which it holds before
    * using the value as a probability. Sums are DECIMAL-exact (the
    * [[moments]] convention); the two per-bin ratios are the only
    * floating steps, 6-dp rounded. Output: `(bin, lo, hi, n, n_pos,
    * mean_score, pos_rate)` per non-empty bin ascending. */
  def calibrationCensus(df: DataFrame, score: Column, isPos: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val v = score.cast("double")
    val mm = df.agg(min(v).as("lo"), max(v).as("hi")).head()
    if (mm.isNullAt(0))
      return Seq.empty[(Int, Double, Double, Long, Long, Double, Double)]
        .toDF("bin", "lo", "hi", "n", "n_pos", "mean_score", "pos_rate")
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = (hi - lo) / bins
    val bin =
      if (width == 0.0) lit(0)
      else least(floor((v - lit(lo)) / lit(width)).cast("int"), lit(bins - 1))
    df.filter(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(isPos, 1L).otherwise(0L)).as("n_pos"),
        sum(v.cast("decimal(28,10)")).cast("double").as("__s"))
      .select(col("bin"),
        (lit(lo) + col("bin") * lit(width)).as("lo"),
        (lit(lo) + (col("bin") + 1) * lit(width)).as("hi"),
        col("n"), col("n_pos"),
        round(col("__s") / col("n").cast("double"), 6).as("mean_score"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6).as("pos_rate"))
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

  /** Per-group Pearson correlation of two numeric columns — the
    * profiling diagnostic that turns two per-column censuses into a
    * RELATIONSHIP check (chars-per-token drift across sources, value
    * vs. length coupling): one map-side-combined aggregate carrying
    * the five classical sums, nothing wider than O(#groups) after the
    * combine. The [[moments]] exactness convention: per-row products
    * compute in double (IEEE-identical in any engine) and cast to
    * DECIMAL(28,10) BEFORE summing, so accumulation order cannot
    * change a bit; the final assembly is a handful of double ops both
    * engines execute identically, rounded once. Rows with a NULL/NaN
    * on either side are excluded (the SQL covariance convention);
    * a group with zero variance on either side has no defined r and
    * yields NULL rather than ±inf. */
  def pearson(df: DataFrame, group: Column, x: Column, y: Column,
      dp: Int = 6): DataFrame = {
    val (agg, vx, vy, nd) = fiveSums(df, group, x, y)
    agg.select(col("grp"), col("n"),
      when(vx > 0.0d && vy > 0.0d,
        round((nd * col("__sxy") - col("__sx") * col("__sy")) /
          sqrt(vx * vy), dp))
        .as("r"))
  }

  /** Per-group ordinary-least-squares line y = slope·x + intercept —
    * the same five exact sums as [[pearson]], assembled into the
    * regression coefficients instead of the correlation (slope =
    * cov/var_x, intercept from the means): the fit behind
    * rank-frequency (Zipf) slopes, scaling-law eyeballs, and any
    * "does y grow linearly with x per group" QA. Zero-variance-x
    * groups have no defined line and yield NULL coefficients. */
  def linearFit(df: DataFrame, group: Column, x: Column, y: Column,
      dp: Int = 6): DataFrame = {
    val (agg, vx, _, nd) = fiveSums(df, group, x, y)
    val slope = (nd * col("__sxy") - col("__sx") * col("__sy")) / vx
    agg.select(col("grp"), col("n"),
      when(vx > 0.0d, round(slope, dp)).as("slope"),
      when(vx > 0.0d,
        round((col("__sy") - slope * col("__sx")) / nd, dp)).as("intercept"))
  }

  /** The shared exact-sum census behind [[pearson]] and [[linearFit]]:
    * one map-side-combined aggregate of (n, Σx, Σy, Σxy, Σx², Σy²)
    * with DECIMAL(28,10) per-row casts (products computed in double
    * first — the [[moments]] rule), NULL/NaN rows excluded. */
  private def fiveSums(df: DataFrame, group: Column, x: Column, y: Column)
      : (DataFrame, Column, Column, Column) = {
    val xd = x.cast("double")
    val yd = y.cast("double")
    val agg = df
      .filter(xd.isNotNull && yd.isNotNull && !isnan(xd) && !isnan(yd))
      .groupBy(group.as("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(xd.cast("decimal(28,10)")).cast("double").as("__sx"),
        sum(yd.cast("decimal(28,10)")).cast("double").as("__sy"),
        sum((xd * yd).cast("decimal(28,10)")).cast("double").as("__sxy"),
        sum((xd * xd).cast("decimal(28,10)")).cast("double").as("__sxx"),
        sum((yd * yd).cast("decimal(28,10)")).cast("double").as("__syy"))
    val nd = col("n").cast("double")
    val vx = nd * col("__sxx") - col("__sx") * col("__sx")
    val vy = nd * col("__syy") - col("__sy") * col("__sy")
    (agg, vx, vy, nd)
  }

  /** EXACT quantiles in two narrow passes plus one tiny sorted fetch
    * per quantile — the scale shape that replaces a full global sort
    * (`approx_percentile`'s summaries are merge-order-dependent, so
    * they can't be oracle-gated; a global `orderBy` serializes 100 TB
    * onto one task; this is exact AND bounded):
    *
    * pass 1 = deterministic equi-width bin counts (min/max aggregate
    * + per-bin census, O(bins) to the driver); each requested
    * quantile's target RANK locates its bin by cumulative count, then
    * pass 2 is ONE job fetching every order statistic at once: only
    * the needed bins' rows survive a fused semi-join filter, a window
    * ranks within each bin partition (~N/bins rows — never a global
    * sort), and a broadcast join against the tiny (bin, rank, q)
    * target table picks the values ([[groupedQuantiles]] with a
    * single constant group — this method delegates to it).
    *
    * Quantiles are RATIONALS (num, den): the target rank is
    * `ceil(num·N/den)` in integer arithmetic — `(num·N + den − 1) /
    * den` — so both engines compute the identical rank (a double
    * `ceil(0.9 · N)` rounds differently between decimal- and
    * double-typed literals). Returns (q, value) ascending, q =
    * num/den as double. NULL values are excluded from ranking (the
    * SQL convention). */
  def exactQuantiles(df: DataFrame, value: Column,
      quantiles: Seq[(Int, Int)], bins: Int = 64): DataFrame =
    groupedQuantiles(df, lit("_"), value, quantiles, bins)
      .select(col("q"), col("value"))
      .orderBy("q")

  /** Exact WEIGHTED quantiles — the size-biased view of a value
    * distribution (weighted by integer `weight` ≥ 1): "the p50
    * DOCUMENT is 300 chars, but the p50 TOKEN lives in a 450-char
    * document" — the statistic that prices sequence packing and
    * chunking, where what matters is what a typical token sees, not
    * a typical row. The weighted q-quantile is the smallest value v
    * with cumWeight(≤ v) ≥ ⌈q·W⌉ — equivalently the plain quantile
    * of the multiset with each row repeated `weight` times
    * (ProfileSpec pins that equivalence against [[exactQuantiles]]
    * on the exploded multiset).
    *
    * Same no-global-sort shape as [[exactQuantiles]]: pass 1 is a
    * per-bin WEIGHT census over the shared equi-width grid (shuffle
    * O(bins)); the driver locates each target's bin and in-bin
    * weighted rank in exact integer arithmetic (k = (num·W + den −
    * 1) div den); pass 2 ranks only the needed bins by cumulative
    * weight window (partitions of ~n/bins rows). Under value ties
    * the covering row depends on the window's internal tie order,
    * but its VALUE doesn't (cum crosses the target inside the tied
    * run) — and only the value is emitted, so the result is total-
    * order-free and oracle-replayable. Rows with NULL or < 1 weights
    * are rejected loudly (a silent drop would bias every quantile). */
  def weightedQuantiles(df: DataFrame, value: Column, weight: Column,
      quantiles: Seq[(Int, Int)], bins: Int = 64): DataFrame = {
    require(quantiles.nonEmpty, "at least one quantile required")
    quantiles.foreach { case (num, den) =>
      require(num >= 1 && num <= den, s"quantile $num/$den out of (0, 1]")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val v = value.cast("double")
    val wc = when(weight.isNull || weight.cast("long") < 1L,
      raise_error(concat(lit("weightedQuantiles: weight must be a " +
        "non-null positive integer, got "), weight.cast("string"))))
      .otherwise(weight.cast("long"))
    val rows = df.filter(v.isNotNull).select(v.as("__v"), wc.as("__w"))
    val mm = rows.agg(min(col("__v")).as("lo"), max(col("__v")).as("hi")).head()
    if (mm.isNullAt(0))
      return Seq.empty[(Double, Double)].toDF("q", "value")
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = (hi - lo) / bins
    val binExpr =
      if (width == 0.0) lit(0)
      else least(floor((col("__v") - lit(lo)) / lit(width)).cast("int"), lit(bins - 1))
    val census = rows.groupBy(binExpr.as("__b"))
      .agg(sum(col("__w")).as("sw"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val totalW = census.map(_._2).sum
    val cum = census.scanLeft(0L)(_ + _._2).init
    val targets = quantiles.map { case (num, den) =>
      val k = (num.toLong * totalW + den - 1) / den
      val i = cum.indices.find(i0 => cum(i0) + census(i0)._2 >= k).get
      (census(i)._1, k - cum(i), num.toDouble / den)
    }
    val targetDf = targets.toDF("__b", "__r", "q")
    val needed = targets.map(_._1).distinct.toDF("__b")
    // pass-2 scan prune (the groupedQuantiles fetchRows pattern): the
    // needed bins' value span as pushable native-type literals, so
    // parquet row groups outside it never read; the exact bin
    // semi-join below does the precise cut
    val fetchRows =
      if (width == 0.0) rows
      else {
        val dt = df.select(value).schema.head.dataType
        val bs = targets.map(_._1)
        val loB = lo + bs.min * width - width - 1
        val hiB = lo + (bs.max + 1) * width + width + 1
        df.filter(value >= lit(loB).cast(dt) && value <= lit(hiB).cast(dt))
          .filter(v.isNotNull)
          .select(v.as("__v"), wc.as("__w"))
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    fetchRows.withColumn("__b", binExpr)
      .join(broadcast(needed), Seq("__b"), "left_semi")
      .withColumn("__cum", sum(col("__w")).over(w))
      .join(broadcast(targetDf), Seq("__b"))
      .filter(col("__cum") >= col("__r") && col("__cum") - col("__w") < col("__r"))
      .select(col("q"), col("__v").as("value"))
      .orderBy("q")
  }

  /** Robust location/scale census: EXACT median, MAD (median absolute
    * deviation — itself an exact order statistic of |x − median|, so
    * two [[exactQuantiles]] passes, never a global sort), and the
    * robust-z outlier count at |x − median| > 3·1.4826·MAD (1.4826 =
    * the normal-consistency constant making MAD estimate σ). The
    * outlier pass a pipeline trusts when the data ITSELF is
    * contaminated — a plain z-score threshold moves with the
    * outliers it hunts; the median/MAD pair doesn't (50% breakdown).
    * One row: (median, mad, n, n_outliers). Every value is an exact
    * order statistic or an integer count — deterministic at any
    * parallelism and exactly oracle-replayable. */
  def robustStats(df: DataFrame, value: Column): DataFrame = {
    val med = exactQuantiles(df, value, Seq((1, 2)))
      .collect()(0).getDouble(1)
    val dev = df.select(abs(value.cast("double") - lit(med)).as("d"))
    val mad = exactQuantiles(dev, col("d"), Seq((1, 2)))
      .collect()(0).getDouble(1)
    val thr = 3.0 * 1.4826 * mad
    df.agg(count(lit(1)).as("n"),
        sum(when(abs(value.cast("double") - lit(med)) > lit(thr), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(lit(med).as("median"), lit(mad).as("mad"),
        col("n"), col("n_outliers"))
  }

  /** Per-GROUP exact quantiles — the per-source length/score profile a
    * corpus QA runs ("p50/p95 doc length per source") — in two passes
    * plus ONE bounded fetch job for every (group, quantile) at once:
    *
    * pass 1 aggregates (group, bin) counts over a shared equi-width
    * grid (one exact global min/max fixes it; map-side combined,
    * shuffle O(groups·bins)); the driver locates each group-quantile's
    * bin and in-bin rank from that census (O(groups·bins) state — the
    * BOUNDED-GROUP contract: sources/domains/languages, not user
    * ids); pass 2 is one job — rows of any needed (group, bin) pair
    * survive a fused filter, a window ranks WITHIN each (group, bin)
    * (partitions of ~n_g/bins rows, never a global or per-group full
    * sort), and a broadcast join against the tiny (group, bin, rank,
    * q) target table picks each order statistic.
    *
    * Same rational-rank convention as [[exactQuantiles]]. Returns
    * (group, q, value) ascending; groups with no non-null rows are
    * absent. */
  def groupedQuantiles(df: DataFrame, group: Column, value: Column,
      quantiles: Seq[(Int, Int)], bins: Int = 64): DataFrame = {
    require(quantiles.nonEmpty, "at least one quantile required")
    quantiles.foreach { case (num, den) =>
      require(num >= 1 && num <= den, s"quantile $num/$den out of (0, 1]")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val v = value.cast("double")
    val g = group.cast("string")
    val rows = df.filter(v.isNotNull && g.isNotNull)
      .select(g.as("__g"), v.as("__v"))
    val mm = rows.agg(min(col("__v")).as("lo"), max(col("__v")).as("hi")).head()
    if (mm.isNullAt(0))
      return Seq.empty[(String, Double, Double)].toDF("group", "q", "value")
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = (hi - lo) / bins
    val binExpr =
      if (width == 0.0) lit(0)
      else least(floor((col("__v") - lit(lo)) / lit(width)).cast("int"), lit(bins - 1))
    // pass 1: (group, bin) census — O(groups·bins) to the driver
    val census = rows.groupBy(col("__g"), binExpr.as("__b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // driver: per (group, quantile) → (bin, rank within bin)
    val perGroup = census.groupBy(_._1)
    val targets = perGroup.toSeq.flatMap { case (grp, bs) =>
      val sorted = bs.sortBy(_._2)
      val n = sorted.map(_._3).sum
      val cum = sorted.scanLeft(0L)(_ + _._3).init
      quantiles.map { case (num, den) =>
        val k = (num.toLong * n + den - 1) / den
        val i = cum.indices.find(i0 => cum(i0) + sorted(i0)._3 >= k).get
        (grp, sorted(i)._2, k - cum(i), num.toDouble / den)
      }
    }
    val targetDf = targets.toDF("__g", "__b", "__r", "q")
    // pass 2: one job — rank within each needed (group, bin) partition
    // (bounded ~n_g/bins rows each), pick the target order statistics.
    // The fetch scan carries a PUSHABLE coarse prune: the needed bins'
    // global edge span as native-type literals (comparing the raw
    // column, not its double cast, so parquet min/max stats skip row
    // groups outside the span; a full-bin + 1 slack each side makes
    // integral-literal truncation harmless). The exact (group, bin)
    // semi-join does the precise cut post-scan.
    val neededBins = targets.map(t => (t._1, t._2)).distinct.toDF("__g", "__b")
    val fetchRows =
      if (width == 0.0) rows
      else {
        val dt = df.select(value).schema.head.dataType
        val bs = targets.map(_._2)
        val loB = lo + bs.min * width - width - 1
        val hiB = lo + (bs.max + 1) * width + width + 1
        df.filter(value >= lit(loB).cast(dt) && value <= lit(hiB).cast(dt))
          .filter(v.isNotNull && g.isNotNull)
          .select(g.as("__g"), v.as("__v"))
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g"), col("__b")).orderBy(col("__v").asc)
    fetchRows.withColumn("__b", binExpr)
      .join(broadcast(neededBins), Seq("__g", "__b"), "left_semi")
      .withColumn("__r", row_number().over(w).cast("long"))
      .join(broadcast(targetDf), Seq("__g", "__b", "__r"))
      .select(col("__g").as("group"), col("q"), col("__v").as("value"))
      .orderBy("group", "q")
  }

  /** Whole-table column profile — the schema-health census a pipeline
    * runs on every new corpus drop before anything downstream trusts
    * it: per column, row count, NULL count, and EXACT distinct count
    * (`(column, n_rows, n_null, n_distinct)`; n_distinct excludes
    * NULLs, the SQL COUNT DISTINCT convention). The tripwire for
    * silently-broken joins (key cardinality collapsed), dead columns
    * (all NULL), and fixture drift.
    *
    * Scale shape: one narrow census PER COLUMN, each a column-pruned
    * scan (`ReadSchema` carries exactly one field — columnar formats
    * make N single-column passes cheaper than one N-column pass) into
    * Spark's two-phase distinct aggregate (partial per partition,
    * merge on the key). Deliberately NOT one multi-countDistinct
    * aggregate: Catalyst plans that through Expand, multiplying every
    * corpus row ×N into the shuffle — the wrong trade at 100 TB. For
    * columns too hot even for a two-phase exact distinct, the O(m)
    * register sketches ([[Sketches]]) are the documented fallback. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    cols.map { c =>
      df.select(col(c))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"))
    }.reduce(_ unionAll _)
  }

  /** Exact two-sample Kolmogorov-Smirnov statistic — the
    * distribution-drift test a pipeline runs between two slices of a
    * statistic (this crawl snapshot vs the last one, source A vs
    * source B) before trusting per-source thresholds tuned on the
    * other slice; the nonparametric complement to the binned-KL gate.
    * D = max over x of |F_a(x) − F_b(x)|, computed in EXACT integer
    * arithmetic: the gap at x is |cumA(x)·n_b − cumB(x)·n_a| (an
    * integer), maximized over the distinct-value domain, and only the
    * final report divides — `d_micro` = ⌊d_num·10⁶/(n_a·n_b)⌋, with
    * the raw numerator beside it so nothing float-sensitive is
    * gated. One row: `(n_a, n_b, d_num, d_micro, at_value)` where
    * `at_value` is the smallest value attaining the max gap (the
    * drift location).
    *
    * Contract: the value must be DISCRETE/quantized (counts collapse
    * by value, and the cumulative pass runs over the distinct-value
    * domain in one ordered partition) — a continuous statistic goes
    * through [[histogram]]-style binning first. That makes the heavy
    * part ONE map-side-combined (value → countA, countB) census of
    * O(|domain|) output; everything after is domain-sized. */
  /** Per-group one-vs-rest KS census — [[ksTwoSample]] for EVERY
    * group in one query: each group's exact D statistic against the
    * pooled rest of the corpus, `(group, n_g, n_rest, d_num, d_micro,
    * at_value)` per group. The whole-corpus drift screen a multi-
    * source pipeline runs per snapshot: which sources' distributions
    * moved, by how much, and where.
    *
    * gap_g(x) = |cum_g(x)·(N−n_g) − (cumT(x)−cum_g(x))·n_g| in exact
    * integers, maximized over the value domain.
    *
    * Scale shape: one map-side-combined (group, value) census, then
    * everything runs on the DENSE group×domain grid — bounded by the
    * same two contracts the inputs already carry (quantized value
    * domain, census-sized group count), built as a broadcast
    * crossJoin so no corpus row is touched twice. The cumulative
    * window partitions BY GROUP (parallel, domain-sized partitions),
    * unlike the single-pair arm's one-partition pass. */
  def ksByGroup(df: DataFrame, group: Column, value: Column): DataFrame =
    ksByGroupCensus(groupValueCensus(df, group, value))

  /** The `(group, value) → count` census [[ksByGroup]] and
    * [[psiByGroup]] both run on — build it ONCE and feed both when a
    * dashboard reads the two statistics over the same column (the
    * drift-panel shape): the corpus scan and the census shuffle are
    * the only corpus-sized work either statistic does. Checkpointed:
    * each consumer reads it several times. */
  def groupValueCensus(df: DataFrame, group: Column, value: Column): DataFrame = {
    val v = value.cast("double")
    val g = group.cast("string")
    df.filter(v.isNotNull && g.isNotNull)
      .groupBy(g.as("__g"), v.as("__v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // grid + totals + domain all read it
  }

  /** [[ksByGroup]] over a pre-built [[groupValueCensus]]. */
  def ksByGroupCensus(r: DataFrame): DataFrame = {
    val vals = r.select(col("__v")).distinct()
    val grps = r.select(col("__g")).distinct()
    val totals = r.groupBy(col("__g")).agg(sum(col("c")).as("n_g"))
    val nAll = r.agg(coalesce(sum(col("c")), lit(0L)).as("n_all"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wt = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val perValue = r.groupBy(col("__v")).agg(sum(col("c")).as("ct"))
      .withColumn("cum_t", sum(col("ct")).over(wt))
      .select(col("__v"), col("cum_t"))
    val gaps = vals.crossJoin(broadcast(grps))
      .join(r, Seq("__g", "__v"), "left")
      .select(col("__g"), col("__v"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum_g", sum(col("c")).over(w))
      .join(perValue, "__v")
      .join(broadcast(totals), "__g")
      .crossJoin(nAll) // 1-row frame
      .select(col("__g"), col("__v"), col("n_g"),
        (col("n_all") - col("n_g")).as("n_rest"),
        abs(col("cum_g") * (col("n_all") - col("n_g")) -
          (col("cum_t") - col("cum_g")) * col("n_g")).as("gap"))
      .localCheckpoint() // two consumers (per-group max + argmin)
    val mx = gaps.groupBy(col("__g")).agg(max(col("gap")).as("d_num"))
    gaps.join(mx, Seq("__g")).filter(col("gap") === col("d_num"))
      .groupBy(col("__g").as("group"), col("n_g"), col("n_rest"), col("d_num"))
      .agg(min(col("__v")).as("at_value"))
      .select(col("group"), col("n_g"), col("n_rest"), col("d_num"),
        expr("(d_num * 1000000) div (n_g * n_rest)").as("d_micro"),
        col("at_value"))
  }

  /** Embedding centroid-drift census — the EMBEDDING-SPACE drift
    * monitor beside the scalar KS/PSI family: per group, the cosine
    * of the group's mean vector against the global mean. A source or
    * label whose centroid points away from the corpus centroid feeds
    * systematically different geometry into ANN routing, SemDeDup
    * cells, and negative mining — this is the census that catches it
    * before those consumers drift (the embedding sibling of
    * "which sources moved" — cf. Reimers' anisotropy literature; the
    * q_embed_anisotropy gate reads the same geometry globally).
    *
    * Determinism: cos(mean_g, mean_T) = cos(sum_g, sum_T) (positive
    * scalars cancel), so the census works on exact SUMS — per
    * (group, dim) the float values sum through DECIMAL(28,10) casts
    * (exact at any parallelism), quantize ONCE to integer 1e-6 units
    * (the charEntropy cast-chain), and the global sums are the
    * GROUP-SUM of those integer units (exactly mergeable — shard
    * centroids fold without re-reading vectors). Dot and norms are
    * exact DECIMAL(38,0) integer aggregates; only the final
    * `dot/(√n_g·√n_T)` runs in double (two correctly-rounded sqrts +
    * one divide on identical inputs), rounded to 4 dp. All-zero
    * centroids report 0.0, never NaN.
    *
    * Scale shape: ONE map-only posexplode (×d, the standard embedding
    * census cost) into a map-side-combined (group, dim) sum; all
    * joins after are (groups×d)-sized. */
  def centroidDrift(df: DataFrame, group: Column, vec: Column): DataFrame = {
    val e = df.select(group.cast("string").as("__g"),
        posexplode(vec.cast("array<double>")).as(Seq("dim", "v")))
      .filter(col("__g").isNotNull)
    val s = e.groupBy(col("__g"), col("dim"))
      .agg((sum(col("v").cast("decimal(28,10)")).cast("decimal(18,6)") *
        lit(1000000)).cast("long").as("u"))
      .localCheckpoint() // group sums + the global fold both read it
    val g = s.groupBy(col("dim")).agg(sum(col("u")).as("ut"))
    val counts = df.select(group.cast("string").as("__g"))
      .filter(col("__g").isNotNull)
      .groupBy(col("__g")).agg(count(lit(1)).as("n_vecs"))
    val prods = s.join(g, "dim")
      .groupBy(col("__g"))
      .agg(
        sum((col("u").cast("decimal(38,0)") * col("ut")).cast("decimal(38,0)")).as("dot"),
        sum((col("u").cast("decimal(38,0)") * col("u")).cast("decimal(38,0)")).as("ng"),
        sum((col("ut").cast("decimal(38,0)") * col("ut")).cast("decimal(38,0)")).as("nt"))
    prods.join(counts, "__g")
      .select(col("__g").as("group"), col("n_vecs"),
        when(col("ng") === 0 || col("nt") === 0, lit(0.0d))
          .otherwise(round(col("dot").cast("double") /
            (sqrt(col("ng").cast("double")) * sqrt(col("nt").cast("double"))), 4))
          .as("cos_to_global"))
  }

  /** Population Stability Index — the industry-standard drift number
    * beside the rank-based [[ksTwoSample]] (credit-scoring lineage;
    * the symmetrized mass-based divergence): PSI = Σ_bins
    * (p_i − q_i)·ln(p_i/q_i) over the quantized value domain, with
    * add-one smoothing on bin counts so structurally-empty bins score
    * finite (the standard practice — an unsmoothed empty bin is ±∞).
    * KS asks "did the cdf move anywhere"; PSI asks "how much mass
    * rebalanced, weighted by log-odds" — a pipeline reads both before
    * trusting thresholds across slices (rule of thumb: < 0.1 stable,
    * > 0.25 shifted).
    *
    * Exact-integer convention: p_i − q_i enters as its integer
    * numerator over the common denominator D = (N_a+B)(N_b+B); the
    * single ln per bin evaluates on an exactly-representable integer
    * ratio and casts DECIMAL(18,6) (the floored-ln family); per-bin
    * products sum in DECIMAL(38,0) and ONE integer division reports
    * `psi_micro` (every term is ≥ 0, so truncation is floor). Same
    * discrete-domain contract and census shape as the KS family: ONE
    * map-side-combined (value → countA, countB) census, everything
    * after domain-sized, one row out. */
  def psi(df: DataFrame, value: Column, isA: Column, isB: Column): DataFrame = {
    val v = value.cast("double")
    psiFromCensus(df.filter(v.isNotNull && (isA || isB))
      .groupBy(v.as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("ca"),
        sum(when(isB, 1L).otherwise(0L)).as("cb"))
      .localCheckpoint()) // totals + the term pass both read it
  }

  /** [[psi]] over a pre-built `(__v, ca, cb)` census — the
    * STREAMING-MONITOR arm: a Complete-mode streaming aggregate
    * maintains the census in-flight, and each snapshot read runs this
    * same exact-integer assembly over the sink (q_stream_drift). The
    * caller passes a MATERIALIZED frame (memory-sink table /
    * checkpointed census) — the assembly reads it twice. */
  def psiFromCensus(r: DataFrame): DataFrame = {
    val tot = r.agg(coalesce(sum(col("ca")), lit(0L)).as("n_a"),
      coalesce(sum(col("cb")), lit(0L)).as("n_b"),
      count(lit(1)).as("n_bins"))
    r.crossJoin(tot) // 1-row frame, auto-broadcast
      .select(col("n_a"), col("n_b"), col("n_bins"),
        // diff_num = (ca+1)(N_b+B) − (cb+1)(N_a+B); ln on the same
        // exact ratio; term ≥ 0 by same-sign
        ((col("ca") + 1L) * (col("n_b") + col("n_bins")) -
          (col("cb") + 1L) * (col("n_a") + col("n_bins"))).as("dn"),
        log(((col("ca") + 1L) * (col("n_b") + col("n_bins"))).cast("double") /
          ((col("cb") + 1L) * (col("n_a") + col("n_bins"))).cast("double"))
          .cast("decimal(18,6)").as("lnr"))
      .groupBy(col("n_a"), col("n_b"), col("n_bins"))
      .agg(sum((col("dn").cast("decimal(38,0)") *
        (col("lnr") * lit(1000000)).cast("decimal(38,0)")).cast("decimal(38,0)"))
        .as("s"))
      .select(col("n_a"), col("n_b"), col("n_bins").cast("long").as("n_bins"),
        expr("""CAST(s DIV (CAST(n_a + n_bins AS DECIMAL(38,0)) * (n_b + n_bins))
                AS BIGINT)""").as("psi_micro"))
  }

  /** One-vs-rest [[psi]] for EVERY group in one query — the
    * [[ksByGroup]] sibling on the mass side: per group g,
    * PSI(value | group = g vs group ≠ g). The one-vs-rest domain is
    * the CORPUS value domain for every group (a bin empty on one side
    * is add-one smoothed — exactly [[psi]]'s convention), so `n_bins`
    * is shared and the dense group×value grid is bounded by the
    * quantized domain times the census-sized group count. Identical
    * per-bin integer-numerator arithmetic to [[psi]]: row g ≡
    * `psi(df, value, group === g, group =!= g)` (spec-pinned).
    * Returns `(group, n_g, n_rest, n_bins, psi_micro)`. */
  def psiByGroup(df: DataFrame, group: Column, value: Column): DataFrame =
    psiByGroupCensus(groupValueCensus(df, group, value))

  /** [[psiByGroup]] over a pre-built [[groupValueCensus]]. */
  def psiByGroupCensus(r: DataFrame): DataFrame = {
    val perValue = r.groupBy(col("__v")).agg(sum(col("c")).as("ct"))
    val grps = r.select(col("__g")).distinct()
    val totals = r.groupBy(col("__g")).agg(sum(col("c")).as("n_g"))
    val nAll = r.agg(coalesce(sum(col("c")), lit(0L)).as("n_all"),
      countDistinct(col("__v")).as("n_bins"))
    perValue.crossJoin(broadcast(grps))
      .join(r, Seq("__g", "__v"), "left")
      .select(col("__g"), col("ct"), coalesce(col("c"), lit(0L)).as("ca"))
      .join(broadcast(totals), "__g")
      .crossJoin(nAll) // 1-row frame
      .select(col("__g"), col("n_g"), col("n_all"), col("n_bins"),
        // the [[psi]] terms with n_a = n_g, n_b = n_all − n_g,
        // cb = ct − ca: dn and lnr share a sign, so the summed
        // products are ≥ 0 and DIV-truncation is floor
        ((col("ca") + 1L) * (col("n_all") - col("n_g") + col("n_bins")) -
          (col("ct") - col("ca") + 1L) * (col("n_g") + col("n_bins"))).as("dn"),
        log(((col("ca") + 1L) * (col("n_all") - col("n_g") + col("n_bins"))).cast("double") /
          ((col("ct") - col("ca") + 1L) * (col("n_g") + col("n_bins"))).cast("double"))
          .cast("decimal(18,6)").as("lnr"))
      .groupBy(col("__g").as("group"), col("n_g"), col("n_all"), col("n_bins"))
      .agg(sum((col("dn").cast("decimal(38,0)") *
        (col("lnr") * lit(1000000)).cast("decimal(38,0)")).cast("decimal(38,0)"))
        .as("s"))
      .select(col("group"), col("n_g"), (col("n_all") - col("n_g")).as("n_rest"),
        col("n_bins").cast("long").as("n_bins"),
        expr("""CAST(s DIV (CAST(n_g + n_bins AS DECIMAL(38,0))
                * (n_all - n_g + n_bins)) AS BIGINT)""").as("psi_micro"))
  }

  /** Youden's optimal threshold (Youden '50 J statistic) — the
    * natural CONSUMER of the [[aucCensus]] separability number: once
    * AUC says a score ranks a class at all, J = max_t (TPR(t) −
    * FPR(t)) says WHERE to cut, under the convention "score ≥ t
    * predicts positive" with t ranging over the observed quantized
    * score domain. Exact integers end-to-end: per threshold,
    * j_num(t) = TP(t)·N_neg − FP(t)·N_pos (maximizing j_num/(P·N) ≡
    * maximizing J); only the final report divides to millionths.
    * The reported maximum is PROVABLY ≥ 0 — the smallest observed
    * value's cut admits every row (TP = P, FP = N ⇒ j_num = 0), so a
    * backward-ranking score reports J = 0 at the all-admit cut
    * rather than a negative J (ProfileSpec pins the invariant), and
    * truncating DIV is floor. Ties break to the SMALLEST threshold
    * attaining the max. A single-class input fails loudly in-plan
    * (no threshold to tune). One row: `(n_pos, n_neg, threshold, tp,
    * fp, j_num, j_micro)`.
    *
    * Scale shape: the KS-family census contract — ONE
    * map-side-combined (value → posCount, negCount) census, then
    * everything is domain-sized (one descending cumulative window,
    * one max, one argmin pick). */
  def youden(df: DataFrame, value: Column, isPos: Column): DataFrame = {
    val v = value.cast("double")
    val r = df.filter(v.isNotNull)
      .groupBy(v.as("__v"))
      .agg(sum(when(isPos, 1L).otherwise(0L)).as("cp"),
        sum(when(isPos, 0L).otherwise(1L)).as("cn"))
      .localCheckpoint() // totals + the window chain both read it
    val tot = r
      .agg(coalesce(sum(col("cp")), lit(0L)).as("np"),
        coalesce(sum(col("cn")), lit(0L)).as("nn"))
      .select(
        when(col("np") === 0 || col("nn") === 0,
          raise_error(concat(lit("youden requires both classes present, got "),
            col("np").cast("string"), lit(" positives / "),
            col("nn").cast("string"), lit(" negatives"))))
          .otherwise(col("np")).as("n_pos"),
        col("nn").as("n_neg"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val g = r
      .withColumn("tp", sum(col("cp")).over(w))
      .withColumn("fp", sum(col("cn")).over(w))
      .crossJoin(tot) // 1-row frame
      .select(col("__v"), col("n_pos"), col("n_neg"), col("tp"), col("fp"),
        (col("tp") * col("n_neg") - col("fp") * col("n_pos")).as("j_num"))
      .localCheckpoint() // max + the argmax pick both read it
    val mx = g.agg(max(col("j_num")).as("jm"))
    g.join(broadcast(mx), col("j_num") === col("jm"))
      .groupBy(col("n_pos"), col("n_neg"), col("j_num"))
      .agg(min(struct(col("__v"), col("tp"), col("fp"))).as("m"))
      .select(col("n_pos"), col("n_neg"),
        col("m.__v").as("threshold"), col("m.tp").as("tp"), col("m.fp").as("fp"),
        col("j_num"))
      .withColumn("j_micro", expr(
        // the max is ≥ 0 by the all-admit-cut invariant (scaladoc),
        // so DIV-truncation IS floor
        """(CAST(j_num AS DECIMAL(38,0)) * 1000000)
          |DIV (CAST(n_pos AS DECIMAL(38,0)) * n_neg)""".stripMargin)
        .cast("bigint"))
  }

  /** Average precision (the PR-AUC summary — the ranking number that,
    * unlike ROC-AUC, does not reward a detector for the ocean of easy
    * negatives: the right headline for IMBALANCED screens like dup
    * detection, where positives are rare by construction). Tie-aware
    * quantized-domain form: distinct score values are BLOCKS in
    * descending order, and AP = (1/P) · Σ_b cp_b · TP_b/(TP_b+FP_b) —
    * each block's positives credited at the block-END precision (ties
    * share one precision, so the result is independent of any
    * within-tie ordering an item-level definition would need). Exact
    * integer convention: each term floors ONCE to 1e-6 units
    * (`(cp·TP·10⁶) div (TP+FP)` — the PageRank per-term floor), the
    * term sum is exact, and one final division by P reports
    * `ap_micro`; floor loss ≤ #blocks·1e-6. A perfect ranking scores
    * exactly 1e6; an uninformative one ≈ prevalence. No positives →
    * loud (nothing to average). One row: `(n_pos, n_neg, ap_micro)`.
    *
    * Scale shape: the KS-family contract — ONE map-side-combined
    * value census, then domain-sized windows. */
  def averagePrecision(df: DataFrame, value: Column, isPos: Column): DataFrame = {
    val v = value.cast("double")
    val r = df.filter(v.isNotNull)
      .groupBy(v.as("__v"))
      .agg(sum(when(isPos, 1L).otherwise(0L)).as("cp"),
        sum(when(isPos, 0L).otherwise(1L)).as("cn"))
      .localCheckpoint() // totals + the window chain both read it
    val tot = r
      .agg(coalesce(sum(col("cp")), lit(0L)).as("np"),
        coalesce(sum(col("cn")), lit(0L)).as("nn"))
      .select(
        when(col("np") === 0,
          raise_error(lit("averagePrecision requires at least one positive")))
          .otherwise(col("np")).as("n_pos"),
        col("nn").as("n_neg"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    r.withColumn("tp", sum(col("cp")).over(w))
      .withColumn("fp", sum(col("cn")).over(w))
      .crossJoin(tot) // 1-row frame
      .select(col("n_pos"), col("n_neg"),
        // per-block floor to 1e-6 units; all values ≥ 0 so DIV = floor
        expr("""(CAST(cp AS DECIMAL(38,0)) * tp * 1000000)
               |DIV (tp + fp)""".stripMargin).as("term"))
      .groupBy(col("n_pos"), col("n_neg"))
      .agg(sum(col("term")).as("s"))
      .select(col("n_pos"), col("n_neg"),
        expr("CAST(s DIV n_pos AS BIGINT)").as("ap_micro"))
  }

  def ksTwoSample(df: DataFrame, value: Column, isA: Column, isB: Column): DataFrame = {
    val v = value.cast("double")
    val r = df.filter(v.isNotNull && (isA || isB))
      .groupBy(v.as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("ca"),
        sum(when(isB, 1L).otherwise(0L)).as("cb"))
      .localCheckpoint() // the corpus census: totals + the window chain
      // both read it — without this the heavy pass runs twice
    val tot = r.agg(coalesce(sum(col("ca")), lit(0L)).as("n_a"),
      coalesce(sum(col("cb")), lit(0L)).as("n_b"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val g = r
      .withColumn("cua", sum(col("ca")).over(w))
      .withColumn("cub", sum(col("cb")).over(w))
      .crossJoin(tot) // 1-row frame, auto-broadcast
      .select(col("__v"), col("n_a"), col("n_b"),
        abs(col("cua") * col("n_b") - col("cub") * col("n_a")).as("gap"))
      .localCheckpoint() // two consumers (max + argmin), domain-sized
    val mx = g.agg(max(col("gap")).as("d_num"))
    g.join(mx, col("gap") === col("d_num"))
      .groupBy(col("n_a"), col("n_b"), col("d_num"))
      .agg(min(col("__v")).as("at_value"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        expr("(d_num * 1000000) div (n_a * n_b)").as("d_micro"),
        col("at_value"))
  }

  /** Per-group one-vs-rest AUC census — [[aucCensus]] for EVERY group
    * in one query (the [[ksByGroup]] composition applied to the rank
    * statistic): each group's exact AUC of the score against the
    * pooled rest. The separability screen a multi-source pipeline
    * runs before trusting per-source thresholds: a group whose score
    * distribution is rankably different from the rest (AUC far from
    * ½) needs its own cut.
    *
    * Same exact-integer identity as the two-class arm, evaluated per
    * group on the DENSE group×domain grid: positives at value v are
    * the group's count, negatives the rest's; 2·AUC_g·P_g·N_g =
    * Σ_v pos_g(v)·(2·cumNegBelow_g(v) + neg_g(v)), per-term products
    * in DECIMAL(38,0). Quantized-score contract and grid bounds as
    * [[ksByGroup]]; cumulative windows partition BY GROUP. A corpus
    * with a single group fails loudly (the rest is empty — AUC
    * undefined). */
  def aucByGroup(df: DataFrame, group: Column, score: Column): DataFrame = {
    val v = score.cast("double")
    val g = group.cast("string")
    val r = df.filter(v.isNotNull && g.isNotNull)
      .groupBy(g.as("__g"), v.as("__v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // grid + totals + domain all read it
    val vals = r.select(col("__v")).distinct()
    val grps = r.select(col("__g")).distinct()
    val totals = r.groupBy(col("__g")).agg(sum(col("c")).as("n_g"))
    val nAll = r.agg(coalesce(sum(col("c")), lit(0L)).as("n_all"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wt = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val perValue = r.groupBy(col("__v")).agg(sum(col("c")).as("ct"))
      .withColumn("cum_t", sum(col("ct")).over(wt))
      .select(col("__v"), col("ct"), col("cum_t"))
    val terms = vals.crossJoin(broadcast(grps))
      .join(r, Seq("__g", "__v"), "left")
      .select(col("__g"), col("__v"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum_g", sum(col("c")).over(w))
      .join(perValue, "__v")
      .select(col("__g"),
        (col("c").cast("decimal(38,0)") *
          (lit(2L) * ((col("cum_t") - col("ct")) - (col("cum_g") - col("c"))) +
            (col("ct") - col("c"))).cast("decimal(38,0)")).as("t"))
    terms.groupBy(col("__g"))
      .agg(sum(col("t")).as("num2"))
      .join(broadcast(totals), "__g")
      .crossJoin(nAll)
      .select(col("__g").as("group"),
        col("n_g").as("n_pos"),
        (col("n_all") - col("n_g")).as("n_neg"),
        col("num2").cast("long").as("num2"),
        when(col("n_all") === col("n_g"),
          raise_error(lit("aucByGroup: a single-group corpus has no rest — " +
            "AUC is undefined")))
          .otherwise(expr(
            """CAST((num2 * 1000000)
              |DIV (CAST(n_g AS DECIMAL(38,0)) * (n_all - n_g) * 2) AS BIGINT)"""
              .stripMargin)).as("auc_micro"))
  }

  /** Exact ROC-AUC census (Mann-Whitney U / Wilcoxon rank-sum form —
    * Hanley & McNeil '82 for the identity): the CALIBRATION number
    * for any score a pipeline thresholds on — a quality classifier,
    * a dedup similarity, a heuristic filter — against a binary label:
    * P(score of a random positive > score of a random negative), ties
    * at ½. Before a threshold tuned on one slice is trusted, this is
    * the number that says whether the score ranks the label AT ALL
    * (0.5 = coin flip).
    *
    * Exact-integer convention (the [[ksTwoSample]] shape): ONE
    * map-side-combined (score → n_pos, n_neg) census over the
    * QUANTIZED score domain (the documented contract shared with the
    * KS family: scores must be discrete — cents, millis, bucketed),
    * then a domain-sized cumulative window and the tie-correct
    * integer identity 2·AUC·P·N = Σ_s pos(s)·(2·cumNegBelow(s) +
    * neg(s)) — halves avoided by carrying TWICE the U statistic.
    * Per-term products enter a DECIMAL(38,0) sum (terms reach P·2N,
    * past int64 on big slices); the reported `num2` is BIGINT (exact
    * while 2·P·N < 2^63, i.e. any slice pair under ~2·10⁹ rows each)
    * and `auc_micro = floor(num2·10⁶ / (2·P·N))` is exact integer
    * division in both engines. A single-class input (P = 0 or N = 0)
    * fails loudly — AUC is undefined, not 0.
    *
    * Scale shape: the heavy pass is the one combined census; the
    * window runs on the DOMAIN-sized census (the KS contract), and
    * the output is ONE row. */
  def aucCensus(df: DataFrame, score: Column, label: Column): DataFrame = {
    val s = score.cast("double")
    val r = df.filter(s.isNotNull && label.isNotNull)
      .groupBy(s.as("__s"))
      .agg(sum(when(label, 1L).otherwise(0L)).as("cp"),
        sum(when(!label, 1L).otherwise(0L)).as("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__s").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    r.withColumn("cun", sum(col("cn")).over(w))
      .select(col("cp"), col("cn"),
        (col("cp").cast("decimal(38,0)") *
          (lit(2L) * col("cun") - col("cn")).cast("decimal(38,0)")).as("t"))
      .agg(coalesce(sum(col("t")), lit(0L).cast("decimal(38,0)")).as("num2"),
        coalesce(sum(col("cp")), lit(0L)).as("n_pos"),
        coalesce(sum(col("cn")), lit(0L)).as("n_neg"))
      .select(
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          raise_error(lit("aucCensus: both classes required — AUC is " +
            "undefined on a single-class input")))
          .otherwise(col("n_pos")).as("n_pos"),
        col("n_neg"),
        col("num2").cast("long").as("num2"),
        expr("""CAST((num2 * 1000000)
                DIV (CAST(n_pos AS DECIMAL(38,0)) * n_neg * 2) AS BIGINT)""")
          .as("auc_micro"))
  }
}
