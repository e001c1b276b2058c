package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Optimized-PQ dimension allocation (Ge et al., CVPR 2013 §4.1) as a
  * SERVING-path operator: re-order the dimensions so every PQ block
  * carries comparable energy BEFORE the per-block quantizers train —
  * plain PQ over unbalanced dimensions spends whole codebooks on
  * near-constant blocks while one hot block eats all the distortion.
  *
  * Two arms, by gating strategy (the [[ProductQuantizer]] iters=0
  * lesson — make the oracle-facing arm fully SQL-replayable and gate
  * the quality-bearing arm with measured ScalaTest floors):
  *  - THIS file's **energy-balanced permutation**: dims ranked by an
  *    exact integer-unit energy census, snake-dealt (boustrophedon)
  *    into the `numSub` blocks. Every step — floor-unit census, rank,
  *    closed-form snake assignment, map-only permute — replays
  *    bit-for-bit in DuckDB, so the end-to-end serving query
  *    (permute → PQ init → ADC → exact refine) is hash-gated.
  *  - The full **rotation** arm ([[Pca.jacobi]] + [[Pca.balancedOrder]]
  *    + [[Pca.rotate]]): strictly stronger on correlated data but its
  *    eigensolve is driver math no SQL engine replays; its serving
  *    recall is floor-gated in OpqServingSpec instead.
  *
  * Scale shape: the census is ONE map-side-combined aggregate over
  * `n·d` exploded rows into exactly `d` groups (the shuffle carries
  * O(d · #partitions) rows); the permutation is a d-entry driver/model
  * artifact; application is a map-only projection (no UDF — a literal
  * `array(element_at…)` that codegens into the scan). Nothing else
  * moves.
  *
  * Overflow discipline: per-row terms are `floor(x_i²·1e12)` longs
  * (exact, order-independent); the cross-partition sum accumulates as
  * DECIMAL(38,0) — exact to ~1e26 unit-scale rows, beyond any corpus
  * (the [[Pca.census]] convention; energies are non-negative so there
  * is no cancellation). Ranking compares those exact integers, so the
  * permutation is identical at any parallelism and in both engines.
  */
object Opq {

  /** Exact per-dimension energy census: one row `(i, en)` per 1-based
    * dimension with `en = Σ floor(x_i² · 1e12)` as DECIMAL(38,0). */
  def energyCensus(df: DataFrame, vec: Column, d: Int): DataFrame = {
    require(d >= 1, s"d must be >= 1, got $d")
    df.select(posexplode(vec.cast("array<double>")).as(Seq("p", "x")))
      .select((col("p") + 1).as("i"),
        floor(col("x") * col("x") * lit(1e12)).cast(DecimalType(38, 0)).as("t"))
      .groupBy("i").agg(sum(col("t")).as("en"))
  }

  /** Snake (boustrophedon) block of 0-based rank `r`: ranks are dealt
    * left-to-right across the blocks, then right-to-left, alternating
    * — the closed-form balanced-assignment rule (block sums of any
    * monotone sequence stay within one element of each other), chosen
    * over the greedy argmin fill precisely because it is expressible
    * as pure integer arithmetic in SQL. */
  def snakeBlock(r: Int, numSub: Int): Int =
    if ((r / numSub) % 2 == 0) r % numSub else numSub - 1 - r % numSub

  /** The energy-balanced dimension permutation: position p of the
    * permuted vector holds original 0-based dimension `perm(p)`.
    * Dims rank by (energy DESC, dim ASC) — exact integer compare —
    * then snake-deal into `numSub` blocks; the permuted order is
    * block 0's dims in rank order, then block 1's, … Each block gets
    * exactly d/numSub dims, so the result feeds [[ProductQuantizer]]
    * unchanged. ONE d-row collect (model artifact, not data). */
  def energyBalancedPerm(df: DataFrame, vec: Column, d: Int,
      numSub: Int): Array[Int] = {
    require(numSub >= 1 && d % numSub == 0,
      s"d=$d must divide into numSub=$numSub blocks")
    val rows = energyCensus(df, vec, d).collect()
    require(rows.length == d,
      s"energy census returned ${rows.length} dims, expected $d (empty input?)")
    val ranked = rows
      .map(r => (r.getInt(0) - 1, BigDecimal(r.getDecimal(1))))
      .sortBy { case (dim, en) => (-en, dim) }
    ranked.zipWithIndex
      .map { case ((dim, _), r) => (snakeBlock(r, numSub), r, dim) }
      .sortBy { case (b, r, _) => (b, r) }
      .map(_._3)
  }

  /** Map-only permutation application: `array(element_at…)` literals,
    * fully inside whole-stage codegen, float-preserving. */
  def permuteExpr(vec: Column, perm: Array[Int]): Column =
    array(perm.toIndexedSeq.map(i => element_at(vec, i + 1)): _*)
}
