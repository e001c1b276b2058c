package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Signed-random-projection (hyperplane) LSH over embeddings: each of
  * `nBits` fixed hyperplanes contributes one sign bit of the dot
  * product; vectors agreeing on all bits land in the same bucket, and
  * cosine-similar vectors collide with high probability — the
  * blocking scheme that replaces all-pairs (or label-block) cosine
  * comparison when there is no precomputed cluster key.
  *
  * Hyperplanes are deterministic integer lattices
  * (h_j[i] = ((j*131 + i*17) mod 7) - 3), so signatures are exact
  * integer/double arithmetic reproducible in the DuckDB oracle —
  * no RNG, no transcendentals (libm sin/cos differ across engines).
  */
object VectorLSH {

  val DefaultBits = 8

  def plane(j: Int, dim: Int): Seq[Double] =
    (0 until dim).map(i => (((j * 131 + i * 17) % 7) - 3).toDouble)

  /** Bucket signature in [0, 2^nBits): bit j set iff dot(v, h_j) > 0.
    * Uses the native dot kernel (same left-to-right double fold as the
    * HOF form and the oracle — no intermediate arrays on the hot path;
    * planes are double-valued small ints, exact as float literals). */
  def signatureExpr(vec: Column, dim: Int, nBits: Int = DefaultBits): Column =
    (0 until nBits).map { j =>
      val dot = dotNative(vec, typedLit(plane(j, dim)))
      when(dot > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Near-dup pairs: same LSH bucket AND verified cosine >= tau.
    * Recall is probabilistic (bucket-collision bound); both the
    * blocking and the verify are deterministic. */
  def cosinePairs(
      df: DataFrame,
      tau: Double,
      dim: Int,
      nBits: Int = DefaultBits,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // drop malformed rows up front: a wrong-length vector would yield a
    // null dot -> all-zero signature -> every bad row in one bucket
    val sig = df.filter(hasDim(col(vecCol), dim))
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        signatureExpr(col(vecCol), dim, nBits).as("sig"))
    sig.as("x")
      .join(sig.as("y"), col("x.sig") === col("y.sig") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        cosineNative(col("x.v"), col("y.v")).as("cos"))
      .filter(col("cos") >= tau)
      .select(col("a"), col("b"), col("cos"))
  }
}
