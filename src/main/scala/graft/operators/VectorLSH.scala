package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Signed-random-projection (hyperplane) LSH over embeddings, banded:
  * the signature is `bands x rowBits` sign bits of fixed hyperplane dot
  * products, and two vectors are candidates when ANY band's `rowBits`
  * bits agree — the classic LSH OR-of-ANDs construction. Per band a
  * random pair collides with probability p^rowBits (p = 1 - θ/π for
  * angle θ), so bucket occupancy is bounded by 2^rowBits keys per band
  * and recall is tuned by adding bands, not by fattening buckets —
  * the shape that stays sub-quadratic as the corpus grows. (A single
  * 8-bit signature caps the key space at 256 buckets, making the
  * within-bucket self-join O(n²/256) — quadratic at scale.)
  *
  * Hyperplanes are deterministic integer lattices: entry i of plane j
  * is `((((j*131 + i*17 + 7) * 2654435761) mod 2^32) mod 7) - 3`. The
  * multiplicative remix (Knuth hashing) gives the sequence a period far
  * beyond the plane count — a plain `(j*131 + i*17) mod 7` repeats
  * every 7 planes (131·7 ≡ 0 mod 7), which would cap the scheme at 7
  * distinct hyperplanes. All values are exact small integers, so
  * signatures are exact integer/double arithmetic reproducible in the
  * DuckDB oracle — no RNG, no transcendentals (libm sin/cos differ
  * across engines).
  */
object VectorLSH {

  val DefaultBands = 8
  val DefaultRowBits = 16

  def plane(j: Int, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      ((((j * 131 + i * 17 + 7).toLong * 2654435761L) % 4294967296L) % 7L - 3L).toDouble
    }

  /** All `bands` signatures at once: element b is the `rowBits`-bit
    * signature of band b (bit j set iff dot(v, plane(b*rowBits+j)) > 0).
    * One fused native pass — composing bands×rowBits separate dot
    * expressions overflows whole-stage codegen's method limits and
    * falls back to interpreted eval (measured 24x slower at 128
    * planes). Same left-to-right double fold per dot as the oracle. */
  def signaturesExpr(vec: Column, dim: Int, bands: Int, rowBits: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    val planesFlat = (0 until bands * rowBits).flatMap(j => plane(j, dim)).toArray
    toCol(graft.functions.expressions.SrpSignature(
      toExpr(vec.cast("array<float>")), planesFlat, bands, rowBits))
  }

  /** Near-dup pairs: same `rowBits`-bit signature in at least one band,
    * AND verified cosine >= tau. Recall is probabilistic
    * (1 - (1 - p^rowBits)^bands); both the blocking and the verify are
    * deterministic. */
  def cosinePairs(
      df: DataFrame,
      tau: Double,
      dim: Int,
      bands: Int = DefaultBands,
      rowBits: Int = DefaultRowBits,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(rowBits <= 62, "band signatures are packed into a long")
    // drop malformed rows up front: a wrong-length vector would yield a
    // null dot -> all-zero signature -> every bad row in one bucket
    val clean = df.filter(hasDim(col(vecCol), dim))
      .select(col(idCol).as("id"), col(vecCol).as("v"))
    val sigs = clean
      .select(col("id"), signaturesExpr(col("v"), dim, bands, rowBits).as("sigarr"))
      .select(col("id"), posexplode(col("sigarr")).as(Seq("band", "sig")))
    // candidates collide in >=1 band; distinct before the verify join so
    // multi-band collisions verify once
    val cand = sigs.as("x")
      .join(sigs.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    cand
      .join(clean.select(col("id").as("a"), col("v").as("va")), "a")
      .join(clean.select(col("id").as("b"), col("v").as("vb")), "b")
      .select(col("a"), col("b"), cosineNative(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= tau)
  }
}
