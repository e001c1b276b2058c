package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math kernels as Catalyst column expressions.
  *
  * Mirrors the reference's two distance kernels
  * (`/root/reference/src/lib.rs:28-30` l2_squared_distance,
  * `/root/reference/src/lib.rs:32-47` cosine_similarity) but expressed as
  * built-in higher-order functions (`zip_with` + `aggregate`), which stay
  * inside whole-stage codegen — no UDF serialization, no boxing of the
  * whole array per call.
  *
  * All math is carried out in Double: float32 inputs widen exactly, the
  * accumulation is deterministic left-to-right, and results compare
  * bit-stably against a DuckDB oracle computing the same fold in double.
  * (The reference accumulates in f32; ranking is unaffected.)
  */
object VectorFunctions {

  /** Dot product of two array<float|double> columns, accumulated in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d),
      (acc, v) => acc + v)

  /** Squared L2 (Euclidean) distance — no sqrt, monotone for ranking,
    * same contract as the reference's `l2_squared_distance`. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0d),
      (acc, v) => acc + v)

  /** L2 norm of a vector column. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity with the reference's zero-vector guard:
    * returns 0.0 when either norm is 0 (`src/lib.rs:43-45`).
    *
    * One-pass: a single `aggregate` folds (dot, normA², normB²) in a
    * struct accumulator — mirrors the reference's single loop and avoids
    * re-walking the arrays per subterm (Catalyst subexpression
    * elimination is limited inside higher-order functions).
    */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val acc = aggregate(
      zip_with(a, b, (x, y) => struct(
        x.cast("double").as("x"), y.cast("double").as("y"))),
      struct(lit(0.0d).as("dot"), lit(0.0d).as("na"), lit(0.0d).as("nb")),
      (s, p) => struct(
        (s("dot") + p("x") * p("y")).as("dot"),
        (s("na") + p("x") * p("x")).as("na"),
        (s("nb") + p("y") * p("y")).as("nb")))
    val dot = acc("dot")
    val na = sqrt(acc("na"))
    val nb = sqrt(acc("nb"))
    when(na === lit(0.0d) || nb === lit(0.0d), lit(0.0d))
      .otherwise(dot / (na * nb))
  }

  /** Cosine distance = 1 - cosine similarity. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0d) - cosineSimilarity(a, b)

  // ---- native (codegen) kernels ------------------------------------
  // Fused single-pass Catalyst expressions (see
  // graft.functions.expressions.VectorExpressions): same semantics as
  // the HOF forms above, one traversal, no intermediate arrays. These
  // are the hot-path kernels; the HOF forms remain as the
  // builtin-only reference implementation.

  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  private def asVec(c: Column): Column = c.cast("array<float>")

  def l2SqNative(a: Column, b: Column): Column =
    toCol(graft.functions.expressions.L2SquaredDistance(toExpr(asVec(a)), toExpr(asVec(b))))

  def dotNative(a: Column, b: Column): Column =
    toCol(graft.functions.expressions.DotProductNative(toExpr(asVec(a)), toExpr(asVec(b))))

  def cosineNative(a: Column, b: Column): Column =
    toCol(graft.functions.expressions.CosineSimilarityNative(toExpr(asVec(a)), toExpr(asVec(b))))

  /** L2-normalize a vector column (zero vectors pass through
    * unchanged). Use with a materialized `norm` attribute so the norm
    * is computed once per row, then cosine ANN reduces to L2 ANN on
    * the normalized vectors: l2²(â,b̂) = 2 − 2·cos(a,b), a monotone
    * map — rankings are identical. */
  def l2Normalize(v: Column): Column = {
    val norm = sqrt(dotNative(v, v))
    // norm rides in as an array *argument* (evaluated once) — nesting
    // it in the lambda body would recompute the dot per element
    when(norm === 0.0, v.cast("array<float>"))
      .otherwise(zip_with(v, array_repeat(norm, size(v)),
        (x, nn) => (x.cast("double") / nn).cast("float")))
  }

  /** A vector literal usable against array<float> columns. */
  def vecLit(v: Seq[Float]): Column = {
    import org.apache.spark.sql.functions.{array => arr}
    arr(v.map(x => lit(x)): _*)
  }

  /** Dimension-validation predicate: the reference's only data-validation
    * rule (`src/lib.rs:62-69`, `src/disk_store.rs:22-27`). NULL arrays
    * count as invalid (strict validation semantics, not three-valued). */
  def hasDim(vec: Column, dim: Int): Column =
    coalesce(size(vec) === lit(dim), lit(false))
}
