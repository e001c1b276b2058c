package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Nearest-centroid cell assignment in ONE fused pass: scans all k
  * centroids (`centroidsFlat(c*dim + i)` = entry i of centroid c) and
  * returns the cell id of the closest by squared L2, ties to the
  * lowest centroid ordinal (strict `<` never replaces an equal best —
  * the same rule as `IvfIndex.Model.assignOne` and the oracle's
  * `row_number() ... ORDER BY d, ord`).
  *
  * The HOF form this replaces (`transform(centroids, cv =>
  * aggregate(zip_with(...)))`) re-enters interpreted lambda eval per
  * centroid per row — measured 2.8 s for 2 000 rows x 62 centroids at
  * sf0.1, dominated by per-element lambda dispatch. One native loop
  * with monotone partial-distance pruning (d only grows, so a partial
  * sum >= best already loses; strict `<` means an early break can
  * never flip a tie) is the codegen-friendly rendering.
  *
  * Accumulation is left-to-right over dims in double — the exact fold
  * the DuckDB oracle's `list_sum(list_transform(...))` mirrors.
  * Strict null semantics: a NULL or shorter-than-dim vector yields
  * NULL (inputs are validated dense vectors; cf. SqEncode's identical
  * tightening). Element-level nulls are not probed — vectors are
  * `containsNull=false` by construction upstream. */
case class IvfAssign(
    child: Expression,
    centroidsFlat: Array[Double],
    cellIds: Array[Int],
    dim: Int)
    extends UnaryExpression {
  require(dim > 0 && centroidsFlat.length % dim == 0 && centroidsFlat.nonEmpty,
    s"centroidsFlat (${centroidsFlat.length}) must be a nonempty multiple of dim ($dim)")
  private val k: Int = centroidsFlat.length / dim
  require(cellIds.isEmpty || cellIds.length == k,
    s"cellIds (${cellIds.length}) must be empty (identity) or one per centroid ($k)")

  override def prettyName: String = "ivf_assign"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private lazy val floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case t =>
      throw new IllegalArgumentException(s"ivf_assign needs array<float|double>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < dim) return null
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val base = c * dim
      var d = 0.0
      var i = 0
      while (i < dim && d < bestD) {
        val x = if (floatElems) v.getFloat(i).toDouble else v.getDouble(i)
        val t = centroidsFlat(base + i) - x
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    Integer.valueOf(if (cellIds.isEmpty) best else cellIds(best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroidsFlat, "double[]")
    val idsRef =
      if (cellIds.isEmpty) "" else ctx.addReferenceObj("ivfCellIds", cellIds, "int[]")
    val getter = if (floatElems) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, in => {
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val base = ctx.freshName("base")
      val resolve = if (cellIds.isEmpty) best else s"$idsRef[$best]"
      s"""
         |if ($in.numElements() < $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $base = $c * $dim;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dim && $d < $bestD; $i++) {
         |      double $t = $cRef[$base + $i] - (double) $in.$getter($i);
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  ${ev.value} = $resolve;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `probes` nearest cells (ascending by (distance, ordinal)) in
  * one fused pass — the multi-probe sibling of [[IvfAssign]], and the
  * same interpreted-HOF replacement story: the `transform(centroids,
  * …) |> array_sort |> slice` form measured ~3 s at sf0.1 from lambda
  * dispatch per (row × centroid × dim). Insertion into a bounded
  * top-`probes` list with the scan in ordinal order reproduces the
  * lexicographic (d asc, ord asc) sort exactly (stable strict-`<`
  * insertion: an equal-distance later ordinal never displaces an
  * earlier one), and the partial-distance early break against the
  * current worst admits exactly the strict-`<` candidates. Returns
  * array<int> of cell ids; NULL on a NULL/short vector. */
case class IvfAssignTopK(
    child: Expression,
    centroidsFlat: Array[Double],
    cellIds: Array[Int],
    dim: Int,
    probes: Int)
    extends UnaryExpression {
  require(dim > 0 && centroidsFlat.length % dim == 0 && centroidsFlat.nonEmpty,
    s"centroidsFlat (${centroidsFlat.length}) must be a nonempty multiple of dim ($dim)")
  private val k: Int = centroidsFlat.length / dim
  require(cellIds.isEmpty || cellIds.length == k,
    s"cellIds (${cellIds.length}) must be empty (identity) or one per centroid ($k)")
  require(probes >= 1, s"probes must be >= 1, got $probes")
  private val kept: Int = math.min(probes, k)

  override def prettyName: String = "ivf_assign_topk"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case t =>
      throw new IllegalArgumentException(s"ivf_assign_topk needs array<float|double>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < dim) return null
    val topD = Array.fill(kept)(Double.MaxValue)
    val topC = Array.fill(kept)(-1)
    var c = 0
    while (c < k) {
      val base = c * dim
      var d = 0.0
      var i = 0
      while (i < dim && d < topD(kept - 1)) {
        val x = if (floatElems) v.getFloat(i).toDouble else v.getDouble(i)
        val t = centroidsFlat(base + i) - x
        d += t * t
        i += 1
      }
      if (d < topD(kept - 1)) {
        var p = kept - 1
        while (p > 0 && d < topD(p - 1)) {
          topD(p) = topD(p - 1); topC(p) = topC(p - 1); p -= 1
        }
        topD(p) = d; topC(p) = c
      }
      c += 1
    }
    val out = new Array[Int](kept)
    var j = 0
    while (j < kept) {
      out(j) = if (cellIds.isEmpty) topC(j) else cellIds(topC(j))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroidsFlat, "double[]")
    val idsRef =
      if (cellIds.isEmpty) "" else ctx.addReferenceObj("ivfCellIds", cellIds, "int[]")
    val getter = if (floatElems) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, in => {
      val topD = ctx.freshName("topD")
      val topC = ctx.freshName("topC")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val out = ctx.freshName("out")
      val resolve = if (cellIds.isEmpty) s"$topC[$j]" else s"$idsRef[$topC[$j]]"
      s"""
         |if ($in.numElements() < $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $topD = new double[$kept];
         |  int[] $topC = new int[$kept];
         |  java.util.Arrays.fill($topD, Double.MAX_VALUE);
         |  java.util.Arrays.fill($topC, -1);
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $base = $c * $dim;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dim && $d < $topD[$kept - 1]; $i++) {
         |      double $t = $cRef[$base + $i] - (double) $in.$getter($i);
         |      $d += $t * $t;
         |    }
         |    if ($d < $topD[$kept - 1]) {
         |      int $p = $kept - 1;
         |      while ($p > 0 && $d < $topD[$p - 1]) {
         |        $topD[$p] = $topD[$p - 1]; $topC[$p] = $topC[$p - 1]; $p--;
         |      }
         |      $topD[$p] = $d; $topC[$p] = $c;
         |    }
         |  }
         |  int[] $out = new int[$kept];
         |  for (int $j = 0; $j < $kept; $j++) $out[$j] = $resolve;
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
