package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native scalar-quantization kernels (the int8 siblings of the PQ
  * kernels in [[PqExpressions]]). Per-dimension bounds ride along as
  * reference arrays, and the loops match the higher-order-function
  * forms' evaluation order exactly — clamp-then-floor on encode,
  * `lo + code/255·(hi−lo)` decode and dim-ascending accumulation on
  * ADC — so results are bit-identical to the `zip_with`/`aggregate`
  * rendering the DuckDB oracle mirrors for every well-formed
  * (dimension-matching) input. Malformed input is the one deliberate
  * deviation: see the per-expression notes.
  */

/** Encode a float vector into per-dimension int codes in [0, 255]:
  * floor(clamp((x−lo)/(hi−lo), 0, 1)·255); degenerate dims (hi == lo)
  * encode to 0. Wrong-length (malformed) vectors encode to a single
  * whole-array NULL — an intentional tightening of the zip_with form,
  * which instead null-padded per element and returned a non-null array
  * with NULL entries (a shape the declared
  * `ArrayType(IntegerType, containsNull = false)` forbids); a fully
  * null code array is an unambiguous reject signal where element-level
  * nulls decode to silently-wrong distances. NaN inputs clamp to code
  * 255, matching Spark's least/greatest (and DuckDB's) NaN-is-largest
  * ordering. */
case class SqEncode(child: Expression, lo: Array[Double], hi: Array[Double])
    extends UnaryExpression {
  override def prettyName: String = "sq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != lo.length) return null
    val out = new Array[Int](lo.length)
    var i = 0
    while (i < lo.length) {
      val den = hi(i) - lo(i)
      if (den != 0.0) {
        val r = (v.getFloat(i).toDouble - lo(i)) / den
        val c = (if (java.lang.Double.isNaN(r)) 1.0 else math.min(math.max(r, 0.0), 1.0)) * 255.0
        out(i) = math.floor(c).toInt
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", lo, "double[]")
    val hiRef = ctx.addReferenceObj("sqHi", hi, "double[]")
    nullSafeCodeGen(ctx, ev, in => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val den = ctx.freshName("den")
      val r = ctx.freshName("r")
      val c = ctx.freshName("c")
      s"""
         |if ($in.numElements() != $loRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |int[] $out = new int[$loRef.length];
         |for (int $i = 0; $i < $loRef.length; $i++) {
         |  double $den = $hiRef[$i] - $loRef[$i];
         |  if ($den != 0.0) {
         |    double $r = ((double) $in.getFloat($i) - $loRef[$i]) / $den;
         |    double $c = (Double.isNaN($r) ? 1.0 : Math.min(Math.max($r, 0.0), 1.0)) * 255.0;
         |    $out[$i] = (int) Math.floor($c);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric squared-L2 from an int8 code array (left) to a
  * full-precision float query (right): decode each code to
  * `lo + code/255·(hi−lo)` and accumulate squared deltas
  * dim-ascending. Malformed inputs (wrong-length arrays on either
  * side, out-of-range codes) yield NULL for the whole distance — like
  * SqEncode, an intentional tightening versus the HOF rendering (whose
  * per-element null-padding could surface as a null or partial sum
  * depending on the aggregate's null handling), so a malformed row can
  * never rank. */
case class SqAdc(left: Expression, right: Expression, lo: Array[Double], hi: Array[Double])
    extends BinaryExpression {
  override def prettyName: String = "sq_adc"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(codesAny: Any, qAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val q = qAny.asInstanceOf[ArrayData]
    if (codes.numElements() != lo.length || q.numElements() != lo.length) return null
    var acc = 0.0
    var i = 0
    while (i < lo.length) {
      val c = codes.getInt(i)
      if (c < 0 || c > 255) return null
      val dec = lo(i) + c / 255.0 * (hi(i) - lo(i))
      val d = dec - q.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", lo, "double[]")
    val hiRef = ctx.addReferenceObj("sqHi", hi, "double[]")
    nullSafeCodeGen(ctx, ev, (in, q) => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val dec = ctx.freshName("dec")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val ok = ctx.freshName("ok")
      s"""
         |boolean $ok = $in.numElements() == $loRef.length && $q.numElements() == $loRef.length;
         |double $acc = 0.0;
         |for (int $i = 0; $ok && $i < $loRef.length; $i++) {
         |  int $c = $in.getInt($i);
         |  if ($c < 0 || $c > 255) { $ok = false; break; }
         |  double $dec = $loRef[$i] + $c / 255.0 * ($hiRef[$i] - $loRef[$i]);
         |  double $d = $dec - (double) $q.getFloat($i);
         |  $acc += $d * $d;
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
