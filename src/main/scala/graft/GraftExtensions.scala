package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

import graft.functions.expressions.{CosineSimilarityNative, DotProductNative, HammingWords, L2SquaredDistance, SignPack}

/** Session extensions registering the native vector kernels as SQL
  * functions (`spark.sql.extensions=graft.GraftExtensions`), callable
  * from SQL and via `functions.call_function` from the Column API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def binary(name: String)(f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { args =>
    if (args.length != 2)
      throw new IllegalArgumentException(
        s"$name requires exactly 2 arguments, got ${args.length}")
    f(args(0), args(1))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("l2sq_native"),
      info("l2sq_native", "l2sq_native(a, b) - squared L2 distance of two float arrays"),
      binary("l2sq_native")(L2SquaredDistance)))
    ext.injectFunction((
      FunctionIdentifier("dot_native"),
      info("dot_native", "dot_native(a, b) - dot product of two float arrays"),
      binary("dot_native")(DotProductNative)))
    ext.injectFunction((
      FunctionIdentifier("cosine_native"),
      info("cosine_native", "cosine_native(a, b) - cosine similarity with zero-norm guard"),
      binary("cosine_native")(CosineSimilarityNative)))
    ext.injectFunction((
      FunctionIdentifier("bq_pack_native"),
      info("bq_pack_native",
        "bq_pack_native(vec, dim) - pack a float vector's sign bits into 32-bit words"),
      { args =>
        if (args.length != 2)
          throw new IllegalArgumentException(
            s"bq_pack_native requires exactly 2 arguments, got ${args.length}")
        val dim = args(1) match {
          case lit: org.apache.spark.sql.catalyst.expressions.Literal
              if lit.value.isInstanceOf[Int] => lit.value.asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"bq_pack_native's dim must be an integer literal, got $other")
        }
        // SignPack reads via getFloat — cast here so the natural SQL
        // double-array spelling converts instead of misreading bytes
        SignPack(Cast(args(0), ArrayType(FloatType)), dim)
      }))
    ext.injectFunction((
      FunctionIdentifier("bq_hamming_native"),
      info("bq_hamming_native",
        "bq_hamming_native(a, b) - Hamming distance of two packed sign patterns"),
      binary("bq_hamming_native")((a, b) =>
        HammingWords(Cast(a, ArrayType(LongType)), Cast(b, ArrayType(LongType))))))
  }
}
