package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Binary (sign-bit) quantization: 1 bit per dimension, Hamming-ranked
  * serving with optional exact re-rank — the most compressed point on
  * the quantization ladder the engine serves (32× smaller than SQ's
  * byte codes; extension — the reference stores raw f32 only,
  * `/root/reference/src/lib.rs:22-26`).
  *
  * A vector's code is its sign pattern packed into 32-bit words; the
  * binary metric is Hamming distance (XOR + popcount — for sign
  * patterns it is a monotone proxy of angular distance, the classic
  * SRP-LSH estimator). The serving shapes mirror [[graft.operators.Knn]]:
  * broadcast packed queries, stream the packed corpus, bounded-heap
  * top-k so the shuffle carries O(|queries|·k) rows. At 100 TB the
  * ranking scan moves ceil(d/32) longs per row instead of d floats,
  * and the optional refine pass re-reads ONLY the shortlisted ids.
  *
  * Everything is integer arithmetic on strict sign tests — the DuckDB
  * oracle replays pack, XOR/popcount ranking, and the refine cut
  * bit-for-bit.
  */
object BinaryQuant {

  /** Powers of two as a literal array: HOF lambdas cannot call the
    * Int-only `shiftleft` builder, and a literal lookup keeps the pack
    * loop in codegen. */
  private val pow2: Column = typedLit((0 until 32).map(i => 1L << i))

  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  /** Pack a float vector's sign bits into 32-bit words (held in
    * longs): bit `i` of word `w` is set iff component `w·32 + i` is
    * strictly positive. Components past `dim` (the tail of the last
    * word) stay 0. Native fused loop
    * ([[graft.functions.expressions.SignPack]]); [[packExprHof]] is the
    * builtin-only reference form, parity-pinned by the spec. */
  def packExpr(vec: Column, dim: Int): Column =
    toCol(graft.functions.expressions.SignPack(
      toExpr(vec.cast("array<float>")), dim))

  /** Builtin-only reference implementation of [[packExpr]] (HOF form —
    * `get` returns NULL out of bounds and the strict `> 0` test maps
    * NULL to unset). */
  def packExprHof(vec: Column, dim: Int): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val nWords = (dim + 31) / 32
    transform(sequence(lit(0), lit(nWords - 1)), w =>
      aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, i) =>
        acc + when(get(vec, w * 32 + i) > 0f, element_at(pow2, i + 1))
          .otherwise(0L)))
  }

  /** Hamming distance between two packed sign patterns: summed
    * popcount of the XOR-ed words. Native XOR + `Long.bitCount` loop
    * ([[graft.functions.expressions.HammingWords]]); [[hammingExprHof]]
    * is the builtin-only reference form, parity-pinned by the spec.
    * Both sides must be packs of the SAME dim — a word-count mismatch
    * raises at eval (a truncated distance would silently
    * underestimate). */
  def hammingExpr(a: Column, b: Column): Column =
    toCol(graft.functions.expressions.HammingWords(toExpr(a), toExpr(b)))

  /** Builtin-only reference implementation of [[hammingExpr]]. */
  def hammingExprHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), _ + _).cast("int")

  /** Hamming k-NN join: for every query row the k corpus rows with the
    * closest sign pattern, ties by id ((hamming, id) is a total order,
    * so results are deterministic). Same scale contract as
    * [[graft.operators.Knn.knnJoin]]: queries broadcast, map-side
    * partial bounded heaps, O(|queries|·k) shuffle.
    * Output: (qid, rank, vec_id, hamming). */
  def hammingKnn(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int,
      corpusId: String = "vec_id",
      corpusVec: String = "embedding",
      queryId: String = "qid",
      queryVec: String = "qv"): DataFrame = {
    val topk = TopK.topK(k)
    corpus
      .select(col(corpusId), packExpr(col(corpusVec), dim).as("__cw"))
      .crossJoin(broadcast(
        queries.select(col(queryId), packExpr(col(queryVec), dim).as("__qw"))))
      .select(col(queryId), col(corpusId),
        hammingExpr(col("__cw"), col("__qw")).cast("double").as("__h"))
      .groupBy(col(queryId))
      .agg(topk(col("__h"), col(corpusId)).as("hits"))
      .select(col(queryId), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(
        col(queryId),
        (col("pos") + 1).cast("int").as("rank"),
        col("hit._2").as(corpusId),
        col("hit._1").cast("int").as("hamming"))
  }

  /** Two-stage binary serving: Hamming shortlist of `fetch` candidates
    * per query, then exact L2² re-rank of ONLY that bounded set (the
    * ADC-refine shape of the PQ/SQ paths, at 1 bit). The refine pass
    * joins the shortlist back to the corpus on id — a broadcast join
    * against O(|queries|·fetch) ids, so the corpus is never re-scored
    * wholesale. With `fetch >= |corpus|` the result equals exact
    * brute force (the spec's gate). Output: (qid, rank, vec_id, dist). */
  def refinedKnn(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      fetch: Int,
      dim: Int,
      corpusId: String = "vec_id",
      corpusVec: String = "embedding",
      queryId: String = "qid",
      queryVec: String = "qv"): DataFrame = {
    require(fetch >= k, s"fetch ($fetch) must be >= k ($k)")
    val shortlist = hammingKnn(corpus, queries, fetch, dim,
      corpusId, corpusVec, queryId, queryVec)
      .select(col(queryId), col(corpusId))
    val topk = TopK.topK(k)
    corpus
      .join(broadcast(shortlist), corpusId)
      .join(broadcast(queries), queryId)
      .select(col(queryId), col(corpusId),
        graft.functions.VectorFunctions.l2SqNative(col(corpusVec), col(queryVec)).as("__d"))
      .groupBy(col(queryId))
      .agg(topk(col("__d"), col(corpusId)).as("hits"))
      .select(col(queryId), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(
        col(queryId),
        (col("pos") + 1).cast("int").as("rank"),
        col("hit._2").as(corpusId),
        col("hit._1").as("dist"))
  }
}
