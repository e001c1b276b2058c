package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Exact k-nearest-neighbor search — the Spark rendering of the
  * reference's brute-force path `VectorStore::search_knn`
  * (`/root/reference/src/lib.rs:74-97`): full scan, bounded heap of size
  * k over squared L2, results ascending by distance.
  *
  * Single-query: `ORDER BY dist LIMIT k` compiles to
  * `TakeOrderedAndProject` — a per-partition bounded heap plus a driver
  * merge, exactly the reference's algorithm but distributed. No shuffle
  * of the corpus, no collect.
  *
  * Multi-query (k-NN join): broadcast the (small) query side, score via
  * a nested-loop broadcast join, then reduce with the bounded-heap
  * [[TopKAggregator]] so only O(nQueries * k) rows ever shuffle.
  */
object Knn {

  /** Metric names accepted by search APIs. */
  val L2 = "l2"
  val Cosine = "cosine"
  /** Maximum-inner-product (MIPS): dist = −dot, so ascending order
    * ranks the highest dot products first — the same "smaller is
    * better" contract as the other metrics. */
  val Dot = "dot"

  private def distCol(metric: String)(a: Column, b: Column): Column = metric match {
    case L2     => l2SqNative(a, b) // fused codegen loop (same math as l2Sq)
    case Cosine => lit(1.0d) - cosineNative(a, b) // distance: ascending = most similar first
    case Dot    => -dotNative(a, b) // MIPS: negate so ascending = largest dot
    case other  => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  /** Top-k by squared L2 against a literal query vector — the reference's
    * `VectorDB::search` signature (`/root/reference/src/lib.rs:344-347`).
    * Ties broken by id for determinism. */
  def searchKnn(
      corpus: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      metric: String = L2): DataFrame =
    corpus
      .select(col(idCol), distCol(metric)(col(vecCol), vecLit(queryVec)).as("dist"))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)

  /** Top-k where the query vector is a row of the corpus itself (the
    * reference's self-query invariant shape, `src/lib.rs:546-549`).
    * The 1-row query side is broadcast — no collect on the driver. */
  def searchKnnById(
      corpus: DataFrame,
      qid: Long,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      metric: String = L2): DataFrame = {
    val q = corpus.filter(col(idCol) === lit(qid)).select(col(vecCol).as("__qv"))
    corpus
      .crossJoin(broadcast(q))
      .select(col(idCol), distCol(metric)(col(vecCol), col("__qv")).as("dist"))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** Range (radius) search: all corpus rows within `radius` of the
    * query under the metric (L2: squared radius, matching the squared
    * distances everywhere else). A scan + filter — fully pushed into
    * whole-stage codegen, no shuffle at all. */
  def rangeSearch(
      corpus: DataFrame,
      queryVec: Seq[Float],
      radius: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      metric: String = L2): DataFrame =
    corpus
      .select(col(idCol), distCol(metric)(col(vecCol), vecLit(queryVec)).as("dist"))
      .filter(col("dist") <= radius)
      .orderBy(col("dist").asc, col(idCol).asc)

  /** Batch k-NN join: for every query row, the k nearest corpus rows.
    *
    * Queries are broadcast (they are the small side in the serving
    * shape); the corpus streams through a BroadcastNestedLoopJoin; the
    * grouped bounded-heap aggregator does map-side partial top-k so the
    * shuffle carries only O(|queries| * k) rows — scale-safe at 100 TB
    * corpus as long as |queries| fits in a broadcast.
    *
    * Output: (qid, rank, vec_id, dist) — rank 1-based ascending by dist.
    */
  def knnJoin(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      corpusId: String = "vec_id",
      corpusVec: String = "embedding",
      queryId: String = "qid",
      queryVec: String = "qv",
      metric: String = L2): DataFrame = {
    val topk = TopK.topK(k)
    val scored = corpus
      .crossJoin(broadcast(queries))
      .select(
        col(queryId),
        col(corpusId),
        distCol(metric)(col(corpusVec), col(queryVec)).as("dist"))
    scored
      .groupBy(col(queryId))
      .agg(topk(col("dist"), col(corpusId)).as("hits"))
      .select(col(queryId), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(
        col(queryId),
        (col("pos") + 1).cast("int").as("rank"),
        col("hit._2").as(corpusId),
        col("hit._1").as("dist"))
  }

  /** MUTUAL k-NN pairs over a candidate pool: (a, b) survives iff b is
    * among a's k nearest AND a is among b's k nearest — the standard
    * high-precision seed for semantic clustering and near-dup
    * verification (one-directional neighbors include hubness
    * artifacts; mutuality filters them without any threshold to tune;
    * Jégou et al.'s reciprocal-NN lineage). Returns one row per
    * mutual pair: `(a, b, dist)` with `a < b`.
    *
    * Contract: the POOL is a bounded candidate set (an IVF cell, a
    * near-dup cluster, a blocking bucket — the MMR fetch convention),
    * so broadcasting it as [[knnJoin]]'s query side is the honest
    * cost. At corpus scale mutual-kNN runs per-pool after routing —
    * the all-corpus variant IS the k-NN self-join the index arms
    * exist to avoid.
    *
    * Self-matches are dropped AFTER an over-fetch of k+1 and the
    * survivors re-ranked by (dist, id) — a zero-distance duplicate
    * can displace the self row inside the heap, and without the
    * re-rank the directed edge set would be partition-dependent. */
  def mutualKnn(pool: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      metric: String = L2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = pool.select(col(idCol).as("__qid"), col(vecCol).as("__qv"))
    val nn = knnJoin(pool, q, k + 1, corpusId = idCol, corpusVec = vecCol,
        queryId = "__qid", queryVec = "__qv", metric = metric)
      .filter(col("__qid") =!= col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid")).orderBy(col("dist").asc, col(idCol).asc)
    val directed = nn
      .withColumn("__r", row_number().over(w)).filter(col("__r") <= k)
      .select(col("__qid").as("src"), col(idCol).as("dst"), col("dist"))
      // materialized: both reciprocity-join sides read it — without
      // this the whole k-NN join + re-rank would compute twice
      .localCheckpoint()
    directed
      .join(directed.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      .filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"), col("dist"))
  }
}
