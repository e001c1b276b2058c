package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.Hnsw

/** Greedy k-center coreset selection (Gonzalez, TCS '85 farthest-point
  * traversal; the 2-approximation for metric k-center) — the
  * data-SELECTION primitive beside [[Mmr]]'s query-time diversity and
  * DSIR's importance weighting: pick k rows so every pool row is close
  * to some pick. A pretraining pipeline uses exactly this shape to
  * choose annotation batches, seed clusters for SemDeDup-style
  * pruning, or build a representative eval slice from an embedding
  * pool — coverage, not relevance, is the objective.
  *
  * Determinism (the [[Mmr.searchMmr]] conventions): the pool is a
  * BOUNDED deterministic artifact (lowest `fetch` ids — an IVF cell,
  * a near-dup cluster, a stratified sample: the bounded-pool contract
  * of the MMR/mutual-kNN family); the seed is the smallest id; each
  * round picks argmax of min-distance-to-selected with ascending-id
  * ties. Float safety is STRONGER than MMR's: L2² evaluates as the
  * same sequential per-dimension sum in both engines, and min/max
  * over finished doubles are order-free — no accumulation across
  * candidates exists to diverge, so an unrolled SQL oracle replays
  * every pick exactly.
  *
  * The emitted `radius` sequence (each pick's distance to the
  * already-selected set; seed = 0) is the operator's own quality
  * number: it is non-increasing, and after k picks the next value
  * bounds the true k-center optimum within 2× (Gonzalez's guarantee)
  * — the way q_lsh_recall and RecallSpec carry their own floors.
  *
  * Scale shape: ONE distributed pass bounds the pool
  * (TakeOrderedAndProject on id), the greedy walk is O(k·fetch·d) on
  * the driver over that model-sized artifact — at 100 TB the pool
  * comes from routing (per-cell/per-cluster), never from a global
  * collect. */
object Coreset {

  def kCenter(df: DataFrame, k: Int, fetch: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(fetch >= k, s"need fetch >= k, got fetch=$fetch k=$k")
    val spark = df.sparkSession
    import spark.implicits._
    val pool = df
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .orderBy(col("id").asc)
      .limit(fetch)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(pool.nonEmpty, "kCenter needs a non-empty pool")
    val picked = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)](
      (1, pool.head._1, 0.0))
    val taken = scala.collection.mutable.BitSet(0)
    val minD = Array.fill(pool.length)(Double.PositiveInfinity)
    var lastVec = pool.head._2
    while (picked.length < k && taken.size < pool.length) {
      var j = 0
      while (j < pool.length) {
        if (!taken(j)) {
          val d = Hnsw.l2Sq(pool(j)._2, lastVec)
          if (d < minD(j)) minD(j) = d
        }
        j += 1
      }
      // argmax of min-dist, ascending-id tie — the farthest point
      var best = -1
      j = 0
      while (j < pool.length) {
        if (!taken(j) && (best == -1 || minD(j) > minD(best) ||
          (minD(j) == minD(best) && pool(j)._1 < pool(best)._1))) best = j
        j += 1
      }
      taken += best
      picked += ((picked.length + 1, pool(best)._1, minD(best)))
      lastVec = pool(best)._2
    }
    picked.toSeq.toDF("rnk", idCol, "radius")
      .select(col("rnk").cast("int").as("rnk"), col(idCol),
        round(col("radius"), 3).as("radius"))
  }
}
