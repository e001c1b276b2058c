package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-evaluation metrics — the harness every search stack runs
  * against its ground truth (extension; the reference ships no
  * evaluation surface): per-query recall@k, MRR, and binary-relevance
  * nDCG@k for a ranked result table against a relevant-id table.
  *
  * Determinism across engines: the 1/log₂(rank+1) gain table is
  * GENERATED ONCE in Scala, pre-rounded to 12 decimals, and embedded
  * as literals on both sides of the gate — no engine's libm log is in
  * the comparison path — and DCG terms cast to exact decimals before
  * summing, so accumulation order cannot change a bit. One hash join
  * against the (small) truth table + one aggregate: O(|results|) at
  * any scale. */
object RankEval {

  /** Binary-relevance gain at rank r: 1/log₂(r+1), pre-rounded to 12
    * decimals so the literal survives double→decimal casts identically
    * in every engine. */
  def gainTable(maxK: Int): Seq[Double] = (1 to maxK).map { r =>
    BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Ideal DCG for n relevant results (cumulative gain prefix). */
  def idealDcg(maxK: Int): Seq[Double] = {
    val g = gainTable(maxK).map(BigDecimal(_))
    g.scanLeft(BigDecimal(0))(_ + _).tail.map(_.toDouble)
  }

  /** Per-query metrics: `results` rows are (qid, rank, id) with rank
    * 1-based; `truth` rows are (qid, id) — the relevant set. Output:
    * (qid, n_hit, recall, mrr, ndcg), one row per qid present in
    * `truth`. Queries with no result rows score 0. */
  def evaluate(results: DataFrame, truth: DataFrame, k: Int,
      qidCol: String = "qid", idCol: String = "vec_id",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val gains = typedLit(gainTable(k))
    val ideal = typedLit(idealDcg(k))
    val hits = results.filter(col(rankCol) <= k)
      .join(truth.select(col(qidCol), col(idCol), lit(1).as("__rel")),
        Seq(qidCol, idCol), "left")
    val perQ = hits.groupBy(col(qidCol)).agg(
      sum(coalesce(col("__rel"), lit(0))).as("__n_hit"),
      min(when(col("__rel") === 1, col(rankCol))).as("__first"),
      sum(when(col("__rel") === 1,
          element_at(gains, col(rankCol)).cast("decimal(18,12)"))
        .otherwise(lit(0).cast("decimal(18,12)"))).cast("double").as("__dcg"))
    truth.groupBy(col(qidCol)).agg(count(lit(1)).as("__n_rel"))
      .join(perQ, Seq(qidCol), "left")
      .select(
        col(qidCol),
        coalesce(col("__n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("__n_hit"), lit(0L)).cast("double") /
          least(col("__n_rel"), lit(k.toLong)).cast("double")).as("recall"),
        coalesce(lit(1.0) / col("__first"), lit(0.0)).as("mrr"),
        coalesce(col("__dcg"), lit(0.0))
          ./(element_at(ideal, least(col("__n_rel"), lit(k.toLong)).cast("int")))
          .as("ndcg"))
  }
}
