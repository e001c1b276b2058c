package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mmr

/** MMR diversity re-ranking semantics: λ = 1 degenerates to plain
  * top-k; lower λ trades redundant near-duplicates for coverage. The
  * gated query (q_mmr) pins the pick order against an unrolled-greedy
  * SQL replay; this spec pins the behavioral contract on a geometry
  * where the right answers are obvious by hand. */
class MmrSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("lambda=1 equals plain top-k; lambda<1 swaps a near-duplicate for the distinct item") {
    import spark.implicits._
    // a tight cluster of near-duplicates at the query, plus one
    // distinct item farther away
    val corpus = Seq(
      (1L, Seq(0.00f, 0.00f)),
      (2L, Seq(0.01f, 0.00f)),
      (3L, Seq(0.00f, 0.01f)),
      (10L, Seq(1.00f, 1.00f))).toDF("vec_id", "embedding")
    val q = Seq(0.0f, 0.0f)
    def picks(lambda: Double): Seq[Long] =
      Mmr.searchMmr(corpus, q, k = 2, fetch = 4, lambda = lambda)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(picks(1.0) == Seq(1L, 2L), "pure relevance must equal plain top-k")
    assert(picks(0.3) == Seq(1L, 10L),
      "diversity trade-off must swap the near-duplicate for the distinct item")
    // rank-1 is always the most relevant row regardless of lambda
    assert(picks(0.0).head == 1L || picks(0.0) == Seq(1L, 10L))
    // determinism: repeated runs pick identically
    assert(picks(0.3) == picks(0.3))
  }

  test("fetch bounds the candidate pool; k > pool size returns the whole pool ranked") {
    import spark.implicits._
    val corpus = Seq(
      (5L, Seq(0.0f, 0.0f)), (6L, Seq(0.5f, 0.0f))).toDF("vec_id", "embedding")
    val out = Mmr.searchMmr(corpus, Seq(0.0f, 0.0f), k = 2, fetch = 2, lambda = 0.5)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 6L))
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2))
  }
}
