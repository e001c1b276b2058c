package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankEval

/** Retrieval-evaluation metrics: the textbook identities (perfect
  * ranking scores 1 everywhere, disjoint scores 0, a known partial
  * ranking matches hand math) and the no-results edge. */
class RankEvalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def df(rows: Seq[(Long, Int, Long)]) = {
    import spark.implicits._
    rows.toDF("qid", "rank", "vec_id")
  }
  private def truth(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("qid", "vec_id")
  }

  test("perfect ranking scores 1.0 on every metric") {
    val res = df(Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
    val tr = truth(Seq((1L, 10L), (1L, 11L), (1L, 12L)))
    val r = RankEval.evaluate(res, tr, k = 3).head()
    assert(r.getLong(1) == 3 && r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
  }

  test("disjoint ranking scores 0; a truth-only qid with no results scores 0") {
    val res = df(Seq((1L, 1, 99L), (1L, 2, 98L)))
    val tr = truth(Seq((1L, 10L), (2L, 20L)))
    val rows = RankEval.evaluate(res, tr, k = 3)
      .orderBy("qid").collect()
    assert(rows.length == 2, "every truth qid must report, even with no results")
    rows.foreach { r =>
      assert(r.getLong(1) == 0 && r.getDouble(2) == 0.0 &&
        r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    }
  }

  test("partial ranking matches hand math") {
    // truth {10, 11}; results rank1=miss, rank2=10, rank3=11
    val res = df(Seq((1L, 1, 99L), (1L, 2, 10L), (1L, 3, 11L)))
    val tr = truth(Seq((1L, 10L), (1L, 11L)))
    val r = RankEval.evaluate(res, tr, k = 3).head()
    assert(r.getLong(1) == 2 && r.getDouble(2) == 1.0, "recall = 2/min(2,3)")
    assert(r.getDouble(3) == 0.5, "first relevant at rank 2")
    val g = RankEval.gainTable(3)
    val want = (g(1) + g(2)) / (g(0) + g(1)) // dcg(ranks 2,3) / idcg(2 relevant)
    assert(math.abs(r.getDouble(4) - want) < 1e-9, s"ndcg ${r.getDouble(4)} vs $want")
  }

  test("metrics never exceed 1 and recall caps by k") {
    // 5 relevant but k=3: recall denominator must be min(n_rel, k)
    val res = df(Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L)))
    val tr = truth((10L to 14L).map(i => (1L, i)))
    val r = RankEval.evaluate(res, tr, k = 3).head()
    assert(r.getDouble(2) == 1.0, "3 hits of min(5,3) relevant = full recall@3")
    assert(r.getDouble(4) <= 1.0 + 1e-12)
  }
}
