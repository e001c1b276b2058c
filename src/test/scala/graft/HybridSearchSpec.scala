package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25
import graft.queries.HybridQueries

/** BM25 + RRF hybrid-retrieval invariants (lexical leg the reference
  * lacks; dense leg is the reference's `search_knn`,
  * `/root/reference/src/lib.rs:74-97`). */
class HybridSearchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("bm25: scores only matching docs, all scores positive") {
    val scored = Bm25.score(docs, HybridQueries.Terms).cache()
    val matching = docs
      .filter(HybridQueries.Terms
        .map(t => array_contains(split(col("text"), "\\s+"), t))
        .reduce(_ || _))
      .count()
    assert(scored.count() == matching)
    assert(scored.filter(col("score") <= 0).count() == 0)
  }

  test("bm25: rarer term outscores common term at equal tf (idf ordering)") {
    import spark.implicits._
    // 'rare' in 1 of 4 docs, 'common' in all 4; doc 0 hits each once
    // at identical length, so the score gap is pure idf
    val d = Seq(
      (0L, "rare common pad pad"),
      (1L, "common x pad pad"),
      (2L, "common y pad pad"),
      (3L, "common z pad pad")).toDF("doc_id", "text")
    val rare = Bm25.score(d, Seq("rare")).filter($"doc_id" === 0).head().getDouble(1)
    val common = Bm25.score(d, Seq("common")).filter($"doc_id" === 0).head().getDouble(1)
    assert(rare > common)
  }

  test("bm25: tf saturates — doubling tf less than doubles the score") {
    import spark.implicits._
    val d = Seq(
      (0L, "term pad pad pad"),
      (1L, "term term pad pad"),
      (2L, "x pad pad pad")).toDF("doc_id", "text")
    val s = Bm25.score(d, Seq("term")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) > s(0L), "higher tf must score higher")
    assert(s(1L) < 2 * s(0L), "k1 saturation must be sublinear")
  }

  test("hybrid rrf: fused score is exactly sum of rank reciprocals") {
    val fused = HybridQueries.qHybridRrf(spark, sfDir).collect()
    assert(fused.length == 10)
    fused.foreach { r =>
      val (l, v) = (r.getInt(1), r.getInt(2))
      val expect =
        (if (l > 0) 1.0 / (60 + l) else 0.0) + (if (v > 0) 1.0 / (60 + v) else 0.0)
      assert(math.abs(r.getDouble(3) - expect) < 1e-6)
      assert(l > 0 || v > 0, "a fused doc must appear in at least one leg")
    }
    // descending by fused score
    val scores = fused.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("hybrid rrf: both legs are represented and interleave by rank") {
    // the fixture's lexical and dense top-20s are disjoint (random text
    // vs random embeddings), so fusion must interleave the two legs:
    // equal ranks → equal reciprocal → adjacent fused rows
    val fused = HybridQueries.qHybridRrf(spark, sfDir).collect()
    assert(fused.exists(r => r.getInt(1) > 0), "lexical leg missing from fusion")
    assert(fused.exists(r => r.getInt(2) > 0), "dense leg missing from fusion")
    // the dense query vector itself (vec_id 0) is cosine rank 1
    val self = fused.find(_.getLong(0) == 0L)
    assert(self.exists(_.getInt(2) == 1))
  }
}
