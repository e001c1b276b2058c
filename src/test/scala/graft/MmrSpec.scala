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

  test("handle searchDiverse == raw searchMmr when the fetch arm is exhaustive-exact") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qv = e.filter(col("vec_id") === 7L).select("embedding")
      .head().getSeq[Float](0)
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64)
    db.buildIndexIvf(numCells = 16, iters = 1)
    db.nprobe = 16 // every cell probed + exhaustive ef => fetch == exact
    db.efSearch = 4096
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaHandle = rows(db.searchDiverse(qv, k = 5, fetch = 20, lambda = 0.5))
    val raw = rows(Mmr.searchMmr(e, qv, k = 5, fetch = 20, lambda = 0.5))
    assert(viaHandle == raw,
      s"handle MMR diverged from the raw operator:\n$viaHandle\nvs\n$raw")
    // cosine arm serves without error and rank-1 is the top cosine hit
    val cdb = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64)
    cdb.buildIndexIvf(numCells = 16, iters = 1,
      metric = graft.operators.Knn.Cosine)
    cdb.nprobe = 16
    cdb.efSearch = 4096
    val div = cdb.searchDiverse(qv, k = 3, fetch = 12, lambda = 0.5)
      .orderBy("rank").collect()
    val top = cdb.search(qv, 1).collect().head.getLong(0)
    assert(div.length == 3 && div.head.getLong(1) == top,
      "rank-1 of cosine MMR must be the top cosine hit")
  }

  test("searchDiverseBatch == per-query searchDiverse (one fetch job, same picks)") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64)
    db.buildIndexIvf(numCells = 16, iters = 1)
    db.nprobe = 16
    db.efSearch = 4096
    val qids = Seq(11L, 12L, 13L)
    val queries = e.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch = db.searchDiverseBatch(queries, k = 4, fetch = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val single = qids.flatMap { q =>
      val qv = e.filter(col("vec_id") === q).select("embedding")
        .head().getSeq[Float](0)
      db.searchDiverse(qv, k = 4, fetch = 16)
        .collect().map(r => (q, r.getInt(0), r.getLong(1)))
    }.toSet
    assert(batch == single, s"batch/single MMR divergence:\n$batch\nvs\n$single")
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
