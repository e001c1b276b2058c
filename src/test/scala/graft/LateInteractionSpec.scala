package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Knn, LateInteraction}

/** MaxSim late interaction: hand-checkable alignment semantics, the
  * single-vector degenerate case collapsing to dot-metric k-NN, and
  * partition invariance of the decimal-exact score. */
class LateInteractionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("hand-computed MaxSim: each query vector aligns with its best doc vector") {
    import spark.implicits._
    // doc 1 holds axis vectors e1, e2; doc 2 holds -e1, e2
    val docs = Seq(
      (1L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(-1f, 0f)), (2L, Array(0f, 1f))).toDF("doc_id", "vec")
    // query: two vectors, one per axis -> doc1 scores 1+1, doc2 -? max(-1,0)+max(0,1)=0+1
    val qs = Seq((7L, 0L, Array(1f, 0f)), (7L, 1L, Array(0f, 1f)))
      .toDF("qid", "q_ord", "qv")
    val got = LateInteraction.maxSimJoin(docs, qs, k = 2)
      .select("qid", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((7L, 1, 1L, 2.0), (7L, 2, 2L, 1.0)))
  }

  test("one vector per doc and per query degenerates to dot-metric k-NN") {
    val docs = emb.select(col("vec_id").as("doc_id"), col("embedding").as("vec"))
    val qs = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), lit(0L).as("q_ord"), col("embedding").as("qv"))
    val got = LateInteraction.maxSimJoin(docs, qs, k = 10)
      .select("qid", "rank", "doc_id")
      .orderBy("qid", "rank").collect().toSeq
    val want = Knn.knnJoin(emb,
        emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        k = 10, metric = Knn.Dot)
      .select(col("qid"), col("rank"), col("vec_id").as("doc_id"))
      .orderBy("qid", "rank").collect().toSeq
    assert(got == want)
  }

  test("score is invariant to physical partitioning (decimal-exact sum)") {
    val qs = emb.filter(col("vec_id") < 8)
      .select(expr("vec_id div 4").as("qid"), col("vec_id").as("q_ord"),
        col("embedding").as("qv"))
    def run(parts: Int) = LateInteraction.maxSimJoin(
        emb.repartition(parts)
          .select(expr("vec_id div 4").as("doc_id"), col("embedding").as("vec")),
        qs, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(run(1) == run(32))
  }

  test("adaptive probing: wide alpha equals fixed nprobe; tight alpha only shrinks candidates, nearest cell always probed") {
    import graft.index.IvfIndex
    val dv = emb.select(expr("vec_id div 4").as("doc_id"), col("embedding").as("vec"))
    val qs = emb.filter(col("vec_id") < 8)
      .select(expr("vec_id div 4").as("qid"), col("vec_id").as("q_ord"),
        col("embedding").as("qv"))
    val router = IvfIndex.train(emb, k = 8, iters = 1)
    val cells = LateInteraction.docCellListing(dv, router)
    def run(alpha: Option[Double]) = LateInteraction
      .maxSimRouted(dv, cells, qs, k = 5, router, nprobe = 4, adaptiveAlpha = alpha)
      .orderBy("qid", "rank").collect().toSeq
    // an enormous alpha never cuts: identical to the fixed-nprobe run
    assert(run(Some(1e18)) == run(None),
      "wide-alpha adaptive must equal fixed-nprobe serving")
    // alpha=1.0 probes only each vector's nearest cell — a subset of
    // the fixed probe set, so the run completes and returns ranked
    // rows for every query (the nearest cell is always probed)
    val tight = run(Some(1.0))
    assert(tight.nonEmpty && tight.map(_.getLong(0)).distinct.size == 2,
      "tight-alpha serving must still answer every query")
  }

  test("incremental listing maintenance equals a fresh build over the updated corpus") {
    import graft.index.IvfIndex
    import spark.implicits._
    val dv = emb.select(expr("vec_id div 4").as("doc_id"), col("embedding").as("vec"))
    val router = IvfIndex.train(emb, k = 8, iters = 1)
    // start from docs 10..124, remove 20-24, add 0-9 back
    val base = dv.filter(col("doc_id") >= 10)
    val added = dv.filter(col("doc_id") < 10)
    val removed = (20L until 25L).toDF("doc_id")
    val updated = LateInteraction.updateListing(
        LateInteraction.docCellListing(base, router), router, added, removed)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val fresh = LateInteraction.docCellListing(
        dv.filter(col("doc_id") < 20 || col("doc_id") >= 25), router)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(updated == fresh,
      "incrementally maintained listing diverged from a fresh build")
  }
}
