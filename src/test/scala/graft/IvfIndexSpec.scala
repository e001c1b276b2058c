package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.IvfIndex

/** Trained IVF quantizer tests: determinism, Lloyd's monotonicity, and
  * end-to-end VectorDB IVF+HNSW search. */
class IvfIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("training is deterministic run-to-run") {
    val m1 = IvfIndex.train(emb, k = 10, iters = 3)
    val m2 = IvfIndex.train(emb, k = 10, iters = 3)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("Lloyd's iterations do not increase inertia") {
    val i1 = IvfIndex.inertia(emb, IvfIndex.train(emb, 10, iters = 1))
    val i3 = IvfIndex.inertia(emb, IvfIndex.train(emb, 10, iters = 3))
    val i5 = IvfIndex.inertia(emb, IvfIndex.train(emb, 10, iters = 5))
    assert(i3 <= i1 + 1e-9 && i5 <= i3 + 1e-9, s"inertia rose: $i1 -> $i3 -> $i5")
  }

  test("expression assignment matches the driver-side model") {
    val model = IvfIndex.train(emb, 10, iters = 3)
    import spark.implicits._
    val fromExpr = IvfIndex.assign(emb, model).select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    val local = emb.select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> model.assignOne(v) }.toMap
    assert(fromExpr == local)
  }

  test("VectorDB end-to-end: IVF-partitioned HNSW self-query") {
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64)
    db.buildIndexIvf(numCells = 8, iters = 3)
    import spark.implicits._
    val qv = emb.filter(col("vec_id") === 42L)
      .select(col("embedding").cast("array<float>")).as[Array[Float]].collect()(0)
    val hits = db.search(qv.toSeq, k = 3).collect()
    assert(hits.nonEmpty)
    assert(hits(0).getAs[Long]("vector_id") == 42L, s"self-query must rank itself first: ${hits.toSeq}")
    assert(hits(0).getAs[Double]("dist") < 1e-4)
  }
}
