package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.BinaryQuant
import graft.operators.Knn

/** Binary (sign-bit) quantization: the pack must set exactly the
  * strictly-positive bits, Hamming must be a metric on the packed
  * words, and the refine pass must recover exact brute force when the
  * shortlist covers the corpus. */
class BinaryQuantSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("packExpr sets exactly the strictly-positive bits; tail bits stay 0") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, -1f, 0f, 2f, 3f)), // bits 0,3,4 -> 25, one word
      (2L, Array.fill(5)(-1f)),
      (3L, Array.fill(5)(0.5f))).toDF("id", "v")
    val got = df.select(col("id"), BinaryQuant.packExpr(col("v"), 5).as("w"))
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(got(0)._2 == Seq(25L))
    assert(got(1)._2 == Seq(0L), "no strictly positive component -> empty pattern")
    assert(got(2)._2 == Seq(31L), "all five positive -> low 5 bits only")
  }

  test("packExpr at dim 64 uses two words and the sign convention is strict") {
    import spark.implicits._
    val v = Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)
    val got = Seq((1L, v)).toDF("id", "v")
      .select(BinaryQuant.packExpr(col("v"), 64)).as[Seq[Long]].head()
    val evenBits = (0 until 32 by 2).map(1L << _).sum
    assert(got == Seq(evenBits, evenBits))
  }

  test("hammingExpr: identity 0, opposite sign patterns differ in every dim") {
    import spark.implicits._
    val a = Array.fill(64)(1f)
    val b = Array.fill(64)(-1f)
    val df = Seq((a, b)).toDF("a", "b").select(
      BinaryQuant.hammingExpr(
        BinaryQuant.packExpr(col("a"), 64), BinaryQuant.packExpr(col("a"), 64)).as("same"),
      BinaryQuant.hammingExpr(
        BinaryQuant.packExpr(col("a"), 64), BinaryQuant.packExpr(col("b"), 64)).as("opp"))
    val r = df.head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 64)
  }

  test("native pack/hamming kernels agree bit-for-bit with the HOF reference forms") {
    val both = emb.select(
      BinaryQuant.packExpr(col("embedding"), 64).as("nw"),
      BinaryQuant.packExprHof(col("embedding"), 64).as("hw"))
    assert(both.filter(col("nw") =!= col("hw")).count() == 0,
      "native SignPack must equal the HOF pack on every corpus row")
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qv")).head().getSeq[Float](0)
    val qw = typedLit(q).cast("array<float>")
    val ham = emb.select(
      BinaryQuant.hammingExpr(
        BinaryQuant.packExpr(col("embedding"), 64),
        BinaryQuant.packExpr(qw, 64)).as("nh"),
      BinaryQuant.hammingExprHof(
        BinaryQuant.packExprHof(col("embedding"), 64),
        BinaryQuant.packExprHof(qw, 64)).as("hh"))
    assert(ham.filter(col("nh") =!= col("hh")).count() == 0,
      "native HammingWords must equal the HOF form on every corpus row")
  }

  test("refinedKnn with fetch >= corpus equals exact brute force") {
    val qs = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val n = emb.count().toInt
    val got = BinaryQuant.refinedKnn(emb, qs, k = 10, fetch = n, dim = 64)
      .select("qid", "rank", "vec_id")
      .orderBy("qid", "rank").collect().toSeq
    val want = Knn.knnJoin(emb, qs, k = 10)
      .select("qid", "rank", "vec_id")
      .orderBy("qid", "rank").collect().toSeq
    assert(got == want)
  }

  test("Hamming shortlist recall@10 at production fetch sizes (floor + monotone)") {
    import spark.implicits._
    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Knn.knnJoin(emb, qs, k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    def recall(fetch: Int): Double = {
      val got = BinaryQuant.refinedKnn(emb, qs, k = 10, fetch = fetch, dim = 64)
        .select("qid", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
        .map { case (q, xs) => q -> xs.map(_._2).toSet }
      exact.map { case (q, w) => (got.getOrElse(q, Set.empty) & w).size / 10.0 }
        .sum / exact.size
    }
    val (r32, r128) = (recall(32), recall(128))
    info(f"bq refine recall@10: fetch=32 $r32%.3f fetch=128 $r128%.3f")
    assert(r128 >= r32, "recall must not decrease with a wider shortlist")
    // measured on the i.i.d.-gaussian fixture (the hardest case for a
    // 1-bit sketch): fetch=32 0.538, fetch=128 0.888 — floors with margin
    assert(r32 >= 0.45, f"fetch=32 recall@10 $r32%.3f below floor")
    assert(r128 >= 0.80, f"fetch=128 recall@10 $r128%.3f below floor")
  }
}
