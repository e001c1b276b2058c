package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Coreset

/** Greedy k-center (Gonzalez farthest-point traversal): hand-replayed
  * picks on planted geometry, the non-increasing radius law, coverage
  * dominance over a same-size random pick, and loud misuse. */
class CoresetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(rows: Seq[(Long, Seq[Float])], k: Int, fetch: Int = 1000) = {
    import spark.implicits._
    Coreset.kCenter(rows.toDF("vec_id", "embedding"), k, fetch)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("hand picks: three planted clusters are hit once each before any refinement") {
    // clusters near 0, 100, 50 on a line; seed = id 0 (cluster A),
    // pick 2 = the true farthest point (101, id 11 — not its 100
    // neighbor), pick 3 = cluster C (50 and 51 tie at 2500 → id 20)
    val rows = Seq(
      0L -> Seq(0f), 1L -> Seq(1f), 2L -> Seq(2f),
      10L -> Seq(100f), 11L -> Seq(101f),
      20L -> Seq(50f), 21L -> Seq(51f))
    val got = run(rows, k = 3)
    assert(got.map(_._2) == Seq(0L, 11L, 20L), s"got $got")
    assert(got(0)._3 == 0.0 && got(1)._3 == 10201.0 && got(2)._3 == 2500.0)
  }

  test("radius sequence is non-increasing (the Gonzalez invariant)") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 60L).map(i =>
      i -> Seq.fill(4)(rnd.nextInt(100).toFloat))
    val rs = run(rows, k = 10).map(_._3)
    assert(rs.tail == rs.tail.sorted.reverse, s"radii must not increase: $rs")
  }

  test("ties break to the smallest id; duplicate points never both get picked early") {
    val rows = Seq(0L -> Seq(0f), 5L -> Seq(10f), 3L -> Seq(10f), 9L -> Seq(4f))
    val got = run(rows, k = 3)
    // farthest from 0 is the duplicate pair at 10 — smallest id (3) wins;
    // its twin (5) is then at distance 0, so pick 3 is id 9
    assert(got.map(_._2) == Seq(0L, 3L, 9L), s"got $got")
  }

  test("coverage beats the first-k prefix pick on clustered data") {
    val rnd = new scala.util.Random(11)
    // two tight clusters + the prefix ids all in cluster A
    val rows = (0L until 30L).map(i => i -> Seq(rnd.nextFloat(), rnd.nextFloat())) ++
      (30L until 60L).map(i => i -> Seq(500f + rnd.nextFloat(), 500f + rnd.nextFloat()))
    def coverage(centers: Seq[Long]): Double = {
      val cs = rows.filter(r => centers.contains(r._1)).map(_._2)
      rows.map { case (_, v) =>
        cs.map(c => c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum.toDouble).min
      }.max
    }
    val kc = run(rows.map { case (i, v) => i -> v.map(identity) }, k = 4).map(_._2)
    assert(coverage(kc) < coverage(Seq(0L, 1L, 2L, 3L)),
      "k-center must cover the far cluster the prefix pick ignores")
  }

  test("misuse rejected loudly (k < 1, fetch < k, empty pool)") {
    import spark.implicits._
    val df = Seq((1L, Seq(1f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] { Coreset.kCenter(df, 0, 10) }
    intercept[IllegalArgumentException] { Coreset.kCenter(df, 5, 3) }
    intercept[IllegalArgumentException] {
      Coreset.kCenter(df.filter(col("vec_id") < 0), 2, 10)
    }
  }
}
