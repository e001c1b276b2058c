package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Knn

/** Mutual k-NN: reciprocity against the naive double-rank reference,
  * hubness asymmetry filtering, symmetry of the reported distance, and
  * the self/duplicate edge cases the k+1 over-fetch exists for. */
class MutualKnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(vs: Seq[(Long, Seq[Float])], k: Int): Set[(Long, Long)] = {
    import spark.implicits._
    Knn.mutualKnn(vs.toDF("vec_id", "embedding"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def naive(vs: Seq[(Long, Seq[Float])], k: Int): Set[(Long, Long)] = {
    def d2(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val top = vs.map { case (id, v) =>
      id -> vs.filter(_._1 != id)
        .sortBy { case (oid, ov) => (d2(v, ov), oid) }
        .take(k).map(_._1).toSet
    }.toMap
    (for {
      (a, na) <- top.toSeq; b <- na
      if top(b).contains(a) && a < b
    } yield (a, b)).toSet
  }

  test("two tight pairs far apart are mutual; the isolated point is not") {
    val vs = Seq(
      1L -> Seq(0f, 0f), 2L -> Seq(0.1f, 0f),      // pair A
      3L -> Seq(10f, 10f), 4L -> Seq(10.1f, 10f),  // pair B
      5L -> Seq(100f, 100f))                       // isolated
    assert(run(vs, k = 1) == Set((1L, 2L), (3L, 4L)))
  }

  test("hubness asymmetry is filtered: a chain's ends are not mutual at k=1") {
    // 1 --- 2 - 3: 2's nearest is 3, 3's nearest is 2; 1's nearest is 2
    // but 2 does not reciprocate -> only (2,3) survives
    val vs = Seq(1L -> Seq(0f), 2L -> Seq(10f), 3L -> Seq(11f))
    assert(run(vs, k = 1) == Set((2L, 3L)))
  }

  test("a zero-distance duplicate does not eject other true neighbors") {
    // 1 and 2 are identical; 3 sits close by. At k=2 every pair is mutual.
    val vs = Seq(1L -> Seq(0f, 0f), 2L -> Seq(0f, 0f), 3L -> Seq(1f, 0f))
    assert(run(vs, k = 2) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("matches the naive double-rank reference on a seeded random pool") {
    val rnd = new scala.util.Random(31)
    val vs = (0L until 60L).map(i => i -> Seq.fill(8)(rnd.nextFloat()))
    assert(run(vs, k = 3) == naive(vs, k = 3))
    assert(run(vs, k = 5) == naive(vs, k = 5))
  }

  test("reported distance is the symmetric pair distance") {
    import spark.implicits._
    val vs = Seq(1L -> Seq(0f, 0f), 2L -> Seq(3f, 4f))
    val r = Knn.mutualKnn(vs.toDF("vec_id", "embedding"), k = 1).head()
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    assert(math.abs(r.getDouble(2) - 25.0) < 1e-9) // squared L2
  }
}
