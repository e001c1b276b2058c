package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Equivalence of the two connected-components algorithms: min-label
  * propagation (diameter-bound rounds) and large-star/small-star
  * contraction (log²-bound rounds). Both must emit the identical
  * (id, min-reachable-id) map on every graph shape. */
class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def pairs(es: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    es.toDF("a", "b")
  }

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def check(es: Seq[(Long, Long)]): Unit = {
    val p = pairs(es)
    val prop = asMap(Dedup.connectedComponents(p))
    val star = asMap(Dedup.connectedComponentsStar(p))
    assert(star == prop, s"star vs propagation disagree on $es")
  }

  test("chain graph (worst case for diameter-bound propagation)") {
    check((0L until 19L).map(i => (i, i + 1)))
  }

  test("star graph rooted at a non-minimal id") {
    check(Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 7L)))
  }

  test("two components with interleaved ids") {
    check(Seq((1L, 5L), (5L, 9L), (2L, 4L), (4L, 8L), (8L, 6L)))
  }

  test("seeded random graph") {
    val rnd = new scala.util.Random(42)
    val es = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    check(es)
  }

  test("star converges in few rounds on a long chain") {
    // diameter 200 would need 200 propagation rounds; the contraction
    // must finish well under its default 25-round budget
    val es = (0L until 200L).map(i => (i, i + 1))
    val labels = asMap(Dedup.connectedComponentsStar(pairs(es)))
    assert(labels.size == 201 && labels.values.forall(_ == 0L))
  }
}
