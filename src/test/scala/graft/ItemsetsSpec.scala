package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Itemsets

/** A-Priori frequent pairs: hand-counted support on a tiny basket set,
  * the pruning rule (a pair of an infrequent item can never surface,
  * even if the PAIR's own count clears the threshold), multiplicity
  * immunity, and equality with the naive all-pairs count. */
class ItemsetsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def pairs(rows: Seq[(Long, Long)], itemMin: Long, pairMin: Long)
      : Map[(Long, Long), Long] = {
    import spark.implicits._
    Itemsets.frequentPairs(rows.toDF("basket", "item"), "basket", "item",
        itemMin, pairMin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("hand count: pair support is the number of witnessing baskets") {
    // baskets: {1,2,3}, {1,2}, {1,2,4}, {3,4}
    val rows = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L), (30L, 4L),
      (40L, 3L), (40L, 4L))
    val got = pairs(rows, itemMin = 1, pairMin = 2)
    assert(got == Map((1L, 2L) -> 3L),
      s"only (1,2) appears in >= 2 baskets: $got")
  }

  test("a-priori pruning: an infrequent item suppresses its pairs " +
      "even when the pair count itself clears pairMin") {
    // item 9 appears twice (both times with 1) but itemMin=3 prunes it
    val rows = Seq(
      (1L, 1L), (1L, 9L),
      (2L, 1L), (2L, 9L),
      (3L, 1L), (4L, 1L))
    assert(pairs(rows, itemMin = 3, pairMin = 2).isEmpty)
    // with itemMin=2 the same data surfaces the pair
    assert(pairs(rows, itemMin = 2, pairMin = 2) == Map((1L, 9L) -> 2L))
  }

  test("in-basket multiplicity does not inflate support") {
    val rows = Seq(
      (1L, 5L), (1L, 5L), (1L, 5L), (1L, 6L), (1L, 6L),
      (2L, 5L), (2L, 6L))
    assert(pairs(rows, itemMin = 1, pairMin = 2) == Map((5L, 6L) -> 2L))
  }

  test("matches the naive all-pairs count on a seeded random basket set") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(15).toLong))
    val naive = rows.distinct.groupBy(_._1).values
      .flatMap { b =>
        val items = b.map(_._2).sorted
        for (i <- items.indices; j <- i + 1 until items.size)
          yield (items(i), items(j))
      }
      .groupBy(identity).map { case (p, w) => p -> w.size.toLong }
      .filter(_._2 >= 2)
    // itemMin=1: pruning off, so the engine must equal the naive count
    assert(pairs(rows, itemMin = 1, pairMin = 2) == naive)
  }
}
