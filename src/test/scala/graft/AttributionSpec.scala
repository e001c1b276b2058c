package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Attribution

/** Last-touch attribution: hand-checked credit assignment, the
  * no-prior-touch "none" bucket, conversions-don't-credit-conversions,
  * and decimal-exact value sums. */
class AttributionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(rows: Seq[(Long, Long, Long, String, Double)])
      : Map[String, (Long, Double)] = {
    import spark.implicits._
    val df = rows.toDF("user_id", "tsn", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("tsn")))
    Attribution.lastTouch(df, col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"), convType = "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  test("hand case: credit goes to the most recent prior non-purchase touch") {
    val rows = Seq(
      (1L, 10L, 1L, "view", 0.0),
      (1L, 20L, 2L, "click", 0.0),
      (1L, 30L, 3L, "purchase", 5.0),   // credits click
      (1L, 40L, 4L, "purchase", 7.0),   // still click: purchases never credit purchases
      (2L, 10L, 5L, "purchase", 3.0),   // no prior touch -> none
      (2L, 20L, 6L, "signup", 0.0),
      (2L, 30L, 7L, "purchase", 2.5))   // credits signup
    assert(run(rows) == Map(
      "click" -> ((2L, 12.0)),
      "none" -> ((1L, 3.0)),
      "signup" -> ((1L, 2.5))))
  }

  test("same-timestamp events resolve by the id tiebreak") {
    val rows = Seq(
      (1L, 10L, 1L, "view", 0.0),
      (1L, 10L, 2L, "click", 0.0),      // same micro, higher id: the last touch
      (1L, 20L, 3L, "purchase", 1.0))
    assert(run(rows) == Map("click" -> ((1L, 1.0))))
  }

  test("touches never cross users") {
    val rows = Seq(
      (1L, 10L, 1L, "click", 0.0),
      (2L, 20L, 2L, "purchase", 9.0))   // user 2 has no touch of its own
    assert(run(rows) == Map("none" -> ((1L, 9.0))))
  }

  private def paths(rows: Seq[(Long, Long, Long, String)], k: Int): Seq[(String, Long)] = {
    import spark.implicits._
    val df = rows.toDF("user_id", "tsn", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("tsn")))
    Attribution.topPaths(df, col("user_id"), col("ts"), col("event_id"),
        col("event_type"), k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("topPaths: consecutive triples, never crossing users, short sequences drop") {
    val rows = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"), (1L, 40L, 4L, "d"),
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b"), (2L, 30L, 7L, "c"),
      (3L, 10L, 8L, "x"), (3L, 20L, 9L, "y")) // length-2: no triple
    assert(paths(rows, k = 10) == Seq(("a>b>c", 2L), ("b>c>d", 1L)))
  }

  test("topPaths: k bounds the output and ties break on the path string") {
    val rows = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "a"), (1L, 40L, 4L, "b"),
      (2L, 10L, 5L, "b"), (2L, 20L, 6L, "b"), (2L, 30L, 7L, "b"))
    // triples: a>a>a, a>a>b (user 1), b>b>b (user 2) — all count 1
    assert(paths(rows, k = 2) == Seq(("a>a>a", 1L), ("a>a>b", 1L)))
  }

  test("value sums are decimal-exact (no float accumulation drift)") {
    // 0.1 added 100 times is exactly 10.0 in decimal, not 9.99999...
    val rows = (1L to 100L).flatMap(i => Seq(
      (i, 10L, i * 2, "view", 0.0),
      (i, 20L, i * 2 + 1, "purchase", 0.1)))
    assert(run(rows) == Map("view" -> ((100L, 10.0))))
  }
}
