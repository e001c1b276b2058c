package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Canonical-selection policy: highest quality wins, ties break to
  * the lowest id, singletons keep themselves, and a 0.0-quality
  * winner emits plain 0.0 (no −0.0 via the internal negation). */
class CanonicalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("argmax by (quality desc, id asc) per cluster; singleton passthrough") {
    import spark.implicits._
    val members = Seq(
      (10L, 1L, 0.5), (10L, 2L, 0.9), (10L, 3L, 0.9), // tie at 0.9 -> id 2
      (20L, 4L, 0.1),                                 // singleton
      (30L, 5L, 0.0), (30L, 6L, 0.0))                 // all-zero cluster -> id 5
      .toDF("comp", "id", "q")
    val got = Dedup.canonicalByQuality(members)
      .orderBy("component").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == Seq((10L, 2L, 0.9, 3L), (20L, 4L, 0.1, 1L), (30L, 5L, 0.0, 2L)))
    // the 0.0 winner must be +0.0, not the internal negation's -0.0
    val z = got.find(_._1 == 30L).get._3
    assert(java.lang.Double.doubleToRawLongBits(z) == 0L, s"got -0.0: $z")
  }
}
