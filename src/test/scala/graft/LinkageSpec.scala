package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Linkage

/** Blocked fuzzy linkage: matches form only inside blocks, the edit
  * distance threshold is inclusive and exact, pair order is canonical,
  * and unblocked (all-pairs) use is rejected loudly. */
class LinkageSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def pairs(rows: Seq[(Long, String, String)], maxDist: Int)
      : Set[(Long, Long, Int)] = {
    import spark.implicits._
    Linkage.fuzzyPairs(rows.toDF("id", "name", "blk"),
        col("id"), col("name"), Seq(col("blk")), maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("matches form only within a block; distance is exact and inclusive") {
    val rows = Seq(
      (1L, "alpha corp", "b1"),
      (2L, "alpha corp.", "b1"),   // d=1 from id 1
      (3L, "alpha corpse", "b1"),  // d=2 from id 1, d=2 from id 2 (e->s, +e)
      (4L, "zzzz totally other", "b1"),
      (5L, "alpha corp", "b2"))    // identical to id 1 but blocked apart
    assert(pairs(rows, maxDist = 1) == Set((1L, 2L, 1)),
      "only the d<=1 in-block pair may survive; the cross-block twin must not")
    val atTwo = pairs(rows, maxDist = 2)
    assert(atTwo.contains((1L, 2L, 1)) && atTwo.contains((1L, 3L, 2)),
      s"the threshold is inclusive: $atTwo")
    assert(atTwo.forall { case (a, b, _) => a < b }, "pairs are canonical a < b")
    assert(!atTwo.exists(p => p._1 == 4L || p._2 == 4L),
      "a distant in-block record must be rejected by the distance, not the block")
  }

  test("zero threshold finds exact in-block twins only") {
    val rows = Seq((1L, "same", "b"), (2L, "same", "b"), (3L, "sane", "b"))
    assert(pairs(rows, maxDist = 0) == Set((1L, 2L, 0)))
  }

  test("unblocked linkage is rejected loudly") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Linkage.fuzzyPairs(Seq((1L, "x", "b")).toDF("id", "name", "blk"),
        col("id"), col("name"), Seq.empty, maxDist = 1)
    }
  }

  test("distanceLocal (the point arm) ≡ Spark's thresholded levenshtein column") {
    import spark.implicits._
    val words = Seq("", "a", "ab", "abc", "abd", "kitten", "sitting",
      "héllo", "hello", "日本語", "日本", "xxxxxxxxxx")
    val grid = for (a <- words; b <- words) yield (a, b)
    for (maxDist <- Seq(0, 1, 2, 3)) {
      val colArm = grid.toDF("a", "b")
        .select(col("a"), col("b"), levenshtein(col("a"), col("b"), maxDist).as("d"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
      grid.foreach { case (a, b) =>
        val local = Linkage.distanceLocal(a, b, maxDist)
        assert(local == colArm((a, b)),
          s"point arm diverged on ('$a','$b',$maxDist): local $local vs column ${colArm((a, b))}")
      }
    }
  }

  test("distanceLocal: the length lower bound short-circuits to -1") {
    assert(Linkage.distanceLocal("a", "abcdef", 2) == -1)
    assert(Linkage.distanceLocal("abcdef", "a", 2) == -1)
    assert(Linkage.distanceLocal("", "abc", 3) == 3) // boundary: equal to maxDist
  }
}
