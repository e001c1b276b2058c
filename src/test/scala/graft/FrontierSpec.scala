package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Frontier

/** Hamilton largest-remainder apportionment: exactness, determinism,
  * the clip contract, and the iterate-on-residual composition. */
class FrontierSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def hosts(rows: Seq[(String, Double, Long)]) = {
    import spark.implicits._
    rows.toDF("host", "rank", "cap")
  }

  private def run(rows: Seq[(String, Double, Long)], budget: Long): Map[String, (Long, Long)] =
    Frontier.apportion(hosts(rows), budget)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("sums to the budget exactly before clipping; largest remainders win; host asc breaks ties") {
    // masses 5:3:2 over budget 7 → exact shares 3.5/2.1/1.4, bases
    // 3/2/1, one leftover seat → largest remainder is a (0.5)
    val out = run(Seq(("a", 0.5, 100L), ("b", 0.3, 100L), ("c", 0.2, 100L)), 7)
    assert(out == Map("a" -> (4L, 4L), "b" -> (2L, 2L), "c" -> (1L, 1L)))
    assert(out.values.map(_._1).sum == 7)
    // equal masses, budget not divisible: remainders tie, host asc
    // takes the seats deterministically
    val tie = run(Seq(("d", 0.25, 9L), ("c", 0.25, 9L), ("b", 0.25, 9L), ("a", 0.25, 9L)), 6)
    assert(tie == Map("a" -> (2L, 2L), "b" -> (2L, 2L), "c" -> (1L, 1L), "d" -> (1L, 1L)))
  }

  test("clipping happens after the split and is not redistributed; iterating on the residual converges") {
    val rows = Seq(("a", 0.6, 2L), ("b", 0.3, 100L), ("c", 0.1, 100L))
    val r1 = run(rows, 10)
    assert(r1("a") == (6L, 2L) && r1("b") == (3L, 3L) && r1("c") == (1L, 1L))
    // round 2: residual budget = 10 - (2+3+1) = 4 over the unclipped
    // hosts with their remaining headroom
    val r2 = run(Seq(("b", 0.3, 97L), ("c", 0.1, 99L)), 4)
    assert(r2("b") == (3L, 3L) && r2("c") == (1L, 1L))
    assert(r1.values.map(_._2).sum + r2.values.map(_._1).sum == 10)
  }

  test("edges: zero budget, zero-rank host, rank floor exactness") {
    val z = run(Seq(("a", 0.9, 5L), ("b", 0.1, 5L)), 0)
    assert(z.values.forall(_ == (0L, 0L)))
    // a zero-rank host draws nothing proportional and only wins a
    // remainder seat if seats outnumber positive remainders
    val zr = run(Seq(("a", 1.0, 100L), ("z", 0.0, 100L)), 5)
    assert(zr == Map("a" -> (5L, 5L), "z" -> (0L, 0L)))
    // micro-unit floor: rank enters as floor(rank·1e12) — two ranks
    // equal at 12 decimals are THE SAME mass
    val eq = run(Seq(("a", 0.1000000000001, 10L), ("b", 0.1000000000001, 10L)), 3)
    assert(eq("a")._1 + eq("b")._1 == 3 && (eq("a")._1 - eq("b")._1).abs == 1)
  }

  test("trapCensus: boundary-exact cap, duplicate URLs count once, query-only fan-out flags") {
    import spark.implicits._
    val urls = (
      (1 to 3).map(i => s"http://h.example/cal?d=$i") ++  // 3 distinct > cap 2
      Seq("http://h.example/cal?d=1") ++                   // dup counts once
      (1 to 2).map(i => s"http://h.example/edge?p=$i") ++  // exactly cap: NOT flagged
      Seq("http://h.example/static.html", "http://other.example/cal?d=1")
    ).toDF("u")
    val got = Frontier.trapCensus(urls, col("u"), cap = 2L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("h.example", "/cal", 3L)), got.toString)
    intercept[IllegalArgumentException](
      Frontier.trapCensus(urls, col("u"), cap = 0L))
  }

  test("guards: negative budget, negative cap, zero total mass with positive budget all fail loudly") {
    intercept[IllegalArgumentException](Frontier.apportion(
      hosts(Seq(("a", 1.0, 1L))), -1))
    val negCap = intercept[Exception](
      Frontier.apportion(hosts(Seq(("a", 1.0, -1L))), 5).collect())
    assert(negCap.getMessage.contains("negative cap"))
    val zeroMass = intercept[Exception](
      Frontier.apportion(hosts(Seq(("a", 0.0, 1L))), 5).collect())
    assert(zeroMass.getMessage.contains("total rank mass is zero"))
  }
}
