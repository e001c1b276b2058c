package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("range join: bin decomposition equals the naive inequality join, boundaries exact") {
    import spark.implicits._
    import graft.operators.RangeJoin
    val W = 100L
    // boundary battery around one left row at ts=250 (window [150, 250)):
    // 150 in (closed lower bound), 249 in, 250 out (exclusive upper),
    // 149 out, plus rows in OTHER keys that must never leak, and a
    // left row with zero matches that must still appear with n = 0
    val left = Seq((1L, 10L, 250L), (1L, 11L, 90L), (2L, 12L, 250L))
      .toDF("k", "lid", "ts")
    val right = Seq((1L, 150L), (1L, 249L), (1L, 250L), (1L, 149L),
      (2L, 155L), (2L, 99L)).toDF("k", "ts")
    val got = RangeJoin.countInWindow(left, right, key = "k", leftId = "lid",
        leftTs = "ts", rightTs = "ts", windowMicros = W)
      .orderBy("lid").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((10L, 2L), (11L, 0L), (12L, 1L)), got.toSeq.toString)
    // randomized equivalence vs the naive inequality join
    val l2 = spark.range(200).select((col("id") % 5).as("k"), col("id").as("lid"),
      (pmod(col("id") * 7919, lit(1000))).as("ts"))
    val r2 = spark.range(500).select((col("id") % 5).as("k"),
      (pmod(col("id") * 104729, lit(1000))).as("ts"))
    val binned = RangeJoin.countInWindow(l2, r2, "k", "lid", "ts", "ts", W)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val naive = l2.alias("l").join(r2.alias("r"),
        col("l.k") === col("r.k") &&
          col("r.ts") >= col("l.ts") - W && col("r.ts") < col("l.ts"), "left")
      .groupBy(col("l.lid")).agg(count(col("r.ts")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(binned == naive, s"bin decomposition diverged from the naive join")
  }

  test("salted join returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val big = spark.range(10000)
      .select((when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(99L))).as("k"),
        col("id").as("payload"))
    val small = Seq((99L, "hot"), (1L, "cold"), (3L, "cold3")).toDF("k", "tag")
    val plain = big.join(small, "k").select("k", "payload", "tag")
    val salted = SkewJoin.salted(big, small, "k", salt = 8).select("k", "payload", "tag")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }
}
