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
