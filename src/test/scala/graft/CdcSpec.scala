package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** MERGE/CDC-apply semantics: update, insert, delete, delete-absent
  * no-op, latest-change-wins, untouched passthrough, and the loud
  * duplicate-winner guard. */
class CdcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def base = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "name", "score")
  }

  test("upsert updates, upsert inserts, delete removes, absent delete no-ops") {
    import spark.implicits._
    val changes = Seq(
      (2L, "B2", 22.0, "U", 1), // update
      (5L, "e", 50.0, "U", 1),  // insert
      (3L, "x", 0.0, "D", 1),   // delete
      (9L, "x", 0.0, "D", 1))   // delete of an absent key: no-op
      .toDF("id", "name", "score", "op", "seq")
    val got = Cdc.applyChanges(base, changes, "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B2", 22.0),
      (4L, "d", 40.0), (5L, "e", 50.0)))
  }

  test("the latest change per key wins, including delete-then-upsert resurrection") {
    import spark.implicits._
    val changes = Seq(
      (1L, "x", 0.0, "D", 1), (1L, "A9", 99.0, "U", 2),  // resurrect
      (2L, "B1", 21.0, "U", 1), (2L, "x", 0.0, "D", 2))  // delete wins
      .toDF("id", "name", "score", "op", "seq")
    val got = Cdc.applyChanges(base, changes, "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "A9", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("a duplicated (key, seq) at the winning seq raises instead of picking arbitrarily") {
    import spark.implicits._
    val changes = Seq(
      (2L, "B1", 21.0, "U", 5), (2L, "B2", 22.0, "U", 5))
      .toDF("id", "name", "score", "op", "seq")
    val e = intercept[Exception] {
      Cdc.applyChanges(base, changes, "id").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("duplicate")), e.getMessage)
    // ...but a duplicate at a LOSING seq is legal (cannot affect the result)
    val ok = Seq((2L, "B1", 21.0, "U", 1), (2L, "B2", 22.0, "U", 1),
      (2L, "B9", 29.0, "U", 2)).toDF("id", "name", "score", "op", "seq")
    val got = Cdc.applyChanges(base, ok, "id")
      .filter(col("id") === 2L).head()
    assert(got.getString(1) == "B9" && got.getDouble(2) == 29.0)
  }

  test("base without a seq/op column collision is required") {
    import spark.implicits._
    val badBase = base.withColumn("op", lit("x"))
    val changes = Seq((1L, "a", 1.0, "U", 1)).toDF("id", "name", "score", "op", "seq")
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(badBase, changes, "id")
    }
  }
}
