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

  test("snapshotDiff classifies added/removed/changed and drops the unchanged mass") {
    import spark.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "score")
    val neu = Seq((1L, "a", 10.0), (2L, "b", 21.0), (4L, "d", 40.0))
      .toDF("id", "name", "score")
    val got = Cdc.snapshotDiff(old, neu, Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("snapshotDiff payload compare is null-safe: NULL<->value is changed, NULL==NULL is unchanged") {
    import spark.implicits._
    val old = Seq((1L, Option("a")), (2L, Option.empty[String]), (3L, Option("c")))
      .toDF("id", "name")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Option("c")))
      .toDF("id", "name")
    val got = Cdc.snapshotDiff(old, neu, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "changed"))) // 2: NULL==NULL, 3: identical
  }

  test("snapshotDiff round-trips applyChanges: diff(base, merge(base, feed)) = net feed") {
    import spark.implicits._
    val changes = Seq(
      (2L, "B2", 22.0, "U", 1),  // changed
      (5L, "e", 50.0, "U", 1),   // added
      (3L, "x", 0.0, "D", 1),    // removed
      (4L, "d", 40.0, "U", 1))   // upsert to identical payload: NOT in the diff
      .toDF("id", "name", "score", "op", "seq")
    val got = Cdc.snapshotDiff(base, Cdc.applyChanges(base, changes, "id"), Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "changed"), (3L, "removed"), (5L, "added")))
  }

  test("snapshotDiff rejects schema mismatch and missing keys") {
    import spark.implicits._
    val old = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(old, Seq((1L, 2.0)).toDF("id", "score"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(old, old, Seq("missing"))
    }
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(old, old, Seq.empty)
    }
  }
}
