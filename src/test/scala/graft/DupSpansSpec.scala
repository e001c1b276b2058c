package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Duplicated-span census (sliding-window ExactSubstr shape): shifted
  * copies are caught at any alignment, interval union counts covered
  * tokens exactly, unique corpora report zeros, and the census is
  * partition-invariant. */
class DupSpansSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(texts: Seq[String], L: Int = 8) = {
    import spark.implicits._
    Dedup.dupSpans(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), winTokens = L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
  }

  test("a shifted copied passage is caught at any alignment") {
    // doc1 embeds doc0's 10-token passage at offset 3 — fixed 8-token
    // segments would split it differently in each doc, but every
    // 8-token sliding window of the passage matches
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    val texts = Seq(
      s"$passage u1 u2 u3 u4 u5",
      s"v1 v2 v3 $passage w1 w2")
    val r = run(texts)
    // a 10-token shared passage has 3 shared 8-token windows; their
    // union covers exactly the 10 passage tokens in each doc
    assert(r(0L) == ((15L, 3L, 10L)), s"doc0: ${r(0L)}")
    assert(r(1L) == ((15L, 3L, 10L)), s"doc1: ${r(1L)}")
  }

  test("a unique corpus reports zeros for every doc") {
    val texts = Seq(
      (1 to 20).map(i => s"a$i").mkString(" "),
      (1 to 20).map(i => s"b$i").mkString(" "))
    val r = run(texts)
    assert(r(0L) == ((20L, 0L, 0L)) && r(1L) == ((20L, 0L, 0L)), s"$r")
  }

  test("self-repetition inside one document is duplication") {
    // the same 8 tokens twice in one doc -> both windows duplicated
    val block = (1 to 8).map(i => s"x$i").mkString(" ")
    val r = run(Seq(s"$block $block"))
    assert(r(0L)._2 >= 2 && r(0L)._3 == 16L,
      s"self-repeated block must cover all 16 tokens: ${r(0L)}")
  }

  test("disjoint duplicated spans in one doc sum their union lengths") {
    val b1 = (1 to 8).map(i => s"m$i").mkString(" ")
    val b2 = (1 to 8).map(i => s"n$i").mkString(" ")
    val gap = (1 to 5).map(i => s"g$i").mkString(" ")
    // doc0 carries both blocks separated by unique filler; docs 1 and 2
    // each share one block
    val r = run(Seq(s"$b1 $gap $b2", b1, b2))
    assert(r(0L) == ((21L, 2L, 16L)), s"two disjoint 8-token spans: ${r(0L)}")
  }

  test("census is partition-invariant") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def at(parts: Int) = Dedup.dupSpans(docs.repartition(parts), winTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(at(1) == at(16))
  }
}
