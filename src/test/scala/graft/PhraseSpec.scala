package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Phrase

/** Positional phrase search: consecutive-token matches only, 0-based
  * starts, overlapping matches, repeated-term phrases (the ballot/slot
  * subtlety), and the per-doc census. */
class PhraseSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(texts: Seq[(Long, String)], phrase: Seq[String]) = {
    import spark.implicits._
    Phrase.phraseMatches(texts.toDF("doc_id", "text"), phrase)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
  }

  test("finds consecutive occurrences only, at 0-based starts") {
    val got = run(Seq(
      (1L, "a b c a b"),      // "a b" at 0 and 3
      (2L, "a c b"),          // a and b present but not adjacent
      (3L, "b a")),           // wrong order
      Seq("a", "b"))
    assert(got == Set((1L, 0), (1L, 3)))
  }

  test("repeated-term phrase: one occurrence may fill several slots, all slots required") {
    // "a a" in "a a a": starts 0 and 1 (overlapping)
    assert(run(Seq((1L, "a a a")), Seq("a", "a")) == Set((1L, 0), (1L, 1)))
    // "a b a": the middle token differs, no "a a"
    assert(run(Seq((2L, "a b a")), Seq("a", "a")).isEmpty)
  }

  test("three-token phrase and boundary: no match past the end of the doc") {
    val got = run(Seq((1L, "x y z"), (2L, "x y"), (3L, "w x y z w")),
      Seq("x", "y", "z"))
    assert(got == Set((1L, 0), (3L, 1)))
  }

  test("census aggregates matches per doc") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a b"), (2L, "a b"), (3L, "c d"))
      .toDF("doc_id", "text")
    val got = Phrase.phraseCensus(docs, Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 3L, 0), (2L, 1L, 0)))
  }

  test("agrees with a brute-force sliding window on the fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val phrase = Seq("table", "value")
    val got = Phrase.phraseMatches(docs, phrase)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val truth = docs.collect().flatMap { r =>
      val id = r.getAs[Long]("doc_id")
      val tk = r.getAs[String]("text").split("\\s+")
      tk.indices.dropRight(phrase.length - 1)
        .filter(i => phrase.indices.forall(j => tk(i + j) == phrase(j)))
        .map(i => (id, i))
    }.toSet
    assert(truth.nonEmpty, "fixture must contain the phrase")
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
  }
}
