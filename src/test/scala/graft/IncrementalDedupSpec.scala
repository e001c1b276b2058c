package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MinHash

/** Incremental (batch-vs-corpus) LSH dedup: finds batch→corpus
  * near-dups, never corpus-internal pairs, and agrees exactly with the
  * self-join arm's cross-partition subset (identical band keys ⇒
  * identical candidate generation ⇒ identical verified output). */
class IncrementalDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val a = "the quick brown fox jumps over the lazy dog again and again today"

  test("batch doc finds its corpus near-dup; corpus-internal dups are NOT emitted") {
    import spark.implicits._
    val batch = Seq((10L, a)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, a + " extra"),                       // near-dup of the batch doc
      (2L, a + " extra"),                       // corpus-internal dup pair (1,2)
      (3L, "completely unrelated words about nothing shared with anything else ever"))
      .toDF("doc_id", "text")
    val got = MinHash.lshDedupIncremental(batch, corpus, tau = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L), (10L, 2L)), s"got $got")
  }

  test("every emitted pair is truly >= tau (soundness on the fixture)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val got = MinHash.lshDedupIncremental(batch, corpus, tau = 0.7).collect()
    assert(got.nonEmpty, "fixture must contain cross-partition near-dups")
    got.foreach(r => assert(r.getDouble(2) >= 0.7))
  }

  test("incremental == the self-join arm restricted to cross-partition pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val isBatch = (id: Long) => id % 10 == 0
    val full = MinHash.lshDedup(docs, tau = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (x, y, _) => isBatch(x) != isBatch(y) }
      .map { case (x, y, j) => if (isBatch(x)) (x, y, j) else (y, x, j) }
      .toSet
    val inc = MinHash.lshDedupIncremental(
      docs.filter(col("doc_id") % 10 === 0),
      docs.filter(col("doc_id") % 10 =!= 0), tau = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc == full,
      s"arms disagree: missing=${full -- inc} extra=${inc -- full}")
  }
}
