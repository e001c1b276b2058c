package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Containment join semantics: a short document quoted whole inside a
  * long one is caught (C = 1.0) where symmetric Jaccard misses it;
  * direction matters; unrelated docs stay apart; and the prefix
  * blocking is lossless vs a naive all-pairs computation. */
class ContainmentSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val short = "alpha beta gamma delta epsilon zeta eta theta"
  private val long = short + " " + (1 to 40).map(i => s"filler$i").mkString(" ")

  test("quote inclusion: containment fires where Jaccard cannot") {
    import spark.implicits._
    val docs = Seq((1L, short), (2L, long),
      (3L, "totally different words nothing shared here at all"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentJoin(docs, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // directed: short-inside-long only
    assert(cont == Seq((1L, 2L, 1.0)), s"got $cont")
    val jac = Dedup.jaccardJoin(docs, tau = 0.9)
      .collect()
    assert(jac.isEmpty, s"symmetric Jaccard must miss the inclusion: ${jac.toSeq}")
  }

  test("prefix blocking is lossless vs all-pairs on fixture text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Dedup.containmentJoin(docs, tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 1e4) / 1e4)).toSet
    // naive truth: all-pairs over the same distinct shingle arrays
    val sh = docs.select(col("doc_id"),
        Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val truth = sh.as("a").join(sh.as("b"),
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(col("a.sh")).cast("double")).as("c"))
      .filter(col("c") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 1e4) / 1e4)).toSet
    assert(got == truth,
      s"blocking lost/invented pairs: missing=${truth -- got} extra=${got -- truth}")
    assert(truth.nonEmpty, "fixture must contain containment pairs")
  }
}
