package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Segment-level exact dedup (Lee et al. ACL'22 shape): the keep rule
  * must preserve exactly one canonical copy of every duplicated
  * segment, pass unique corpora through byte-identical, and be
  * independent of physical partitioning. */
class SegmentDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("a corpus with no repeated segments is the identity") {
    import spark.implicits._
    val unique = (0 until 6).map(i =>
      (i.toLong, (0 until 20).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(unique, segTokens = 8)
      .orderBy("doc_id").collect()
    val want = unique.orderBy("doc_id").collect()
    out.zip(want).foreach { case (o, w) =>
      assert(o.getInt(2) == 0, "n_dup must be 0 on a unique corpus")
      assert(o.getInt(1) == o.getInt(3), "every segment must be kept")
      assert(o.getString(4) == w.getString(1), "clean_text must equal text")
    }
  }

  test("an aligned duplicated passage survives only in its first occurrence") {
    import spark.implicits._
    val seg = "a b c d e f g h" // exactly one 8-token segment
    val two = Seq(
      (1L, s"$seg x1 y1"),
      (2L, s"$seg x2 y2")).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(two, segTokens = 8)
      .orderBy("doc_id").collect()
    // doc 1 holds the canonical copy: everything kept
    assert(got(0).getInt(1) == 2 && got(0).getInt(2) == 1 && got(0).getInt(3) == 2)
    assert(got(0).getString(4) == s"$seg x1 y1")
    // doc 2's copy is removed, its unique tail survives in order
    assert(got(1).getInt(1) == 2 && got(1).getInt(2) == 1 && got(1).getInt(3) == 1)
    assert(got(1).getString(4) == "x2 y2")
  }

  test("fixture conservation: removed occurrences = occurrences - distinct segments") {
    val stats = Dedup.segmentDedup(docs, segTokens = 8)
      .agg(sum("n_segs").cast("long").as("total"),
        sum("n_kept").cast("long").as("kept"))
      .head()
    // re-derive the segmentation independently
    val segs = docs.filter(length(col("text")) > 0)
      .select(split(col("text"), " ").as("t"))
      .select(explode(transform(
        sequence(lit(0), ceil(size(col("t")).cast("double") / 8).cast("int") - 1),
        i => array_join(slice(col("t"), i * 8 + 1, lit(8)), " "))).as("seg"))
    val total = segs.count()
    val distinct = segs.distinct().count()
    assert(stats.getLong(0) == total)
    assert(stats.getLong(0) - stats.getLong(1) == total - distinct,
      "every duplicate group must lose exactly n_occ - 1 occurrences")
    assert(total > distinct, "fixture must actually contain duplicated segments")
  }

  test("result is invariant to physical partitioning") {
    def run(parts: Int) = Dedup.segmentDedup(docs.repartition(parts), segTokens = 8)
      .orderBy("doc_id").collect().toSeq
    assert(run(1) == run(32))
  }
}
