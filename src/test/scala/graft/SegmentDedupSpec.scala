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

  // ---- CDC-anchored variant ------------------------------------------

  /** Deterministic pseudo-random word stream (LCG) — varied enough for
    * the rolling hash to cut roughly every `modulus` chars. */
  private def words(seed: Long, n: Int): String = {
    var s = seed
    (0 until n).map { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      val x = (s >>> 33).toInt.abs
      s"w${x % 99991}"
    }.mkString(" ")
  }

  test("planted offset-7 duplicate: fixed segments provably miss it, CDC chunks catch it") {
    import spark.implicits._
    val passage = words(42L, 120) // ~600 chars of shared passage
    // doc 1 carries the passage after an 8-token prefix (aligned to the
    // 8-token grid); doc 2 after a 7-token prefix — every fixed 8-token
    // segment of doc 2's copy straddles the shift, the exact evasion
    // class of the documented Lee et al. deviation
    val two = Seq(
      (1L, words(7L, 8) + " " + passage + " " + words(8L, 8)),
      (2L, words(9L, 7) + " " + passage + " " + words(10L, 8)))
      .toDF("doc_id", "text")
    val fixedDup = Dedup.segmentDedup(two, segTokens = 8)
      .agg(sum("n_dup")).head().getLong(0)
    assert(fixedDup == 0L,
      s"fixture broken: fixed segmentation was supposed to miss the offset-7 copy, found $fixedDup")
    val cdc = Dedup.cdcSegmentDedup(two)
      .orderBy("doc_id").collect()
    assert(cdc.map(_.getInt(2)).sum >= 2,
      s"CDC chunking must re-synchronize inside the shared passage: ${cdc.mkString(";")}")
    // the canonical first copy keeps everything; the second copy loses
    // its interior duplicated chunks but keeps its unique fringe
    assert(cdc(0).getInt(3) == cdc(0).getInt(1), "doc 1 must keep all chunks")
    assert(cdc(1).getInt(3) < cdc(1).getInt(1), "doc 2 must lose duplicated chunks")
  }

  test("CDC variant: unique corpus is the identity; clean_text reassembles exactly") {
    import spark.implicits._
    val unique = (0 until 5).map(i => (i.toLong, words(100L + i, 60)))
      .toDF("doc_id", "text")
    val out = Dedup.cdcSegmentDedup(unique).orderBy("doc_id").collect()
    val want = unique.orderBy("doc_id").collect()
    out.zip(want).foreach { case (o, w) =>
      assert(o.getInt(2) == 0, "n_dup must be 0 on a unique corpus")
      assert(o.getInt(1) == o.getInt(3), "every chunk must be kept")
      assert(o.getString(4) == w.getString(1),
        "empty-separator reassembly of all chunks must equal the original text")
    }
  }

  test("CDC variant: exact full-document duplicate loses every chunk in the copy") {
    import spark.implicits._
    val t = words(55L, 80)
    val two = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val got = Dedup.cdcSegmentDedup(two).orderBy("doc_id").collect()
    assert(got(0).getString(4) == t, "canonical copy must survive whole")
    assert(got(1).getInt(3) == 0 && got(1).getString(4) == null,
      "the duplicate copy must lose every chunk")
  }

  test("CDC variant: result is invariant to physical partitioning") {
    def run(parts: Int) = Dedup.cdcSegmentDedup(docs.repartition(parts))
      .orderBy("doc_id").collect().toSeq
    assert(run(1) == run(32))
  }
}
