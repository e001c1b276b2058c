package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE merge learning vs an independent in-memory reference
  * implementation of CLASSIC BPE (Sennrich ACL'16: count DESC, pair
  * ASC argmax; merge application as a left-to-right token-array scan
  * that resumes after each consumed pair — the semantics of the
  * original lookaround-regex substitution), plus the adjacent-repeat
  * edge (`a a a a` → `aa aa`) and partition invariance. The naive
  * reference deliberately shares NO string-rewrite machinery with the
  * operator, so it independently pins the double-space `replace`
  * convention to classic merge-compatibility. */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Classic non-overlapping merge: scan left to right, consume the
    * pair, resume AFTER it (Sennrich's `(?<!\S)a b(?!\S)` re.sub). */
  private def mergePass(t: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < t.length) {
      if (i + 1 < t.length && t(i) == a && t(i + 1) == b) { out += (a + b); i += 2 }
      else { out += t(i); i += 1 }
    }
    out.toArray
  }

  /** Naive single-machine classic BPE over token arrays. */
  private def naive(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Seq[String], Long] = texts
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .map(w => w.toCharArray.map(_.toString).toSeq :+ "</w>")
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var stop = false
    while (step <= n && !stop) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((t, c) <- vocab; i <- 0 until t.length - 1) pc((t(i), t(i + 1))) += c
      if (pc.isEmpty) stop = true
      else {
        val ((a, b), s) = pc.toSeq.sortBy { case ((x, y), v) => (-v, x, y) }.head
        out += ((step, a, b, s))
        vocab = vocab.toSeq
          .map { case (t, c) => mergePass(t.toArray, a, b).toSeq -> c }
          .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
        step += 1
      }
    }
    out.toSeq
  }

  private def learned(texts: Seq[String], n: Int, parts: Int = 4) = {
    import spark.implicits._
    Bpe.learn(texts.toDF("text").repartition(parts), col("text"), n)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
  }

  test("matches the naive reference on the Sennrich-style corpus, all 10 merges") {
    val texts = Seq(
      "low low low low low lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest")
    assert(learned(texts, 10) == naive(texts, 10))
  }

  test("repeated characters merge left-to-right non-overlapping (the greedy BPE order)") {
    val texts = Seq("aaaa aaaa aa")
    val got = learned(texts, 4)
    assert(got == naive(texts, 4), s"repeated-char merge order diverged: $got")
    // first merge must be (a, a) and count pairs non-overlapping after rewrite
    assert(got.head._2 == "a" && got.head._3 == "a")
  }

  test("adjacent repeats apply like classic BPE: a a a a -> aa aa, not aa a a") {
    import spark.implicits._
    val m = Seq(Bpe.Merge(1, "a", "a", 7L))
    val toks = Bpe.encode(Seq("aaaa").toDF("text"), col("text"), m)
      .collect().map(_.getString(0)).toSeq
    assert(toks == Seq("aa", "aa", "</w>"), s"got $toks")
    // odd run: trailing singleton survives (scan resumes after each pair)
    val t5 = Bpe.encode(Seq("aaaaa").toDF("text"), col("text"), m)
      .collect().map(_.getString(0)).toSeq
    assert(t5 == Seq("aa", "aa", "a", "</w>"), s"got $t5")
  }

  test("stops early when the vocabulary is fully merged") {
    val texts = Seq("ab ab")
    val got = learned(texts, 50)
    assert(got == naive(texts, 50))
    assert(got.size < 50, "a 2-char vocab cannot support 50 merges")
  }

  test("encode applies merges to unseen words and reassembles losslessly") {
    import spark.implicits._
    val train = Seq("low low low lower newest newest newest widest")
    val merges = Bpe.learnMerges(
      Bpe.vocabCensus(train.toDF("text"), col("text")), nMerges = 6)
    assert(merges.nonEmpty)
    // an UNSEEN word must encode through the learned merges map-only
    val toks = Bpe.encode(Seq("lowest").toDF("text"), col("text"), merges)
      .collect().map(_.getString(0)).toSeq
    // lossless: concatenating sub-words reproduces word + marker
    assert(toks.mkString == "lowest</w>", s"reassembly broke: $toks")
    assert(toks.length > 1 && toks.length < 7,
      s"merges must have fused some characters of an unseen word: $toks")
    // train-state equivalence: encoding a training word yields the
    // same sub-words as the trainer's final vocabulary row
    val trained = Bpe.applyMerges(Bpe.spacedForm(lit("newest")), merges)
    val direct = spark.range(1).select(trained.as("w")).head().getString(0)
      .split("  ").filter(_.nonEmpty).mkString(" ")
    val viaEncode = Bpe.encode(Seq("newest").toDF("text"), col("text"), merges)
      .collect().map(_.getString(0)).mkString(" ")
    assert(direct == viaEncode, s"encode '$viaEncode' != trained state '$direct'")
  }

  test("merge table is partition-invariant on fixture text") {
    import spark.implicits._
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").as[String].collect().toSeq
    assert(learned(texts, 6, parts = 1) == learned(texts, 6, parts = 16))
    assert(learned(texts, 6, parts = 1) == naive(texts, 6))
  }
}
