package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, WordPiece}

/** WordPiece merge learning vs an independent in-memory model of the
  * likelihood-gain rule (Schuster-Nakajima: argmax cnt(ab)/(cnt(a)·
  * cnt(b)), selected here by its exact integer 1e-12 floor with
  * (score DESC, count DESC, pair ASC) ties) — plus the property the
  * trainer exists for: it picks a DIFFERENT merge than frequency-
  * greedy BPE when the commonest pair has promiscuous parts. */
class WordPieceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def mergePass(t: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < t.length) {
      if (i + 1 < t.length && t(i) == a && t(i + 1) == b) { out += (a + b); i += 2 }
      else { out += t(i); i += 1 }
    }
    out.toArray
  }

  /** Naive single-machine WordPiece with the exact integer score. */
  private def naive(texts: Seq[String], n: Int): Seq[(Int, String, String, Long, Long)] = {
    var vocab: Map[Seq[String], Long] = texts
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .map(w => w.toCharArray.map(_.toString).toSeq :+ "</w>")
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var step = 1
    var stop = false
    while (step <= n && !stop) {
      val sc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      val pc = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((t, c) <- vocab) {
        t.foreach(s => sc(s) += c)
        for (i <- 0 until t.length - 1) pc((t(i), t(i + 1))) += c
      }
      if (pc.isEmpty) stop = true
      else {
        val scored = pc.toSeq.map { case ((a, b), s) =>
          val su = (BigInt(s) * BigInt(1000000000000L) /
            (BigInt(sc(a)) * BigInt(sc(b)))).toLong
          (a, b, s, su)
        }
        val (a, b, s, su) = scored.sortBy { case (x, y, v, u) => (-u, -v, x, y) }.head
        out += ((step, a, b, s, su))
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
    WordPiece.learnMerges(
      Bpe.vocabCensus(texts.toDF("text").repartition(parts), col("text")), n)
      .map(m => (m.step, m.left, m.right, m.cnt, m.scoreUnits))
  }

  test("matches the naive likelihood-gain model, all merges, on a mixed corpus") {
    val texts = Seq(
      "low low low low low lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest")
    assert(learned(texts, 10) == naive(texts, 10))
  }

  test("diverges from frequency-greedy BPE when the commonest pair has promiscuous parts") {
    // 'e' is everywhere (promiscuous); the rare exclusive pair (q, z)
    // occurs together ONLY — WordPiece must take (q,z) first while
    // BPE takes the frequent e-pair
    val texts = Seq.fill(8)("erere").map(identity) ++ Seq("qz qz")
    val wp = learned(texts, 1).head
    import spark.implicits._
    val bpe = Bpe.learnMerges(
      Bpe.vocabCensus(texts.toDF("text"), col("text")), 1).head
    assert((wp._2, wp._3) == (("q", "z")), s"WordPiece must pick the exclusive pair: $wp")
    assert((bpe.left, bpe.right) != (("q", "z")),
      s"BPE must pick a frequent pair here, got (${bpe.left},${bpe.right})")
    assert(learned(texts, 3) == naive(texts, 3))
  }

  test("score units are the exact integer floor — hand value") {
    // corpus: "ab" x3 → symbols a:3, b:3, </w>:3; pairs (a,b):3, (b,</w>):3
    // score(a,b) = 3/(3·3) → floor(3e12/9) = 333333333333
    val got = learned(Seq("ab ab ab"), 1).head
    assert(got._4 == 3L && got._5 == 333333333333L, s"got $got")
  }

  test("encode presents continuations with ## and reassembles losslessly") {
    import spark.implicits._
    val merges = WordPiece.learnMerges(
      Bpe.vocabCensus(Seq("low low low lower newest newest").toDF("text"),
        col("text")), 6)
    val toks = WordPiece.encode(Seq("lowest").toDF("text"), col("text"), merges)
      .collect().map(_.getString(0)).toSeq
    assert(toks.head.startsWith("##") == false, "first piece is bare")
    assert(toks.tail.forall(_.startsWith("##")), s"continuations carry ##: $toks")
    assert(toks.head + toks.tail.map(_.drop(2)).mkString == "lowest</w>",
      s"reassembly broke: $toks")
  }

  test("decode inverts the ## presentation, including hostile marker words") {
    import spark.implicits._
    val merges = WordPiece.learnMerges(
      Bpe.vocabCensus(Seq("low low low lower newest newest").toDF("text"),
        col("text")), 6)
    val pairs = merges.map(m => (m.left, m.right))
    // words that probe every decode hazard: plain, unseen symbols, a
    // word STARTING with the continuation marker, a word ENDING with
    // the end-of-word marker, a lone marker character
    val words = Seq("low", "lowest", "zz", "##x", "a</w>", "#")
    words.foreach { w =>
      val pieces = WordPiece.encodeLocal(w, pairs)
      assert(WordPiece.decodeLocal(pieces) == w, s"local round-trip broke on '$w'")
    }
    // the column arm agrees with the local arm piece-for-piece
    val dfPieces = filter(
      split(WordPiece.applyMerges(Bpe.spacedForm(col("w")), merges), "  "),
      t => length(t) > 0)
    val presented = transform(dfPieces,
      (p, i) => when(i === 0, p).otherwise(concat(lit("##"), p)))
    val got = words.toDF("w")
      .select(col("w"), WordPiece.decode(presented).as("rt"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (w, rt) => assert(rt == w, s"column round-trip broke on '$w'") }
  }

  test("encodeLocal agrees with the distributed encode token-for-token") {
    import spark.implicits._
    val merges = WordPiece.learnMerges(
      Bpe.vocabCensus(Seq("low low low lower newest newest wide west").toDF("text"),
        col("text")), 8)
    val pairs = merges.map(m => (m.left, m.right))
    for (t <- Seq("lowest newest west zz", "low wider", "a", "")) {
      val dist = WordPiece.encode(Seq(t).toDF("text"), col("text"), merges)
        .collect().map(_.getString(0)).toSeq
      assert(WordPiece.encodeLocal(t, pairs) == dist, s"text '$t'")
    }
  }

  test("coverage-style fertility: merged words cost fewer sub-tokens") {
    import spark.implicits._
    val merges = WordPiece.learnMerges(
      Bpe.vocabCensus(Seq("ab ab ab ab cd").toDF("text"), col("text")), 4)
    def subtoks(w: String): Int = {
      val enc = WordPiece.applyMerges(Bpe.spacedForm(lit(w)), merges)
      spark.range(1).select(enc).head().getString(0)
        .split("  ").count(_.nonEmpty)
    }
    // 'ab' fully merges (with its </w>) → fewer pieces than raw chars+1
    assert(subtoks("ab") < 3, s"trained word must compress: ${subtoks("ab")}")
    assert(subtoks("zz") == 3, "unseen symbols stay char + char + </w>")
  }

  test("stops early on a fully merged vocabulary; partition-invariant on fixture text") {
    import spark.implicits._
    assert(learned(Seq("ab ab"), 50).size < 50)
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").as[String].collect().toSeq
    val one = learned(texts, 5, parts = 1)
    assert(one == learned(texts, 5, parts = 16))
    assert(one == naive(texts, 5))
  }
}
