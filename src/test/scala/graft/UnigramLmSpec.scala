package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UnigramLm

/** Unigram-LM tokenizer trainer: hand-replayed Viterbi arithmetic
  * (integer units, longer-piece tie-break), the seed coverage
  * guarantee, training hand values, and multi-round determinism. */
class UnigramLmSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("segment: picks the higher-scoring path in exact integer units") {
    // lp(ab) = -20 beats lp(a)+lp(b) = -21
    val m = Map("a" -> -10L, "b" -> -11L, "ab" -> -20L)
    assert(UnigramLm.segment("ab", m).toSeq == Seq("ab"))
    // and loses to -9 + -9
    val m2 = Map("a" -> -9L, "b" -> -9L, "ab" -> -20L)
    assert(UnigramLm.segment("ab", m2).toSeq == Seq("a", "b"))
  }

  test("segment: exact score ties prefer the longer piece at each position") {
    val m = Map("a" -> -10L, "b" -> -10L, "ab" -> -20L)
    assert(UnigramLm.segment("ab", m).toSeq == Seq("ab"),
      "tie between [ab] and [a,b] must resolve to the longer piece")
    // the tie-break applies per position: "aab" = [a, ab] vs [a, a, b]
    // vs [aa, b] all at -30 -> final position prefers p=2 ([?, ab]),
    // then position 1 takes [a]
    val m3 = Map("a" -> -10L, "b" -> -10L, "ab" -> -20L, "aa" -> -20L)
    assert(UnigramLm.segment("aab", m3).toSeq == Seq("a", "ab"))
  }

  test("segment: concatenation invariant and loud failure on a coverage gap") {
    val m = Map("x" -> -1L, "y" -> -2L, "xy" -> -2L, "yx" -> -4L)
    val words = Seq("x", "yx", "xyxy", "yyyy", "xxyyxx")
    words.foreach { w =>
      assert(UnigramLm.segment(w, m).mkString == w, s"pieces must rebuild '$w'")
    }
    val e = intercept[IllegalArgumentException] {
      UnigramLm.segment("xz", m)
    }
    assert(e.getMessage.contains("cover"), s"coverage gap must be loud: $e")
  }

  test("train: hand-replayed one-round counts on a tiny corpus") {
    import spark.implicits._
    // corpus: "ab ab ab c" -> census ab:3, c:1.
    // substrings weighted: a:3, b:3, ab:3, c:1 -> seed = all (chars +
    // top multi "ab"); total = 10.
    // lp units: ln(.3)*1e6 floor = -1203973 for a, b, ab; ln(.1) ->
    // -2302586 for c. Viterbi "ab": [ab] -1203973 beats [a,b]
    // -2407946 -> pieces ab:3, c:1.
    val df = Seq("ab ab ab c").toDF("text")
    val got = UnigramLm.train(df, col("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 3L, "c" -> 1L), s"hand value: $got")
  }

  test("encodeLocal serves exactly what segmentCensus broadcasts") {
    import spark.implicits._
    val df = Seq("ab ab ab c abc cab").toDF("text")
    val census = UnigramLm.wordCensus(df, col("text"))
    val model = UnigramLm.lpUnits(UnigramLm.seedVocab(census, 200))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    val dist = UnigramLm.segmentCensus(census, model)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    dist.foreach { case (w, pieces) =>
      assert(UnigramLm.encodeLocal(w, model) == pieces, s"word '$w'")
    }
    intercept[IllegalArgumentException] { UnigramLm.encodeLocal("", model) }
  }

  test("train: words past MaxWordLen are excluded by the documented cap") {
    import spark.implicits._
    val long = "z" * (UnigramLm.MaxWordLen + 1)
    val df = Seq(s"ab $long ab").toDF("text")
    val got = UnigramLm.train(df, col("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.keySet.exists(_.contains("z")), s"capped word leaked: $got")
  }

  test("train: a second EM round re-estimates deterministically") {
    import spark.implicits._
    val df = Seq("abc abc ab bc a b c", "abc ab ab bc bc bc").toDF("text")
    def run(r: Int): Seq[(String, Long)] =
      UnigramLm.train(df, col("text"), rounds = r)
        .collect().map(x => x.getString(0) -> x.getLong(1)).sortBy(_._1).toSeq
    val r2a = run(2)
    val r2b = run(2)
    assert(r2a == r2b, "fixed-round EM must be deterministic")
    // every surviving piece still carries positive weighted count
    assert(r2a.forall(_._2 > 0))
  }

  test("coverage: fertility counts sub-tokens per trainable word exactly") {
    import spark.implicits._
    val df = Seq(("s1", "ab ab c"), ("s2", "ab")).toDF("source", "text")
    val got = UnigramLm.coverage(df, col("text"), col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // seed: ab dominates -> "ab" one piece, "c" one piece
    assert(got == Set(("s1", 3L, 3L), ("s2", 1L, 1L)), s"got $got")
  }
}
