package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LangId

/** Char-n-gram NB language identification: the oracle gate
  * (q_langid_nb) pins DETERMINISM on the fixture's near-random labels;
  * this spec pins that the operator actually SEPARATES separable
  * languages, plus the tokenizer edges (padding, short text, the
  * prior-only arm). */
class LangIdSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // two toy languages with disjoint character inventories and one
  // shared filler word, varied across docs so train/test differ
  private def aDoc(i: Int) = s"la casa bonita $i de la playa con agua y sol"
  private def bDoc(i: Int) = s"der hund springt $i uber den zaun im wald schnell"

  test("separable languages classify correctly on held-out docs") {
    import spark.implicits._
    val train = ((0 until 20).map(i => (i.toLong, "es", aDoc(i))) ++
      (20 until 40).map(i => (i.toLong, "de", bDoc(i))))
      .toDF("doc_id", "lang", "text")
    val heldOut = Seq(
      (100L, "es", aDoc(777)), (101L, "de", bDoc(888)),
      (102L, "es", "agua bonita de la playa"), (103L, "de", "der zaun im wald"))
      .toDF("doc_id", "lang", "text")
    val got = LangId.classify(train, col("lang"), col("text"),
        heldOut, col("doc_id"), col("text"))
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(100L -> "es", 101L -> "de", 102L -> "es", 103L -> "de"), got)
  }

  test("tokenizer: space padding, whitespace folding, short-text guard") {
    import spark.implicits._
    def gramsOf(t: String): Seq[String] =
      Seq(t).toDF("t").select(LangId.grams(col("t"), 3).as("g"))
        .head().getSeq[String](0)
    assert(gramsOf("ab") == Seq("_ab", "ab_"))
    assert(gramsOf("a  b") == Seq("_a_", "a_b", "_b_"))
    assert(gramsOf("AB") == Seq("_ab", "ab_"))
    // shorter than one window: EMPTY, not a descending-sequence artifact
    assert(gramsOf("") == Seq.empty)
  }

  test("gram-less docs score on priors alone and still emit exactly one row") {
    import spark.implicits._
    // 3:1 prior imbalance; the empty-text doc must take the majority
    // class deterministically instead of vanishing
    val train = ((0 until 30).map(i => (i.toLong, "es", aDoc(i))) ++
      (30 until 40).map(i => (i.toLong, "de", bDoc(i))))
      .toDF("doc_id", "lang", "text")
    val heldOut = Seq((200L, "")).toDF("doc_id", "text")
    val rows = LangId.classify(train, col("lang"), col("text"),
        heldOut, col("doc_id"), col("text")).collect()
    assert(rows.length == 1 && rows.head.getString(1) == "es", rows.toSeq)
  }
}
