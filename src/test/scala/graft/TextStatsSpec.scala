package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions.{bigrams, charEntropy, tokens, topTokenCount}

/** Row-local repetition kernels: the shuffle-free forms must equal the
  * explode/groupBy renderings they replace (the map-only property is
  * what keeps q_repetition/q_filter_cascade one narrow corpus pass). */
class TextStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("topTokenCount (sorted-run, row-local) == explode/groupBy mode count") {
    val t = tokens(col("text"))
    val local = docs.select(col("doc_id"), topTokenCount(t).as("top"))
    val viaShuffle = docs.select(col("doc_id"), explode(t).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_ref"))
    val diverged = local.join(viaShuffle, "doc_id")
      .filter(col("top") =!= col("top_ref")).count()
    assert(diverged == 0)
  }

  test("bigrams: n-1 adjacent pairs, empty under 2 tokens, duplicate-aware") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "a", "b")), // bigrams: a b, b a, a b → 1 dup
      (2L, Seq("x")),
      (3L, Seq.empty[String]),
      (4L, Seq("q", "q", "q")) // q q, q q → 1 dup
    ).toDF("id", "toks")
    val got = df.select(
        col("id"),
        size(bigrams(col("toks"))).as("n"),
        (size(bigrams(col("toks"))) -
          size(array_distinct(bigrams(col("toks"))))).as("dups"))
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3, 1), (2L, 0, 0), (3L, 0, 0), (4L, 2, 1)))
  }

  test("bigram LM penalizes improbable token ORDER; short docs emit no score row") {
    import spark.implicits._
    import graft.operators.NgramLm
    // 20 natural docs + 1 with the SAME words shuffled: the unigram
    // model cannot tell them apart, the bigram model must — that is
    // the whole point of the context-aware score
    val corpus = (Seq.tabulate(20)(i => (i.toLong, "the cat sat")) ++
      Seq((99L, "sat cat the"), (100L, "solo"))).toDF("doc_id", "text")
    val scored = NgramLm.bigramLogProb(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(scored(0L)._1 == 2 && scored(99L)._1 == 2)
    assert(scored(0L)._2 > scored(99L)._2,
      s"shuffled word order must score lower: ${scored(0L)} vs ${scored(99L)}")
    // a sub-2-token doc has no bigram stream — no score row, not a 0
    assert(!scored.contains(100L))
    // hand-check doc 0 under add-one smoothing with V = 4
    // ({the, cat, sat, solo}): prefix counts C1(the) = 20 ("the cat"
    // ×20), C1(cat) = 21 ("cat sat" ×20 + "cat the" ×1), so
    // P(cat|the) = 21/(20+4) and P(sat|cat) = 21/(21+4); avg of
    // DECIMAL(18,6)-cast lns, floor-scaled
    val expect = {
      val a = BigDecimal(math.log(21.0 / 24.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val b = BigDecimal(math.log(21.0 / 25.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      math.floor((a + b).toDouble / 2 * 10000.0) / 10000.0
    }
    assert(scored(0L)._2 == expect, s"${scored(0L)._2} vs hand-computed $expect")
  }

  test("per-source KL divergence: non-negative, near-zero for in-distribution, flags the drifted source") {
    import spark.implicits._
    import graft.queries.TextQueries
    // three sources sharing one distribution + one drifted source
    // (different vocabulary entirely — the scraper-gone-wrong case)
    val rows =
      (for (s <- Seq("a", "b", "c"); i <- 0 until 30)
        yield (s, s"the cat sat on mat $i")) ++
        (0 until 30).map(i => ("drift", s"zebra quark flux $i"))
    val kl = TextQueries.sourceKl(rows.toDF("source", "text")).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // Gibbs: KL >= 0 (floor-scaling can shave at most 1e-4 below)
    assert(kl.values.forall(_ >= -1e-4), s"negative divergence: $kl")
    // the drifted source dominates every in-distribution source by a
    // wide margin, and in-distribution sources sit near their mixture
    for (s <- Seq("a", "b", "c"))
      assert(kl("drift") > kl(s) + 0.5, s"drift not flagged: $kl")
  }

  test("topTokenCount edge cases: empty array and all-equal tokens") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("z", "z", "z")),
      (3L, Seq("", "", "a")) // empty-string tokens count like any other
    ).toDF("id", "toks")
    val got = df.select(col("id"), topTokenCount(col("toks")).as("top"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L), (2L, 3L), (3L, 2L)))
  }

  test("charEntropy: 0 for runs, ln k for uniform alphabets, separates text from key-mash") {
    import spark.implicits._
    def h(t: String): Double = Seq(t).toDF("text")
      .select(charEntropy(col("text"))).head().getDouble(0)
    assert(h("") == 0.0 && h("aaaaaaa") == 0.0)
    // uniform over 4 chars -> ln 4, floor-quantized at 4dp
    val ln4 = math.floor(math.log(4.0) * 1e4) / 1e4
    assert(math.abs(h("abcdabcdabcd") - ln4) <= 2e-4, s"${h("abcdabcdabcd")} vs $ln4")
    // natural English sits well below a base64-ish key-mash
    val eng = h("the quick brown fox jumps over the lazy dog and then sleeps")
    val mash = h("xK9#mQ2$vL7@pR4!wZ8%nB3^jF6&hT1*")
    assert(mash > eng + 0.3, s"mash $mash must clearly exceed english $eng")
  }

  test("distinctiveTerms: a planted group-exclusive token ranks first, " +
      "shared vocabulary scores near zero, minCount filters") {
    import spark.implicits._
    // group a over-uses "alpha"; both share the filler vocabulary
    val filler = "one two three four five six"
    val docs = (Seq.fill(8)(("a", s"$filler alpha alpha")) ++
      Seq.fill(8)(("b", s"$filler beta beta"))).toDF("src", "text")
    val r = graft.operators.NgramLm.distinctiveTerms(docs, col("src"),
        col("text"), a0 = 10.0, minCount = 2L, k = 2)
      .collect().map(x => (x.getString(0), x.getInt(1)) ->
        (x.getString(2), x.getDouble(4))).toMap
    assert(r(("a", 1))._1 == "alpha", s"a's top token must be its exclusive one: $r")
    assert(r(("b", 1))._1 == "beta")
    assert(r(("a", 1))._2 > 0, "over-use scores positive")
    // rank-2 tokens are shared filler: |z| well below the planted token
    assert(math.abs(r(("a", 2))._2) < r(("a", 1))._2 / 2,
      s"shared vocabulary must not out-score the planted token: $r")
    // minCount above the planted count removes it from contention
    val r2 = graft.operators.NgramLm.distinctiveTerms(docs, col("src"),
        col("text"), a0 = 10.0, minCount = 17L, k = 1)
      .collect().map(x => x.getString(2)).toSet
    assert(!r2.contains("alpha") && !r2.contains("beta"),
      s"minCount must filter the 16-occurrence planted tokens: $r2")
  }
}
