package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Boilerplate

/** The host-template frequency census and strip: thresholds exact at
  * the boundary, distinct-per-page counting, per-host isolation, and
  * the canonical counter-example — chrome the density rule keeps. */
class BoilerplateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def pages(rows: Seq[(String, Long, Seq[String])]) = {
    import spark.implicits._
    rows.toDF("host", "pid", "blocks")
  }

  private def census(rows: Seq[(String, Long, Seq[String])],
      minPages: Int = 2, minPct: Int = 50): Set[(String, String, Long, Long)] =
    Boilerplate.templateCensus(pages(rows), col("host"), col("pid"),
        col("blocks"), minPages, minPct)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet

  test("thresholds are exact at the boundary; counting is distinct-per-page") {
    val rows = Seq(
      ("h", 1L, Seq("nav", "nav", "nav", "body one")), // in-page repeat counts ONCE
      ("h", 2L, Seq("nav", "body two")),
      ("h", 3L, Seq("nav", "half")),
      ("h", 4L, Seq("half", "body four")))
    // nav on 3/4 pages, half on EXACTLY 2/4 = the 50% boundary (kept:
    // >= not >); bodies on 1 page each (below minPages)
    assert(census(rows) == Set(
      ("h", "nav", 3L, 4L), ("h", "half", 2L, 4L)))
    // minPct just above the boundary drops the 50% block
    assert(census(rows, minPct = 51) == Set(("h", "nav", 3L, 4L)))
    // minPages floor beats percentage on tiny hosts: 1/1 page = 100%
    // but one page can't witness a template
    assert(census(Seq(("t", 1L, Seq("only")))) == Set.empty)
  }

  test("hosts are isolated: a block shared ACROSS hosts is not a template") {
    val rows = Seq(
      ("a", 1L, Seq("powered by graft", "x")),
      ("b", 2L, Seq("powered by graft", "y")),
      ("c", 3L, Seq("powered by graft", "z")))
    // one page per host: nothing clears minPages anywhere
    assert(census(rows) == Set.empty)
  }

  test("stripTemplates joins each host's set; hosts without templates get an empty array") {
    val rows = Seq(
      ("a", 1L, Seq("nav", "one")), ("a", 2L, Seq("nav", "two")),
      ("b", 3L, Seq("solo")))
    val sets = Boilerplate.templateSets(
      Boilerplate.templateCensus(pages(rows), col("host"), col("pid"), col("blocks")))
    val out = Boilerplate.stripTemplates(pages(rows), col("host"), sets)
      .select(col("pid"), col("__templates"),
        filter(col("blocks"),
          b => !array_contains(col("__templates"), b)).as("residual"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList,
        r.getSeq[String](2).toList)).sortBy(_._1).toList
    assert(out == List(
      (1L, List("nav"), List("one")),
      (2L, List("nav"), List("two")),
      (3L, Nil, List("solo"))))
  }

  test("the canonical counter-example: long link-free chrome passes density, dies by frequency") {
    import graft.operators.HtmlExtract
    import spark.implicits._
    val disclaimer = "All content is provided as-is with no warranty of any kind."
    val docs = (1 to 4).map(i =>
      ("h", i.toLong, s"<p>unique body text for page number $i, long enough to keep.</p>" +
        s"<p>$disclaimer</p>"))
    val df = docs.toDF("host", "pid", "html")
      .withColumn("cs", HtmlExtract.blockCensus(col("html")))
      .withColumn("blocks", transform(col("cs"), c => c.getField("vis")))
    // density verdict: EVERY block kept (all long, zero links)
    assert(df.select(explode(col("cs")).as("s")).filter(!col("s.kept")).count() == 0)
    val sets = Boilerplate.templateSets(
      Boilerplate.templateCensus(df, col("host"), col("pid"), col("blocks")))
    val tmpl = sets.head().getSeq[String](1)
    assert(tmpl == Seq(disclaimer))
  }

  test("guards: minPages and minPct validate loudly") {
    intercept[IllegalArgumentException](
      Boilerplate.templateCensus(pages(Seq()), col("host"), col("pid"), col("blocks"),
        minPages = 1))
    intercept[IllegalArgumentException](
      Boilerplate.templateCensus(pages(Seq()), col("host"), col("pid"), col("blocks"),
        minPct = 0))
  }
}
