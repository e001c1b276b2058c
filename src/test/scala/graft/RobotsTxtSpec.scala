package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RobotsTxt

/** The pinned robots.txt grammar (RFC 9309): grouping, agent
  * selection, longest-match with allow tie-wins, wildcards and end
  * anchors — each rule the scaladoc pins asserted directly. */
class RobotsTxtSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rulesOf(body: String) = {
    import spark.implicits._
    RobotsTxt.rules(Seq(("h.example", body)).toDF("host", "body"),
      col("host"), col("body"))
  }

  private def decide(body: String, agent: String, urls: Seq[String]): Seq[Boolean] = {
    import spark.implicits._
    val u = urls.zipWithIndex.map { case (x, i) => (i, x) }.toDF("i", "url")
    RobotsTxt.evaluate(u, col("url"), agent, rulesOf(body))
      .orderBy("i").collect().map(_.getAs[Boolean]("allowed")).toSeq
  }

  test("parse: comments, case-insensitive fields, shared UA groups, pre-group and empty rules drop") {
    val body =
      """Disallow: /orphan   # attaches to nothing (no group yet)
        |# header comment
        |USER-AGENT: *
        |DISALLOW: /a/  # trailing comment
        |Allow:
        |
        |User-agent: botA
        |User-Agent: botB
        |Disallow: /b/
        |""".stripMargin
    val got = rulesOf(body)
      .select("agent", "allow", "pattern").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSet
    assert(got == Set(
      ("*", false, "/a/"),        // the empty Allow: dropped; /orphan dropped
      ("bota", false, "/b/"),     // consecutive UA lines share the group
      ("botb", false, "/b/")), got)
  }

  test("agent selection: a named group replaces *, never merges with it") {
    val body =
      """User-agent: *
        |Disallow: /all/
        |User-agent: mybot
        |Disallow: /mine/
        |""".stripMargin
    // mybot: only /mine/ applies — /all/ must be ALLOWED for it
    assert(decide(body, "MyBot",
      Seq("http://h.example/all/x", "http://h.example/mine/x",
        "http://h.example/free")) == Seq(true, false, true))
    // an unnamed agent takes the * group
    assert(decide(body, "otherbot",
      Seq("http://h.example/all/x", "http://h.example/mine/x")) ==
      Seq(false, true))
  }

  test("longest match wins; allow wins exact-length ties; no rules means allowed") {
    val body =
      """User-agent: *
        |Disallow: /d/
        |Allow: /d/pub/
        |Disallow: /t/x
        |Allow: /t/x
        |""".stripMargin
    assert(decide(body, "any",
      Seq("http://h.example/d/secret", "http://h.example/d/pub/ok",
        "http://h.example/t/x")) == Seq(false, true, true))
    // a host with no rules at all: everything allowed
    assert(decide(body, "any", Seq("http://norules.example/d/secret")) ==
      Seq(true))
  }

  test("wildcards and end anchors; regex metachars in patterns stay literal") {
    val body =
      """User-agent: *
        |Disallow: /*.js$
        |Disallow: /a+b/
        |""".stripMargin
    assert(decide(body, "any", Seq(
      "http://h.example/lib.js",        // *.js$ blocks
      "http://h.example/lib.js.map",    // $ anchor: NOT blocked
      "http://h.example/a+b/x",         // literal '+' blocks
      "http://h.example/aab/x"          // '+' is not a regex quantifier
    )) == Seq(false, true, false, true))
  }

  test("duplicate URLs each get their own decision row") {
    val body = "User-agent: *\nDisallow: /d/"
    assert(decide(body, "any", Seq(
      "http://h.example/d/x", "http://h.example/d/x",
      "http://h.example/ok")) == Seq(false, false, true))
  }

  test("sitemaps parse group-independently; hostile lines drop; rules pass is unaffected") {
    import spark.implicits._
    val body = "Sitemap: http://h.example/a.xml\n" + // before any group
      "User-agent: *\nDisallow: /x/\n" +
      "SITEMAP: http://h.example/b.xml # daily\n" + // case + comment
      "Sitemap:\n" +            // empty value drops
      "Sitemapx: http://no\n" + // wrong field name
      "no colon here\n" +
      "sitemap: http://h.example/c.xml"
    val got = RobotsTxt.sitemaps(
        Seq(("h.example", body)).toDF("host", "body"), col("host"), col("body"))
      .orderBy("seq").collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((0, "http://h.example/a.xml"),
      (3, "http://h.example/b.xml"), (7, "http://h.example/c.xml")), got)
    // the rules pass still sees only its own fields (sitemap lines
    // don't open or pollute groups)
    assert(decide(body, "any", Seq("http://h.example/x/1", "http://h.example/ok")) ==
      Seq(false, true))
  }
}
