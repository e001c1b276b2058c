package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HtmlExtract, UrlParse}

/** The pinned URL grammar (parse/normalize/resolve) and link
  * extraction under hostile and edge-case inputs — every deviation
  * the UrlParse/extractLinks scaladocs pin is asserted here. */
class UrlParseSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def one(c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head().getString(0)
  }
  private def norm(u: String): String = one(UrlParse.normalize(lit(u)))
  private def res(b: String, h: String): String =
    one(UrlParse.resolve(lit(b), lit(h)))

  test("component parse: userinfo, ports, queries, fragments") {
    val u = lit("HTTPS://user:pw@Host.Example:8443/A/b%20c?q=1&r=2#frag")
    assert(one(UrlParse.scheme(u)) == "https")
    assert(one(UrlParse.host(u)) == "host.example")
    assert(one(UrlParse.port(u)) == "8443")
    assert(one(UrlParse.path(u)) == "/A/b%20c")
    assert(one(UrlParse.query(u)) == "q=1&r=2")
  }

  test("normalize: case, default ports, empty path, fragment drop, query preserved") {
    assert(norm("HTTP://WWW.Example.COM") == "http://www.example.com/")
    assert(norm("http://h.example:80/a") == "http://h.example/a")
    assert(norm("https://h.example:443/a") == "https://h.example/a")
    assert(norm("http://h.example:8080/a") == "http://h.example:8080/a")
    assert(norm("http://h.example/a?B=C&d=E#frag") == "http://h.example/a?B=C&d=E")
    // path case is NOT normalized (paths are case-sensitive)
    assert(norm("http://h.example/A/B") == "http://h.example/A/B")
    // no host: not a fetchable frontier entry
    assert(one(UrlParse.normalize(lit("mailto:a@b.example"))) == null)
    assert(one(UrlParse.normalize(lit("relative/path"))) == null)
  }

  test("normalize: dot-segment removal incl. climbs past root and trailing forms") {
    assert(norm("http://h/a/b/../c/./d") == "http://h/a/c/d")
    assert(norm("http://h/a/./b/.") == "http://h/a/b/")
    assert(norm("http://h/a/b/..") == "http://h/a/")
    assert(norm("http://h/../../a") == "http://h/a")
    assert(norm("http://h/a/../../../b") == "http://h/b")
    // a literal `..` SEGMENT never collapses its like (pinned): only
    // real segments consume a following ..
    assert(norm("http://h/..a/../b") == "http://h/b")
    // deep chains resolve within the pinned K=8 fold bound
    assert(norm("http://h/a/b/c/d/e/f/g/i/../../../../../../../../z") == "http://h/z")
  }

  test("resolve: every arm, fragment/empty edges dropped") {
    val b = "http://s.example/dir/page.html"
    assert(res(b, "http://other.example/x") == "http://other.example/x")
    assert(res(b, "//cdn.example/l.js") == "http://cdn.example/l.js")
    assert(res(b, "/idx.html") == "http://s.example/idx.html")
    assert(res(b, "?p=2") == "http://s.example/dir/page.html?p=2")
    assert(res(b, "sub/x.html") == "http://s.example/dir/sub/x.html")
    assert(res(b, "../up.html") == "http://s.example/up.html")
    assert(res(b, "#sec") == null)
    assert(res(b, "") == null)
    assert(res(b, "mailto:a@b") == null)
    // base with default port and case noise still resolves canonically
    assert(res("HTTP://S.Example:80/d/p", "x") == "http://s.example/d/x")
    // base with a bare origin: directory is the root
    assert(res("http://s.example", "x.html") == "http://s.example/x.html")
  }

  test("extractLinks: quoting forms, order, entity decode, shielded anchors") {
    import spark.implicits._
    val h = """<p><a href="/dq">a</a><a href='/sq'>b</a><a href=/bare>c</a>""" +
      """<a id=x>no href</a><a href="">empty</a>""" +
      """<a href="/q?a=1&amp;b=2">ent</a></p>""" +
      """<!-- <a href="/commented">x</a> --><script>var a='<a href="/js">x</a>';</script>""" +
      """<A HREF="/upper">D</A>"""
    val got = Seq(h).toDF("h")
      .select(HtmlExtract.extractLinks(col("h")).as("l"))
      .head().getSeq[String](0)
    assert(got == Seq("/dq", "/sq", "/bare", "/q?a=1&b=2", "/upper"), got)
  }

  test("canonicalQuery: drop prefixes, sort, empty segments, passthrough and ?-vanish arms") {
    def canon(u: String): String =
      one(UrlParse.canonicalQuery(lit(u), Seq("utm_", "gclid=")))
    // params sort bytewise; tracking family and click id drop; the
    // empty `&&` segment drops
    assert(canon("http://h/p?b=2&&utm_source=f&a=1&utm_campaign=x&gclid=g9&z=0") ==
      "http://h/p?a=1&b=2&z=0")
    // no query: untouched
    assert(canon("http://h/p") == "http://h/p")
    // query entirely tracking: the `?` vanishes
    assert(canon("http://h/p?utm_a=1&gclid=x") == "http://h/p")
    // prefix semantics are PINNED: `gclid=` is exact-name strict
    // (gclid2=1 survives), `utm_` covers the family
    assert(canon("http://h/p?gclid2=1&utm_x=2") == "http://h/p?gclid2=1")
    // a param without `=` is a raw token, matched and sorted as-is
    assert(canon("http://h/p?flag&a=1") == "http://h/p?a=1&flag")
    // composes after resolve (fragment already gone, case folded)
    assert(one(UrlParse.canonicalQuery(
      UrlParse.resolve(lit("http://H.Example/d/p.html"), lit("?utm_s=1&b=2#f")),
      Seq("utm_"))) == "http://h.example/d/p.html?b=2")
  }
}
