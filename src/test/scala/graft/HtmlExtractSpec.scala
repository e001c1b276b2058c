package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HtmlExtract

/** The pinned HTML→text grammar under hostile, nested and broken
  * markup — every deviation the HtmlExtract scaladoc pins is asserted
  * here so a grammar change that silently shifts a pin fails a spec
  * before it fails a cross-engine oracle. */
class HtmlExtractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def full(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(HtmlExtract.extractText(col("h")).as("t"))
      .head().getString(0)
  }
  private def main(html: String, minLen: Int = 30, maxLinkPct: Int = 20): String = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(HtmlExtract.extractMainText(col("h"), minLen, maxLinkPct).as("t"))
      .head().getString(0)
  }
  private def census(html: String): Seq[(String, Int, Int, Boolean)] = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(explode(HtmlExtract.blockCensus(col("h"))).as("s"))
      .select(col("s.vis"), col("s.vis_len"), col("s.link_chars"), col("s.kept"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
      .toSeq
  }

  test("blocks assemble from tags, inline tags render without whitespace, entities decode") {
    val h = "<html><body><h1>Title</h1><p>one <b>bold</b> word</p>" +
      "<p>fish &amp; chips &lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;end</p></body></html>"
    assert(full(h) ==
      "Title\none bold word\nfish & chips <tag> \"q\" 'a' end")
    // &amp;lt; decodes ONE pass: the literal text &lt;
    assert(full("<p>x &amp;lt; y</p>") == "x &lt; y")
  }

  test("script/style strip beats tag-shaped payloads; unterminated forms eat to EOF") {
    val h = "<p>before</p><script>var s = \"</div><p>fake</p>\";</script><p>after</p>"
    // the non-greedy close means the script ends at the FIRST </script;
    // its tag-shaped payload never reaches the block stage
    assert(full(h) == "before\nafter")
    assert(full("<p>keep</p><style>p { color: red }</style>") == "keep")
    // unterminated script: comment-to-EOF rule twin
    assert(full("<p>keep</p><script>var x = 1;") == "keep")
    assert(full("<p>keep</p><!-- lost <p>ghost</p>") == "keep")
    // a comment carrying block tags strips BEFORE block marking
    assert(full("<p>a<!-- <p>g</p> -->b</p>") == "a b")
  }

  test("pinned deviations: attribute '>' cuts the tag; stray '<' stays literal") {
    // the grammar is regex-pinned, not a parser: a quoted '>' inside an
    // attribute ends the tag there (deterministic, documented)
    assert(full("""<p title="a>b">text</p>""") == "b\">text")
    assert(full("<p>5 < 6 and more text</p>") == "5 < 6 and more text")
  }

  test("hostile control chars cannot forge link accounting") {
    // literal \x02/\x03 in the input scrub to spaces at stage 0, so a
    // document cannot fake anchor markers and skew the density cut
    val h = "<p>\u0002fake link body\u0003 plus ordinary prose here</p>"
    val Seq((vis, _, lc, kept)) = census(h)
    assert(lc == 0, s"forged markers must not count as link chars: $lc")
    assert(vis == "fake link body plus ordinary prose here" && kept)
  }

  test("anchors: marking, nesting, unclosed, and the block-spanning zero-count deviation") {
    // plain anchor: body counts as link chars
    assert(census("<p>read <a href='/x'>the docs</a> now plus filler to pass</p>")
      .head._3 == "the docs".length)
    // nested anchor: inner open tag strips, body still counts once
    val Seq((nv, _, nlc, _)) = census("<p>aa <a>x<a>y</a> zz of longer prose body</p>")
    assert(nv == "aa xy zz of longer prose body" && nlc == 2, (nv, nlc))
    // unclosed anchor never marks
    assert(census("<p>go <a href='/x'>dangling text that keeps going</p>").head._3 == 0)
    // an anchor whose body spans a block boundary: pinned to ZERO link
    // chars per block (unpaired markers drop from visible text)
    val spans = census("<p>first piece <a>link start<p>link end</a> second piece</p>")
    assert(spans.forall(_._3 == 0), spans)
    assert(spans.map(_._1) == Seq("first piece link start", "link end second piece"))
  }

  test("uppercase and attributed block tags mark boundaries; case survives in text") {
    assert(full("<P CLASS='x'>One</P><DIV id=2>Two</DIV><h3>Three</h3>") ==
      "One\nTwo\nThree")
    // \b guard: <pre> is a block, <param> (p prefix) is NOT in the set
    assert(full("<pre>code here</pre><param name=x>tail") == "code here\ntail")
  }

  test("boilerplate cut: length and link-density rules, independently and together") {
    val h = "<div><a href='/'>Home</a> | <a href='/a'>About</a></div>" +
      "<p>this paragraph is long enough to clear the pinned thirty character floor</p>" +
      "<ul><li><a href='/1'>related one</a></li><li><a href='/2'>related two</a></li></ul>" +
      "<p>short</p>"
    assert(main(h) ==
      "this paragraph is long enough to clear the pinned thirty character floor")
    // the census shows WHY each block fell
    val c = census(h)
    assert(c.length == 5)
    assert(!c(0)._4 && c(0)._3 == 9, c(0)) // nav: dense AND short
    assert(c(1)._4)                        // prose: kept
    assert(!c(2)._4 && !c(3)._4)           // link list items: dense
    assert(!c(4)._4)                       // short: length floor
    // a long prose block with ONE inline link stays (density under 20%)
    val linked = "<p>a sentence of ordinary running prose that mentions " +
      "<a href='/d'>docs</a> inline and keeps going long enough</p>"
    assert(main(linked).nonEmpty && census(linked).head._3 == 4)
    // knobs are honored: floor 5 keeps the short block
    assert(main("<p>short</p>", minLen = 5) == "short")
  }

  test("whitespace: source newlines/tabs/CR collapse; block boundaries come from tags only") {
    val h = "<p>line one\n\tline two\r\n  spaced   out  </p><p>next</p>"
    assert(full(h) == "line one line two spaced out\nnext")
    // control chars (vertical tab, form feed, NUL) scrub to spaces
    assert(full("<p>a\u0000b\u000Bc\fd</p>") == "a b c d")
  }

  test("broken markup stays deterministic: empty doc, tags only, unclosed everything") {
    assert(full("") == "")
    assert(full("<div></div><p></p>") == "")
    assert(main("<p>") == "")
    assert(full("no markup at all, just text") == "no markup at all, just text")
    assert(full("<p>unclosed paragraph runs to the end") ==
      "unclosed paragraph runs to the end")
  }

  private def anchors(html: String): Seq[(String, String)] = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(explode(HtmlExtract.extractAnchors(col("h"))).as("a"))
      .select(col("a.href"), col("a.anchor"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("extractAnchors: pairs in document order; nested tags strip, entities decode, ws collapses") {
    val h = "<p><a href=\"/a\">the <b>bold</b>\n  pick &amp; more</a>" +
      " <a href='/b'>B</a> <a href=c>bare</a></p>"
    assert(anchors(h) == Seq(
      ("/a", "the bold pick & more"), ("/b", "B"), ("c", "bare")))
  }

  test("extractAnchors: shielding and pinned deviations") {
    // commented-out and script-embedded anchors are not links
    assert(anchors("<!-- <a href='/x'>x</a> --><script>var a=\"<a href='/y'>y</a>\";</script>" +
      "<a href=\"/z\">z</a>") == Seq(("/z", "z")))
    // empty anchor text survives (image-link shape); missing/empty href drops
    assert(anchors("<a href=\"/img\"></a><a name=\"t\">no href</a><a href=\"\">e</a>") ==
      Seq(("/img", "")))
    // UNCLOSED <a>: no pair here (extractLinks still yields its href)
    assert(anchors("<a href=\"/u\">runs off the end") == Seq.empty)
    val links = {
      import spark.implicits._
      Seq("<a href=\"/u\">runs off the end").toDF("h")
        .select(HtmlExtract.extractLinks(col("h")).as("l"))
        .head().getSeq[String](0)
    }
    assert(links == Seq("/u"))
    // href entity-decode (&amp; in query strings)
    assert(anchors("<a href=\"/s?a=1&amp;b=2\">q</a>") == Seq(("/s?a=1&b=2", "q")))
  }
}
