package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction with a PINNED, engine-replayable grammar —
  * the pipeline stage between "read the raw crawl"
  * ([[graft.sources.WarcCorpusSource.readResponses]], whose payloads
  * are HTTP+HTML) and the engine's entire text stack (dedup, quality,
  * tokenizers, drift), all of which consume a clean `text` column a
  * crawl cannot otherwise produce. (Extension surface: the reference's
  * demo corpus is clean prose — `semantic_search.py:6-13` — so it has
  * no extraction analog; this is the VERDICT r16 #1 gap.)
  *
  * DESIGN: the whole pipeline is a single Column expression over the
  * built-in string/regex/higher-order functions — per-row, map-only,
  * no UDF, no explode, no shuffle. At 100 TB that matters twice: the
  * extraction rides IN the scan that reads the crawl (one pass, filter
  * and projection pushdown intact), and the block census/cut never
  * leaves the row it belongs to.
  *
  * THE PINNED GRAMMAR (deterministic; replayed verbatim by the DuckDB
  * oracles — every construct used is common to Java regex and RE2):
  *   0. ASCII control chars except \t \n \r → one space (also shields
  *      the two marker chars below from hostile input);
  *   1. terminated comments `(?s)<!--.*?-->` → space, then an
  *      unterminated `<!--` eats to EOF (comment-to-EOF rule);
  *   2. script then style elements, terminated `(?is)<script\b[^>]*>
  *      .*?</script[^>]*>` → space, then unterminated-to-EOF;
  *   3. anchor MARKING `(?is)<a\b[^>]*>(.*?)</a[^>]*>` →
  *      \x02 body \x03 (the link-density census below); an unclosed
  *      `<a>` never marks (its open tag strips as a plain tag);
  *   4. source newlines → space (block structure comes from TAGS, not
  *      source formatting);
  *   5. the pinned BLOCK-tag set → `\n`:
  *      article aside blockquote br div footer form header hr h1-h6
  *      li nav ol pre p section table td th title tr ul
  *      (longest-first within shared prefixes; `\b` guards the rest);
  *   6. every remaining tag `<[^>]*>` → empty (inline tags render
  *      without whitespace); PINNED DEVIATIONS, all deterministic: an
  *      attribute value containing a literal `>` ends the tag there; a
  *      stray `<` with no `>` stays literal text; an anchor whose body
  *      spans a block boundary contributes zero link chars (its
  *      markers end up unpaired per block and are dropped from the
  *      visible text);
  *   7. entity decode, pinned finite set in pinned order:
  *      &lt; &gt; &quot; &#39; &apos; &nbsp; then &amp; LAST (so
  *      `&amp;lt;` decodes to the literal text `&lt;`, the standard
  *      single-pass rule); numeric references other than &#39; stay
  *      literal (pinned);
  *   8. per block (split on `\n`): collapse `[ \t\r]+` → one space,
  *      trim; visible text = the block minus marker chars; a block is
  *      BOILERPLATE (jusText-class length + link-density heuristic;
  *      stopword densities deliberately out of scope) unless
  *      `vis_len >= minLen` AND `link_chars * 100 <= vis_len *
  *      maxLinkPct` — integer cross-multiply, no float division;
  *   9. surviving blocks join with `\n`.
  */
object HtmlExtract {

  /** Marker chars for anchor-body accounting — scrubbed from hostile
    * input by stage 0, so only stage 3 can introduce them. */
  private val M2 = "\u0002"
  private val M3 = "\u0003"

  private val BlockTags =
    "article|aside|blockquote|br|div|footer|form|header|hr|h[1-6]|" +
      "li|nav|ol|pre|p|section|table|td|th|title|tr|ul"

  /** Stages 0–7: the marker-annotated, newline-blocked cleaned string.
    * Package-visible so gates can census intermediate state. */
  private[graft] def cleaned(html: Column): Column = {
    val s0 = regexp_replace(html, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", " ")
    val s1 = regexp_replace(s0, "(?s)<!--.*?-->", " ")
    val s1b = regexp_replace(s1, "(?s)<!--.*", " ")
    val s2 = regexp_replace(s1b, "(?is)<script\\b[^>]*>.*?</script[^>]*>", " ")
    val s2b = regexp_replace(s2, "(?is)<script\\b[^>]*>.*", " ")
    val s3 = regexp_replace(s2b, "(?is)<style\\b[^>]*>.*?</style[^>]*>", " ")
    val s3b = regexp_replace(s3, "(?is)<style\\b[^>]*>.*", " ")
    val s4 = regexp_replace(s3b, "(?is)<a\\b[^>]*>(.*?)</a[^>]*>", s"$M2$$1$M3")
    val s5 = replace(s4, lit("\n"), lit(" "))
    val s6 = regexp_replace(s5, s"(?i)</?($BlockTags)\\b[^>]*>", "\n")
    val s7 = regexp_replace(s6, "<[^>]*>", "")
    decodeEntities(s7)
  }

  private def decodeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }

  /** Stage-8 block normalization: collapse runs, trim edges. */
  private def norm(b: Column): Column =
    trim(regexp_replace(b, "[ \\t\\r]+", " "))

  /** Visible text: the block minus both marker chars (paired or not). */
  private def vis(b: Column): Column = translate(b, M2 + M3, "")

  /** Chars inside PAIRED anchor markers: total matched-segment length
    * minus two marker chars per pair. Unpaired markers (an anchor
    * spanning a block boundary — pinned deviation) contribute zero. */
  private def linkChars(b: Column): Column = {
    val seg = s"$M2[^$M3]*$M3"
    (length(b) - length(regexp_replace(b, seg, ""))) -
      lit(2) * regexp_count(b, lit(seg))
  }

  private def keeps(b: Column, minLen: Int, maxLinkPct: Int): Column =
    length(vis(b)) >= lit(minLen) &&
      linkChars(b) * lit(100) <= length(vis(b)) * lit(maxLinkPct)

  /** Full text extraction — every non-empty block, no boilerplate cut
    * (the WET-style conversion shape): blocks joined with `\n`. */
  def extractText(html: Column): Column =
    array_join(
      filter(
        transform(split(cleaned(html), "\n"), b => vis(norm(b))),
        t => length(t) > 0),
      "\n")

  /** Main-content extraction — the boilerplate cut (stage 8's pinned
    * length + link-density rule): nav bars, related-links footers and
    * short chrome drop; body prose survives. */
  def extractMainText(html: Column, minLen: Int = 30,
      maxLinkPct: Int = 20): Column = {
    val blocks = transform(split(cleaned(html), "\n"), b => norm(b))
    val kept = filter(blocks, b => keeps(b, minLen, maxLinkPct))
    array_join(transform(kept, b => vis(b)), "\n")
  }

  /** Outlink extraction — the crawl-FRONTIER half of the extraction
    * stage (text feeds the training corpus; hrefs feed the next crawl
    * round): every `<a>` open tag's href value, in document order,
    * from the comment/script/style-stripped string (so a commented-out
    * or script-embedded anchor is NOT a link — same shielding as the
    * text path). Pinned grammar: the tag set is `(?is)<a\b[^>]*>`;
    * within a tag, href parses as `href = "…"` | `'…'` | bare token
    * (first match wins; bare stops at whitespace or `>`); the value
    * entity-decodes with the pinned set (`&amp;` in query strings);
    * tags without an href (or with an empty value) yield nothing. */
  def extractLinks(html: Column): Column = {
    val s0 = regexp_replace(html, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", " ")
    val s1 = regexp_replace(s0, "(?s)<!--.*?-->", " ")
    val s1b = regexp_replace(s1, "(?s)<!--.*", " ")
    val s2 = regexp_replace(s1b, "(?is)<script\\b[^>]*>.*?</script[^>]*>", " ")
    val s2b = regexp_replace(s2, "(?is)<script\\b[^>]*>.*", " ")
    val s3 = regexp_replace(s2b, "(?is)<style\\b[^>]*>.*?</style[^>]*>", " ")
    val s3b = regexp_replace(s3, "(?is)<style\\b[^>]*>.*", " ")
    val tags = regexp_extract_all(s3b, lit("(?is)<a\\b[^>]*>"), lit(0))
    val href = (t: Column) => {
      val dq = regexp_extract(t, "(?is)\\bhref\\s*=\\s*\"([^\"]*)\"", 1)
      val sq = regexp_extract(t, "(?is)\\bhref\\s*=\\s*'([^']*)'", 1)
      val bare = regexp_extract(t, "(?is)\\bhref\\s*=\\s*([^\\s>\"']+)", 1)
      decodeEntities(
        when(length(dq) > 0, dq)
          .otherwise(when(length(sq) > 0, sq).otherwise(bare)))
    }
    filter(transform(tags, t => href(t)), v => length(v) > 0)
  }

  /** Anchor extraction — (href, anchor text) PAIRS, the classic
    * web-scale relevance signal (anchor text describes the TARGET
    * page better than the target's own markup; aggregated per target
    * it feeds retrieval, title synthesis, and crawl prioritization).
    * Same shielding as [[extractLinks]] (stages 0-3: a commented-out
    * or script-embedded anchor is NOT a link); elements parse as
    * `(?is)<a\b[^>]*>(.*?)</a[^>]*>` — an UNCLOSED `<a>` yields no
    * pair here even though [[extractLinks]] still yields its href
    * (pinned deviation: a crawler follows the edge, but unterminated
    * markup carries no trustworthy anchor text). Per element the href
    * parses with the [[extractLinks]] grammar; the anchor text is the
    * inner body with nested tags stripped (`<[^>]*>` → ''), entities
    * decoded (pinned set), whitespace (incl. newlines) collapsed and
    * trimmed — empty anchor text survives (image/icon links are real
    * edges whose text is ''), empty href drops the pair. Map-only:
    * one Column expression riding the scan, like every stage here. */
  def extractAnchors(html: Column): Column = {
    val s0 = regexp_replace(html, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", " ")
    val s1 = regexp_replace(s0, "(?s)<!--.*?-->", " ")
    val s1b = regexp_replace(s1, "(?s)<!--.*", " ")
    val s2 = regexp_replace(s1b, "(?is)<script\\b[^>]*>.*?</script[^>]*>", " ")
    val s2b = regexp_replace(s2, "(?is)<script\\b[^>]*>.*", " ")
    val s3 = regexp_replace(s2b, "(?is)<style\\b[^>]*>.*?</style[^>]*>", " ")
    val s3b = regexp_replace(s3, "(?is)<style\\b[^>]*>.*", " ")
    val els = regexp_extract_all(s3b, lit("(?is)<a\\b[^>]*>.*?</a[^>]*>"), lit(0))
    val pair = (el: Column) => {
      val tag = regexp_extract(el, "(?is)^(<a\\b[^>]*>)", 1)
      val dq = regexp_extract(tag, "(?is)\\bhref\\s*=\\s*\"([^\"]*)\"", 1)
      val sq = regexp_extract(tag, "(?is)\\bhref\\s*=\\s*'([^']*)'", 1)
      val bare = regexp_extract(tag, "(?is)\\bhref\\s*=\\s*([^\\s>\"']+)", 1)
      val href = decodeEntities(
        when(length(dq) > 0, dq)
          .otherwise(when(length(sq) > 0, sq).otherwise(bare)))
      val inner = regexp_extract(el, "(?is)^<a\\b[^>]*>(.*)</a[^>]*>$", 1)
      val anchor = trim(regexp_replace(
        decodeEntities(regexp_replace(inner, "<[^>]*>", "")),
        "[ \\t\\r\\n]+", " "))
      struct(href.as("href"), anchor.as("anchor"))
    }
    filter(transform(els, el => pair(el)),
      p => length(p.getField("href")) > 0)
  }

  /** Visible block texts as an array (stages 0-8 minus the
    * boilerplate CUT): normalized, marker-stripped, empties dropped —
    * the block stream [[graft.operators.Boilerplate]]'s cross-page
    * frequency census consumes. */
  def visibleBlocks(html: Column): Column =
    filter(
      transform(split(cleaned(html), "\n"), b => vis(norm(b))),
      t => length(t) > 0)

  /** Per-block census as an array of structs (posexplode in the
    * caller for a row-per-block frame): visible text, visible length,
    * paired-anchor char count, and the stage-8 keep verdict — the
    * density math itself as a gateable surface. Empty-visible blocks
    * drop (they carry no evidence either way). */
  def blockCensus(html: Column, minLen: Int = 30,
      maxLinkPct: Int = 20): Column =
    filter(
      transform(split(cleaned(html), "\n"), b0 => {
        val b = norm(b0)
        struct(
          vis(b).as("vis"),
          length(vis(b)).as("vis_len"),
          linkChars(b).as("link_chars"),
          keeps(b, minLen, maxLinkPct).as("kept"))
      }),
      s => length(s.getField("vis")) > 0)
}
