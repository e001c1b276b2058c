package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for the LLM-data-pipeline extensions
  * (north-star ops beyond the reference's surface — the reference's own
  * text path is `semantic_search.py:6-25`, which embeds externally).
  *
  * All kernels are pure column expressions (codegen-friendly, no UDFs)
  * and deterministic, so each has an exact DuckDB-SQL twin for the
  * oracle gate.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish regex token count: alpha runs, digit runs, and single
    * non-alnum marks each count as one token. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Polynomial rolling-hash fingerprint of a document, mod 1e9+7.
    * The streaming analog of content-defined fingerprinting: identical
    * normalized text ⇒ identical fingerprint. */
  def fingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (h, c) => (h * 31L + ascii(c)) % lit(1000000007L))

  /** Count of tokens contained in `words`. */
  def tokensIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Per-language stopword profiles for the n-gram-free language-ID
    * heuristic. Tiny on purpose: broadcastable, codegen-able. */
  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val StopEs = Seq("el", "la", "de", "que", "y", "en", "un", "los")
  val StopDe = Seq("der", "die", "das", "und", "ist", "von", "ein", "zu")
  val StopFr = Seq("le", "la", "de", "et", "un", "est", "les", "des")

  /** Language-ID by stopword-profile argmax; 'und' when no profile
    * matches. Tie order en > es > de > fr is part of the contract (the
    * oracle SQL encodes the same CASE chain). */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = tokensIn(t, StopEn)
    val es = tokensIn(t, StopEs)
    val de = tokensIn(t, StopDe)
    val fr = tokensIn(t, StopFr)
    when(en === 0 && es === 0 && de === 0 && fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Adjacent-token bigrams ("a b"); empty for docs with < 2 tokens.
    * Row-local (no explode/shuffle) — the building block for the
    * Gopher-style duplicate-n-gram repetition signal. Built as two
    * `slice`s + one `zip_with` (the `Dedup.shinglesFromTokens`
    * pattern): array *arguments* to a higher-order function are
    * evaluated once per row, whereas expressions nested in the lambda
    * *body* re-evaluate per element — `element_at(toks, i)` with
    * `toks` a split() expression would re-tokenize per bigram,
    * O(tokens²) per doc. */
  def bigrams(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (x, y) => concat(x, lit(" "), y)))

  /** Occurrence count of the most frequent token, computed row-locally
    * as the longest equal run of the sorted token array (O(n log n)
    * per doc, map-only — no explode + per-token shuffle, so a corpus
    * scan stays one narrow pass at any scale). The empty-string zero
    * state is safe: a first token equal to the sentinel still starts
    * its run at 0 + 1. */
  def topTokenCount(toks: Column): Column =
    aggregate(
      sort_array(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, t) => {
        val run = when(t === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))

  /** Canonical text normalization for dedup keys: lowercase, strip
    * non-alphanumerics to single spaces, trim. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()-]", ""))

  /** Per-document character-level Shannon entropy in nats — the
    * gibberish/binary detector beside [[qualityScore]] (the
    * compressibility-shaped signal of the Gopher/C4 rule family:
    * base64 blobs and key-mash runs sit far from natural text's
    * ~2.5-3.5 nats; single-character runs sit at 0).
    *
    * ROW-LOCAL: the per-doc character histogram builds inside HOF
    * lambdas (distinct chars × membership counts — O(k·n) per row,
    * k = distinct chars ≤ alphabet), so the operator is map-only with
    * ZERO shuffle at any corpus size — no explode of the corpus's
    * characters ever reaches a shuffle.
    *
    * Determinism (the [[graft.operators.NgramLm]] convention, made
    * fully integer here): each character's −p·ln p term casts to
    * DECIMAL(18,6) then scales to exact 1e-6-unit longs; the per-doc
    * sum is exact long addition inside the HOF fold, and the 4dp
    * output quantization is an integer divide — after the per-term
    * cast absorbs the one cross-engine ln ulp, not a single float
    * rounding depends on order or engine. */
  def charEntropy(text: Column): Column = {
    val ch = filter(split(text, ""), c => length(c) > 0)
    val n = size(ch).cast("double")
    val units = transform(array_distinct(ch), u => {
      val p = size(filter(ch, x => x === u)).cast("double") / n
      (p * log(p)).cast("decimal(18,6)").multiply(lit(1000000)).cast("long")
    })
    val su = aggregate(units, lit(0L), (a, x) => a + x)
    when(size(ch) === 0, lit(0.0)).otherwise(
      floor((-su).cast("double") / lit(100.0)) / lit(10000.0))
  }

  /** Sentence count: maximal `[.!?]+` runs terminate sentences; a
    * document with text but no terminator counts as ONE sentence
    * (the max(1) floor — readability of a fragment is still defined).
    * Integer, regex-only — replays exactly in SQL. */
  def sentenceCount(text: Column): Column =
    greatest(lit(1), size(regexp_extract_all(text, lit("[.!?]+"), lit(0))))

  /** Heuristic syllable count: Σ over `[A-Za-z]+` words of
    * max(1, #maximal-vowel-group runs `[aeiouyAEIOUY]+` in the word)
    * — the classic Flesch-family approximation (every vowel cluster
    * is one nucleus; consonant-only tokens still cost one syllable).
    * Integer, regex-only. */
  def syllableCount(text: Column): Column =
    coalesce(aggregate(
      regexp_extract_all(text, lit("[A-Za-z]+"), lit(0)),
      lit(0L),
      (acc, w) => acc +
        greatest(lit(1), size(regexp_extract_all(w, lit("[aeiouyAEIOUY]+"), lit(0)))).cast("long")),
      lit(0L))

  /** Heuristic document quality score in [0,1]:
    * 0.4·min(1, n_tokens/50) + 0.3·(1 − punct_ratio) + 0.3·stop_ratio.
    * The shape a pretraining-data quality filter uses (length prior,
    * punctuation sanity, function-word rate). */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val n = size(t).cast("double")
    val stopRatio = tokensIn(t, StopEn).cast("double") / n
    val punctRatio = punctCount(text).cast("double") / length(text).cast("double")
    // empty documents score 0.0, not NaN (0/0 division guard)
    when(length(text) === 0, lit(0.0)).otherwise(
      lit(0.4) * least(lit(1.0), n / lit(50.0)) +
        lit(0.3) * (lit(1.0) - punctRatio) +
        lit(0.3) * stopRatio)
  }
}
