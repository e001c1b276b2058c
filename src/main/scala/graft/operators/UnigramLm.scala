package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo, ACL 2018 — the SentencePiece
  * unigram model): the OTHER production tokenizer class beside BPE
  * ([[Bpe]] covers merge-based training; extension — the reference has
  * no text surface). A unigram tokenizer scores a segmentation as the
  * product of independent piece probabilities and trains by EM: the
  * E-step Viterbi-segments the word census under the current piece
  * probabilities, the M-step re-estimates piece probabilities from the
  * segmentation counts. This implementation is the standard
  * deterministic fixed-round simplification (Viterbi hard-EM over the
  * word census, substring-census seeding) — the same convergence
  * behaviour class with pinned, SQL-replayable semantics (the
  * synchronous-LPA / HNSW-level-hash deviation convention).
  *
  * Scale shape (100 TB): the ONLY corpus-scale stage is the word
  * census — one map-side-combined hash aggregate (the [[Bpe]]
  * contract). Seeding explodes SUBSTRINGS of the censused VOCABULARY
  * (≤ maxWordLen·maxPieceLen per distinct word — a bounded model-side
  * blowup, sub-linear in the corpus); the seed prunes to a bounded
  * piece set that COLLECTS and BROADCASTS (the IVF-centroid shape);
  * Viterbi then runs once per DISTINCT word over the broadcast model —
  * never once per corpus token. Encoding joins the word stream to the
  * vocabulary-sized (word → pieces) table, which broadcasts.
  *
  * Numeric convention: piece log-probabilities enter Viterbi as
  * INTEGER units `floor(ln(cnt/total) · 1e6)` (the NgramLm floored-ln
  * convention, integer-summed), so path scores compare exactly and the
  * argmax is engine-independent; score ties prefer the LONGER piece,
  * then the DP is position-deterministic. Training words are capped at
  * [[MaxWordLen]] characters (the SentencePiece
  * max_sentencepiece_length-style bound, applied to words — longer
  * words are out of the training contract on BOTH engines).
  */
object UnigramLm {

  /** Training word-length cap (characters). */
  val MaxWordLen = 10

  /** Maximum piece length (characters) — seed substrings and Viterbi
    * steps both honour it. */
  val MaxPieceLen = 4

  /** Log-prob unit scale: lp_units = floor(ln(p) · Scale). */
  val Scale = 1000000L

  /** `(word, cnt)` census of whitespace tokens of length 1..MaxWordLen
    * — the single corpus-scale aggregate. */
  def wordCensus(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(text, " ")).as("word"))
      .filter(length(col("word")) > 0 && length(col("word")) <= MaxWordLen)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** All substrings of length 1..MaxPieceLen as an array column. */
  private def substrings(word: Column): Column =
    flatten(transform(sequence(lit(1), length(word)), i =>
      transform(sequence(lit(1), least(lit(MaxPieceLen), length(word) - i + 1)),
        l => word.substr(i, l))))

  /** Seed vocabulary from the word census: the substring-occurrence
    * census weighted by word count, pruned to ALL single characters
    * (the coverage guarantee — every censused word stays segmentable)
    * plus the top `seedMulti` multi-character pieces by
    * (cnt DESC, piece ASC). Output: `(piece, cnt)`. */
  def seedVocab(census: DataFrame, seedMulti: Int): DataFrame = {
    require(seedMulti >= 1, s"seedMulti must be >= 1, got $seedMulti")
    val subs = census
      .select(explode(substrings(col("word"))).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum(col("cnt")).as("cnt"))
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(seedMulti)
    chars.unionByName(multi)
  }

  /** Integer log-prob units over a `(piece, cnt)` table:
    * `floor(ln(cnt / Σcnt) · Scale)` as a long. */
  def lpUnits(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum(col("cnt")).as("__t"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        floor(log(col("cnt").cast("double") / col("__t").cast("double"))
          * Scale.toDouble).cast("long").as("lp_units"))
  }

  /** [[segment]] as the public LOCAL point arm (single-word
    * tokenization is a serving call): Viterbi-segment one word under a
    * trained `(piece → lp_units)` model — the EXACT routine
    * [[segmentCensus]] broadcasts to executors, so the local and
    * distributed answers are identical by construction. */
  def encodeLocal(word: String, model: collection.Map[String, Long]): Seq[String] = {
    require(word.nonEmpty, "encodeLocal requires a non-empty word")
    segment(word, model).toSeq
  }

  /** Viterbi segmentation of one word under integer-unit piece
    * log-probs: maximize Σ lp_units over pieces (length ≤ MaxPieceLen);
    * score ties prefer the LONGER final piece at each position. The
    * model must cover the WORD (position n reachable) — guaranteed for
    * the seed (all single chars) and preserved by re-estimation (every
    * word's own previous-round pieces survive with positive count), so
    * a gap fails loudly as a contract violation. Interior positions
    * may legitimately be unreachable under a re-estimated model (a
    * dropped single char inside a surviving multi-char piece). */
  private[graft] def segment(word: String, lp: collection.Map[String, Long]): Array[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Long.MinValue)
    val back = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var p = 1
      val pMax = math.min(MaxPieceLen, i)
      while (p <= pMax) {
        if (best(i - p) != Long.MinValue) {
          val u = lp.getOrElse(word.substring(i - p, i), Long.MinValue)
          if (u != Long.MinValue) {
            val sc = best(i - p) + u
            if (sc > best(i) || (sc == best(i) && p > back(i))) {
              best(i) = sc
              back(i) = p
            }
          }
        }
        p += 1
      }
      i += 1
    }
    require(best(n) != Long.MinValue,
      s"unigram model cannot cover '$word' — the coverage contract " +
        "(seed chars / surviving previous-round pieces) was violated (stale model?)")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val p = back(pos)
      out += word.substring(pos - p, pos)
      pos -= p
    }
    out.reverseIterator.toArray
  }

  /** Viterbi-segment every censused word under a broadcast model:
    * `(word, cnt, pieces)` — one row per DISTINCT word (the bounded
    * vocabulary), never per corpus token. */
  def segmentCensus(census: DataFrame, model: Map[String, Long]): DataFrame = {
    val spark = census.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    census.select(col("word"), col("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => (w, c, segment(w, bc.value).toSeq) }
      .toDF("word", "cnt", "pieces")
  }

  /** Train: seed → `rounds` × (E: Viterbi over the census, M: piece
    * re-estimation). Returns the final `(piece, n)` piece census
    * (pieces the final segmentation never uses drop out — the
    * deterministic prune). The driver holds only the bounded model
    * (seed + per-round re-estimates). */
  def train(df: DataFrame, text: Column, seedMulti: Int = 200,
      rounds: Int = 1): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val census = wordCensus(df, text).localCheckpoint()
    var model: Map[String, Long] = lpUnits(seedVocab(census, seedMulti))
      .select(col("piece"), col("lp_units"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var counts: DataFrame = null
    for (_ <- 1 to rounds) {
      counts = segmentCensus(census, model)
        .select(explode(col("pieces")).as("piece"), col("cnt"))
        .groupBy("piece").agg(sum(col("cnt")).as("n"))
      if (rounds > 1)
        model = lpUnits(counts.withColumnRenamed("n", "cnt"))
          .select(col("piece"), col("lp_units"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    counts
  }

  /** Per-source coverage census under a trained segmentation — the
    * tokenizer-quality read ([[Bpe]]-coverage shape): for each source,
    * trainable words, emitted sub-tokens, characters, fertility
    * (subtoks/word) and compression (chars/subtok). The
    * (word → piece count) table is vocabulary-sized and BROADCASTS —
    * the corpus-scale word stream never shuffles on word. */
  def coverage(df: DataFrame, text: Column, sourceCol: Column,
      seedMulti: Int = 200): DataFrame = {
    val census = wordCensus(df, text).localCheckpoint()
    val model = lpUnits(seedVocab(census, seedMulti))
      .select(col("piece"), col("lp_units"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wordPieces = segmentCensus(census, model)
      .select(col("word"), size(col("pieces")).as("subtoks"))
    df.select(sourceCol.as("source"), explode(split(text, " ")).as("word"))
      .filter(length(col("word")) > 0 && length(col("word")) <= MaxWordLen)
      .join(broadcast(wordPieces), "word")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("subtoks").cast("long")).as("n_subtoks"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .select(col("source"), col("n_words"), col("n_subtoks"), col("n_chars"),
        round(col("n_subtoks").cast("double") / col("n_words").cast("double"), 4)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_subtoks").cast("double"), 4)
          .as("chars_per_subtok"))
  }
}
