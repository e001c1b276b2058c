package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Positional phrase search — the inverted-index primitive BM25's
  * bag-of-words scoring cannot express: find documents where the query
  * tokens occur CONSECUTIVELY, and where. (The reference engine has no
  * lexical surface at all — `/root/reference/src/lib.rs:74-97` ranks
  * by vector distance only; this is the exact-match leg a retrieval
  * stack runs beside it, and the "find the verbatim quote" primitive
  * of contamination forensics.)
  *
  * Algorithm (join-free): one pass turns each token occurrence into
  * the phrase-start candidates it could support — a token at position
  * `p` matching phrase slot `i` votes for start `p − i` — then ONE
  * hash aggregate keeps the (doc, start) cells that collected all
  * `k` distinct slots. Repeated phrase terms work because a single
  * occurrence votes one ballot per slot it matches, and a start
  * qualifies only with k DISTINCT slots filled.
  *
  * Scale shape: tokenize + posexplode is narrow (map-only); the slot
  * filter drops every token not in the phrase BEFORE the only
  * shuffle, so the aggregate's input is O(occurrences of phrase
  * terms), not O(corpus tokens); keys are (doc_id, start) with ≤ k
  * rows each — no skew (a pathological all-phrase-terms doc still
  * contributes ≤ k ballots per position). No join, no window, no
  * broadcast. The phrase itself is a literal in the plan. */
object Phrase {

  /** All (doc_id, start) positions where `phrase` occurs consecutively
    * in the whitespace-token stream of `textCol`. `start` is the
    * 0-based token index of the first phrase token. */
  def phraseMatches(
      docs: DataFrame,
      phrase: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val k = phrase.length
    val phraseLit = array(phrase.map(lit(_)): _*)
    val ballots = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\\s+")).as(Seq("pos", "term")))
      // slots of the phrase this occurrence can fill (handles repeats)
      .select(col("doc_id"), col("pos"),
        explode(filter(sequence(lit(0), lit(k - 1)),
          i => element_at(phraseLit, i + 1) === col("term"))).as("slot"))
      .select(col("doc_id"), (col("pos") - col("slot")).as("start"), col("slot"))
      .filter(col("start") >= 0)
    ballots
      .groupBy("doc_id", "start")
      .agg(count_distinct(col("slot")).as("n_slots"))
      .filter(col("n_slots") === k)
      .select(col("doc_id"), col("start"))
  }

  /** Per-document phrase-match census: (doc_id, n_matches,
    * first_start) for documents containing the phrase at least once. */
  def phraseCensus(
      docs: DataFrame,
      phrase: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    phraseMatches(docs, phrase, idCol, textCol)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min(col("start")).as("first_start"))
}
