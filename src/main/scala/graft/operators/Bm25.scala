package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Okapi BM25 lexical ranking (Robertson/Spärck Jones probabilistic
  * relevance framework; the ubiquitous `k1 = 1.2, b = 0.75` search
  * formulation with the log(1 + (N - df + 0.5)/(df + 0.5)) idf floor,
  * which never goes negative).
  *
  * The reference engine ranks purely by vector distance
  * (`/root/reference/src/lib.rs:74-97`); production retrieval pairs
  * that with a lexical scorer and fuses the two lists — this operator
  * supplies the lexical leg, [[graft.queries.HybridQueries]] the
  * fusion.
  *
  * Scale shape (100 TB corpus): tokenize + explode is narrow; the only
  * wide ops are the two hash aggregates — per-(doc, term) tf (combines
  * map-side) and per-term df over the *matched terms only* (|terms|
  * keys, a broadcast-size result joined back without a shuffle of the
  * corpus side). The corpus-level (N, avgdl) pair is a scalar
  * aggregate broadcast with the plan. Per-term contributions are cast
  * to exact decimals before the final per-doc sum so the score is
  * independent of partition/accumulation order — the repo-wide
  * oracle-determinism convention (see SparkEntry).
  */
object Bm25 {

  /** Per-document BM25 scores for `queryTerms` over `docs(doc_id,
    * text)`. Documents matching no term are absent (score 0 by
    * definition). Output: (doc_id, score). */
  def score(
      docs: DataFrame,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val dl = docs.select(col("doc_id"), size(toks).as("dl"), toks.as("toks"))

    // corpus stats: one scalar row, broadcast
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))

    // per-(doc, term) tf over the query terms only — the filter lands
    // before the shuffle, so the agg keys ≤ |docs| × |terms|
    val tf = dl
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms.map(lit(_)): _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // df per query term: ≤ |terms| rows, broadcast back
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))

    // idf * saturated-tf, in double (expression shape mirrored by the
    // DuckDB oracle), then exact-decimal per-doc sum
    val contrib =
      (log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
        .cast("decimal(18,6)")

    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), contrib.as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("double").as("score"))
  }

  /** Top-`k` documents by BM25 score (score desc, doc_id tiebreak) —
    * a global bounded top-k (TakeOrdered), not a full sort. */
  def topK(docs: DataFrame, queryTerms: Seq[String], k: Int): DataFrame =
    score(docs, queryTerms)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
}
