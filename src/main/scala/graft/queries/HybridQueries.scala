package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Bm25

/** Hybrid retrieval: BM25 lexical ranking fused with dense-vector
  * ranking by reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR
  * 2009: score = Σ 1/(60 + rank)) — the standard two-leg serving stack
  * wrapped around the reference's vector-only search
  * (`/root/reference/src/lib.rs:74-97`).
  *
  * Scale notes: both legs end in global bounded top-k (TakeOrdered,
  * never a full sort); the fusion joins two ≤ k-row lists — driver-
  * trivial at any corpus size. RRF operates on integer ranks, so the
  * fused scores are exact rationals — deterministic across engines by
  * construction (no float-accumulation hazard at the fusion step).
  */
object HybridQueries {

  /** Fixed query — terms for the lexical leg, embedding id 0 for the
    * dense leg (doc_id ≡ vec_id in the fixtures). */
  val Terms: Seq[String] = Seq("vector", "query", "merge", "spark")
  private val RrfK = 60

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** BM25-scored corpus for the fixed query, built once per session +
    * fixture ([[IndexQueries.SessionMemo]]) — the lexical analog of
    * the memoized ANN indexes: two consumers (the standalone ranking
    * and the hybrid fusion) read the same scored artifact. */
  private val bm25Memo = new IndexQueries.SessionMemo[DataFrame]
  private def bm25Scores(s: SparkSession, dir: String): DataFrame =
    bm25Memo.get(s, dir)(
      Bm25.score(docs(s, dir), Terms)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Lexical leg alone: top-10 documents by BM25. */
  def qBm25(s: SparkSession, dir: String): DataFrame =
    bm25Scores(s, dir)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(10)
      .select(col("doc_id"), round(col("score"), 6).as("score"))

  /** Both legs + RRF fusion: top-20 BM25 list, top-20 cosine list,
    * fused by Σ 1/(60 + rank) with absent-leg rank rendered −1. The
    * row_number windows run over the already-bounded 20-row lists. */
  def qHybridRrf(s: SparkSession, dir: String): DataFrame = {
    val lex = bm25Scores(s, dir)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id").asc)).as("lex_rnk"))

    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === 0L).select(col("embedding").as("__qv"))
    val vec = e.crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        cosineNative(col("embedding"), col("__qv")).as("c"))
      .orderBy(col("c").desc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), row_number()
        .over(Window.orderBy(col("c").desc, col("doc_id").asc)).as("vec_rnk"))

    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        coalesce(col("lex_rnk"), lit(-1)).as("lex_rnk"),
        coalesce(col("vec_rnk"), lit(-1)).as("vec_rnk"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("lex_rnk")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("vec_rnk")), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(10)
  }

  /** Positional phrase search ([[graft.operators.Phrase]]): every
    * (doc_id, 0-based token start) where the fixed 2-token phrase
    * occurs consecutively — the exact-match retrieval leg and the
    * verbatim-quote forensic. The oracle scans positions directly;
    * the engine runs the join-free ballot aggregate. */
  def qPhraseSearch(s: SparkSession, dir: String): DataFrame =
    graft.operators.Phrase.phraseMatches(docs(s, dir), Seq("table", "value"))
      .orderBy("doc_id", "start")

  // ---- DuckDB oracle fragments --------------------------------------

  /** BM25 CTE chain ending in bm(doc_id, score); expression shape
    * mirrors [[Bm25.score]] exactly (k1 = 1.2, b = 0.75 → the 2.2 /
    * 1.2 / 0.25 / 0.75 literals). CAST(2.2 AS DOUBLE) is load-bearing:
    * DuckDB keeps bigint × decimal-literal in DECIMAL, whose cast to
    * double differs from double × double in the last ulp. */
  private val bm25Sql =
    """dl AS (SELECT doc_id, len(string_split_regex(text, '\s+')) AS dl,
      |              string_split_regex(text, '\s+') AS tk FROM documents),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, dl, term, count(*) AS tf
      |       FROM (SELECT doc_id, dl, unnest(tk) AS term FROM dl)
      |       WHERE term IN ('vector', 'query', 'merge', 'spark')
      |       GROUP BY doc_id, dl, term),
      |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |contrib AS (SELECT tf.doc_id,
      |    CAST(ln((s.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
      |         * (tf.tf * CAST(2.2 AS DOUBLE))
      |         / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))
      |      AS DECIMAL(18,6)) AS c
      |  FROM tf JOIN dfq USING (term), stats s),
      |bm AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS score
      |       FROM contrib GROUP BY doc_id)""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_bm25", qBm25, Some(
      s"""WITH $bm25Sql
         |SELECT doc_id, round(score, 6) AS score FROM bm
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),
    QueryDef("q_hybrid_rrf", qHybridRrf, Some(
      s"""WITH $bm25Sql,
         |lexr AS (SELECT doc_id, CAST(rn AS INT) AS lex_rnk FROM
         |           (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
         |            FROM bm) WHERE rn <= 20),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vs AS (SELECT e.vec_id AS doc_id, ${VectorQueries.cosSql("e.embedding", "q.qv")} AS c
         |       FROM embeddings e, q),
         |vecr AS (SELECT doc_id, CAST(rn AS INT) AS vec_rnk FROM
         |           (SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS rn
         |            FROM vs) WHERE rn <= 20),
         |fused AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         |                 coalesce(l.lex_rnk, -1) AS lex_rnk,
         |                 coalesce(v.vec_rnk, -1) AS vec_rnk,
         |                 round(coalesce(1.0 / (60 + l.lex_rnk), 0.0)
         |                     + coalesce(1.0 / (60 + v.vec_rnk), 0.0), 6) AS rrf
         |          FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id)
         |SELECT doc_id, lex_rnk, vec_rnk, rrf FROM fused
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),
    QueryDef("q_phrase_search", qPhraseSearch, Some(
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents)
        |SELECT doc_id, CAST(i - 1 AS INT) AS start
        |FROM t, unnest(range(1, len(tk) + 1)) AS u(i)
        |WHERE i + 1 <= len(tk) AND tk[i] = 'table' AND tk[i+1] = 'value'
        |ORDER BY doc_id, start""".stripMargin)),
  )
}
