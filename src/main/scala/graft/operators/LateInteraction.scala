package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dotNative

/** Multi-vector late-interaction retrieval (ColBERT — Khattab &
  * Zaharia, SIGIR'20): query and document are each a SET of vectors,
  * and score(Q, D) = Σ_{q∈Q} max_{d∈D} q·d — every query vector picks
  * its best-matching document vector, softly aligning terms instead of
  * crushing the document into one embedding. (Extension — the
  * reference's data model is strictly one vector per row,
  * `/root/reference/src/lib.rs:22-26`.)
  *
  * Relational rendering: score the flat (doc_id, vec) × broadcast
  * (qid, q_ord, qv) nested-loop in the scan, then two map-side-combined
  * hash aggregates — max per (qid, doc_id, q_ord), sum per
  * (qid, doc_id) — and a bounded-heap top-k per query. The first
  * shuffle carries O(docs · |Q|) partially-maxed rows (not the scored
  * cross product), the last O(|queries| · k); document vectors never
  * co-group, so a 100 TB multi-vector corpus needs no
  * collect_list-per-doc stage.
  *
  * The per-query-vector maxes are exact comparisons; their sum goes
  * through the repo's DECIMAL cast so accumulation order cannot change
  * the score — the oracle replays the pipeline exactly.
  */
object LateInteraction {

  /** Top-k documents per query by MaxSim. `docVecs` rows are
    * (docId, vec); `queryVecs` rows are (qid, qOrd, qv) — the query
    * side is small by contract (it broadcasts). Ranking is by score
    * DESCENDING with doc-id tiebreak. Output: (qid, rank, doc_id,
    * score). */
  def maxSimJoin(
      docVecs: DataFrame,
      queryVecs: DataFrame,
      k: Int,
      docId: String = "doc_id",
      docVec: String = "vec",
      queryId: String = "qid",
      queryOrd: String = "q_ord",
      queryVec: String = "qv"): DataFrame = {
    val topk = TopK.topK(k)
    docVecs
      .crossJoin(broadcast(queryVecs))
      .select(col(queryId), col(docId), col(queryOrd),
        dotNative(col(docVec), col(queryVec)).as("__d"))
      .groupBy(col(queryId), col(docId), col(queryOrd))
      .agg(max(col("__d")).as("__mx"))
      .groupBy(col(queryId), col(docId))
      .agg(sum(col("__mx").cast("decimal(25,10)")).cast("double").as("__score"))
      .groupBy(col(queryId))
      .agg(topk(-col("__score"), col(docId)).as("hits"))
      .select(col(queryId), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(
        col(queryId),
        (col("pos") + 1).cast("int").as("rank"),
        col("hit._2").as(docId),
        (-col("hit._1")).as("score"))
  }
}
