package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dotNative
import graft.index.IvfIndex

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
      queryVec: String = "qv"): DataFrame =
    rankTail(
      docVecs.crossJoin(broadcast(queryVecs)),
      k, docId, docVec, queryId, queryOrd, queryVec)

  /** The shared MaxSim scoring + ranking tail over pre-paired
    * (query, doc-vector) rows: per-(qid, doc, q_ord) max, decimal-
    * exact per-(qid, doc) sum, bounded-heap top-k per qid. */
  private def rankTail(paired: DataFrame, k: Int, docId: String,
      docVec: String, queryId: String, queryOrd: String,
      queryVec: String): DataFrame = {
    val topk = TopK.topK(k)
    paired
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

  /** Build-time inverted file for routed MaxSim: each document's set
    * of coarse cells (one map-only assignment pass over the doc
    * vectors, then a distinct on (doc_id, cell) — doc-granular, so
    * the listing is ≤ |docs|·min(|D|, cells) rows, far below the
    * vector count). Persist this cell-partitioned next to the corpus
    * so serving's candidate pass prunes to probed cells instead of
    * re-assigning 100 TB per batch. */
  def docCellListing(docVecs: DataFrame, router: IvfIndex.Model,
      docId: String = "doc_id", docVec: String = "vec"): DataFrame =
    docVecs
      .select(col(docId), IvfIndex.assignExpr(col(docVec), router).as("cell"))
      .distinct()

  /** Incremental inverted-listing maintenance — the add/remove story
    * for routed MaxSim serving: removed docs anti-join out of the
    * listing (broadcast — the removal batch is small by contract),
    * added docs' vectors assign through the SAME router (one map pass
    * over only the added vectors) and union in. The result equals a
    * fresh [[docCellListing]] over the updated corpus (spec-pinned)
    * without ever re-assigning the resident 100 TB. Whole-document
    * granularity: to mutate a doc, remove then re-add it. */
  def updateListing(listing: DataFrame, router: IvfIndex.Model,
      addedDocVecs: DataFrame, removedDocIds: DataFrame,
      docId: String = "doc_id", docVec: String = "vec"): DataFrame =
    listing
      .join(broadcast(removedDocIds.select(col(docId))), Seq(docId), "left_anti")
      .unionByName(docCellListing(addedDocVecs, router, docId, docVec))
      .distinct()

  /** Routed (pruned) MaxSim serving — the PLAID/ColBERTv2 candidate-
    * generation shape (Santhanam et al., NAACL'22) that closes the
    * exact arm's full-corpus-scan-per-batch cost, exactly as the
    * reference's HNSW closes its brute-force path
    * (`/root/reference/src/lib.rs:152-169` vs `:74-97`):
    *
    * 1. every query vector routes through the doc-vector coarse
    *    quantizer driver-side (the query batch is small by contract —
    *    it broadcasts in the exact arm too) and probes its `nprobe`
    *    nearest cells;
    * 2. a document becomes a CANDIDATE for a query when any of its
    *    vectors' cells is probed by any of that query's vectors —
    *    one probed-cell-pruned scan of the inverted `docCells`
    *    listing joined against the broadcast (qid, cell) probe pairs;
    * 3. exact MaxSim then runs ONLY over the candidate documents:
    *    their FULL vector sets (a doc's vectors outside probed cells
    *    still score — late interaction is per-query-vector max) re-read
    *    through an `In(doc_id)`-pruned scan that reaches the parquet
    *    source, against only their OWN candidate queries.
    *
    * At `nprobe = router.k` every document is a candidate and the
    * result is EXACTLY [[maxSimJoin]] (the oracle-gated config);
    * production nprobe trades the probed fraction for recall
    * (RecallSpec pins the floor). Candidate doc ids collect to the
    * driver for the pruning predicate — bounded by the probed cells'
    * doc listing, the same In(id) contract every refine arm uses.
    * Query ids must be long-castable.
    *
    * `adaptiveAlpha` applies the router's diminishing-returns probe
    * cutoff PER QUERY VECTOR ([[IvfIndex.Model.probeAdaptive]] — the
    * same knob the ANN arm serves): a vector deep inside a cluster
    * contributes 1-2 cells to the candidate union while a boundary
    * vector fans up to `nprobe`, trading a fixed probed fraction for
    * a per-vector-difficulty one. Adaptive probe sets are subsets of
    * the fixed-`nprobe` sets, so candidates only shrink (spec-pinned). */
  def maxSimRouted(
      docVecs: DataFrame,
      docCells: DataFrame,
      queryVecs: DataFrame,
      k: Int,
      router: IvfIndex.Model,
      nprobe: Int,
      adaptiveAlpha: Option[Double] = None,
      docId: String = "doc_id",
      docVec: String = "vec",
      queryId: String = "qid",
      queryOrd: String = "q_ord",
      queryVec: String = "qv"): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val spark = docVecs.sparkSession
    import spark.implicits._
    // 1. driver-side probe selection per query vector; a query's probe
    // set is the union over its vectors
    val qRows = queryVecs
      .select(col(queryId).cast("long"), col(queryVec).cast("array<float>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val probePairs = qRows
      .flatMap { case (qid, qv) =>
        val cells = adaptiveAlpha match {
          case Some(a) => router.probeAdaptive(qv, a, nprobe)
          case None    => router.probeOrder(qv).take(nprobe)
        }
        cells.map(qid -> _)
      }
      .distinct.toSeq.toDF(queryId, "cell")
    val probedCells = probePairs.select("cell").as[Int].collect().distinct.toSeq
    // 2. candidate (qid, doc) pairs from the probed slice of the
    // inverted listing — cell is a partition key on a saved layout,
    // so this scan reads only the probed subtrees. (Deliberately NOT
    // persisted: the candidate frame is one pruned listing scan + a
    // broadcast join, cheap to recompute, and an uncached lazy result
    // keeps the returned plan inspectable and leaves nothing pinned
    // in a long-lived session.)
    val cand = docCells
      .filter(col("cell").isin(probedCells: _*))
      .join(broadcast(probePairs), "cell")
      .select(col(queryId), col(docId)).distinct()
    val candIds = cand.select(col(docId)).distinct()
      .collect().map(_.get(0)).toSeq
    // 3. exact MaxSim over the In(doc_id)-pruned corpus, each doc
    // scored against its own candidate queries only
    rankTail(
      docVecs
        .filter(col(docId).isin(candIds: _*))
        .join(broadcast(cand), Seq(docId))
        .join(broadcast(queryVecs.withColumn(queryId, col(queryId).cast("long"))),
          Seq(queryId)),
      k, docId, docVec, queryId, queryOrd, queryVec)
  }
}
