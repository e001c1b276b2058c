package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Knn

/** Reference-parity vector queries (SURVEY.md §2 ops 1-8, 15-17).
  * Each mirrors a public function of the reference; citations inline. */
object VectorQueries {

  val Dim = 64 // embeddings.parquet vector dimensionality (all sf)

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Brute-force exact k-NN (ref `src/lib.rs:74-97` via `:344-347`),
    * incl. the self-query invariant (`src/lib.rs:546-549`). */
  def qKnnExact(s: SparkSession, dir: String): DataFrame =
    Knn.searchKnnById(emb(s, dir), qid = 0L, k = 10)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))

  /** Mutual k-NN pairs over a bounded candidate pool
    * ([[graft.operators.Knn.mutualKnn]] — reciprocal-NN seeds for
    * semantic clustering: (a,b) survives iff each is in the other's
    * top-k; the pool here is the vec_id%4 sample, the operator's
    * bounded-pool contract). The oracle replays both directed top-4
    * lists and the reciprocity join exactly. */
  def qKnnMutual(s: SparkSession, dir: String): DataFrame =
    Knn.mutualKnn(emb(s, dir).filter(col("vec_id") % 4 === 0), k = 4)
      .select(col("a"), col("b"), round(col("dist"), 3).as("dist"))
      .orderBy("a", "b")

  /** Same top-k under cosine distance (ref kernel `src/lib.rs:32-47`).
    * `+ 0.0` normalizes IEEE -0.0 on the self-match row (1 - cos(v,v)
    * rounds to -0.0 in DuckDB, +0.0 in Spark) — same fix as
    * qCosineKernel. */
  def qKnnCosine(s: SparkSession, dir: String): DataFrame =
    Knn.searchKnnById(emb(s, dir), qid = 0L, k = 10, metric = Knn.Cosine)
      .select(col("vec_id"), (round(col("dist"), 4) + lit(0.0)).as("dist"))

  /** L2² kernel over the whole table (ref `src/lib.rs:28-30`). */
  def qL2Kernel(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === 1L).select(col("embedding").as("__qv"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"), round(l2SqNative(col("embedding"), col("__qv")), 3).as("dist"))
      .orderBy("vec_id")
  }

  /** Cosine kernel incl. the zero-vector guard (ref `src/lib.rs:43-45`):
    * `cos_zero` pins the guard — cosine against an all-zero vector is
    * defined as 0.0, never NaN. */
  def qCosineKernel(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === 1L).select(col("embedding").as("__qv"))
    val zero = array_repeat(lit(0.0f), Dim)
    // `+ 0.0` normalizes IEEE negative zero: round(-1e-7) yields -0.0
    // in DuckDB but +0.0 in Spark, and the driver compares stringified
    // values
    e.crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        (round(cosineNative(col("embedding"), col("__qv")), 4) + lit(0.0)).as("cos_sim"),
        round(cosineNative(col("embedding"), zero), 4).as("cos_zero"))
      .orderBy("vec_id")
  }

  /** Multi-query k-NN join: 8 query vectors × corpus, top-5 each
    * (SURVEY §7.2 M1 — the batch-serving shape). */
  def qKnnMulti(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    Knn.knnJoin(e, queries, k = 5)
      .select(col("qid"), col("rank").as("rnk"), col("vec_id"), round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Batch-serving throughput shape: a FIXED batch of 128 queries
    * (every 4th vector among ids < 512) against the whole corpus,
    * top-5 each — scheduling overhead amortizes across the batch,
    * which is how this engine replaces the reference's point-query
    * loop. The batch size is capped independently of the corpus so the
    * benched shape IS the serving shape: work grows O(n) with the
    * corpus (scan side), never O(n²) (a query side that scaled with n
    * would quietly turn the demo quadratic at 100×). */
  def qKnnBatch(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(pmod(col("vec_id"), lit(4)) === 0 && col("vec_id") < 512)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    Knn.knnJoin(e, queries, k = 5)
      .select(col("qid"), col("rank").as("rnk"), col("vec_id"), round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Hybrid filtered search: metadata predicate + top-k in one plan —
    * the filter pushes into the scan (at scale: partition pruning on
    * the predicate column), then the bounded-heap top-k runs over the
    * surviving rows only. */
  def qKnnFiltered(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === 0L).select(col("embedding").as("__qv"))
    e.filter(col("label").isin(2, 5, 7))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), l2SqNative(col("embedding"), col("__qv")).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), round(col("d"), 3).as("dist"))
  }

  /** Radius (range) search: every vector within squared-L2 radius 2.0
    * of query vector 0 — scan + filter, no shuffle. */
  def qRangeSearch(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === 0L).select(col("embedding").as("__qv"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"), l2SqNative(col("embedding"), col("__qv")).as("d"))
      .filter(col("d") <= 2.0)
      .orderBy(col("d").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("d"), 3).as("dist"))
  }

  /** Truncated-dimension (Matryoshka-style) search: rank by L2² over
    * only the FIRST 16 of 64 dims — the coarse pass of
    * matryoshka-representation serving, where nested-prefix embeddings
    * let a pipeline scan 4× less vector data per candidate and refine
    * survivors at full width (Kusupati et al., "Matryoshka
    * Representation Learning", NeurIPS 2022). `slice` is a plain
    * column expression, so the projection prunes INSIDE the scan — at
    * 100 TB the truncated pass reads prefix bytes, not a second copy
    * of the corpus. The full-width refine of the truncated candidates
    * composes from the gated pieces (In(id) re-score, q_*_refined). */
  def qKnnTruncated(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
    val q = e.filter(col("vec_id") === 93L).select(col("embedding").as("__qv"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"), l2SqNative(col("embedding"), col("__qv")).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), round(col("d"), 3).as("dist"))
  }

  /** Diversity-aware top-k ([[graft.operators.Mmr.searchMmr]]): fetch
    * the 20 nearest to query 95, MMR-pick 5 at λ = 0.5 — the
    * dedup-at-serving shape retrieval pipelines run so the k results
    * aren't near-duplicates of each other. The oracle replays the
    * greedy selection as 5 unrolled SQL stages with the IDENTICAL
    * float expression tree (λ·(−d) − (1−λ)·max(−l2(c,s)), id-asc
    * ties), so pick order itself is under the hash gate. */
  def qMmr(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 95L)
      .select("embedding").head().getSeq[Float](0)
    graft.operators.Mmr.searchMmr(e, qv, k = 5, fetch = 20, lambda = 0.5)
      .select(col("rank").cast("int").as("rnk"), col("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("rnk")
  }

  /** Greedy k-center coreset ([[graft.operators.Coreset.kCenter]] —
    * Gonzalez farthest-point traversal over a bounded id-ordered pool:
    * seed = smallest id, each round the point farthest from the
    * selected set, ascending-id ties; the emitted radius sequence is
    * the 2-approximation's own quality floor). The oracle unrolls all
    * 8 picks; min over centers is order-free, so the float replay is
    * exact at any parallelism. */
  def qKCenter(s: SparkSession, dir: String): DataFrame =
    graft.operators.Coreset.kCenter(
      emb(s, dir).filter(col("vec_id") < 200L), k = 8, fetch = 200)

  /** Unrolled k-center oracle: stage i takes the max min-distance to
    * sel{i-1} (id-asc tie). */
  private def kCenterOracleSql(k: Int, bound: Long, fetch: Int): String = {
    val stages = (2 to k).map { i =>
      s"""sc$i AS MATERIALIZED (SELECT c.vec_id, min(${l2Sql("c.embedding", "s.embedding")}) AS md
         |  FROM pool c CROSS JOIN sel${i - 1} s
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
         |  GROUP BY c.vec_id),
         |p$i AS MATERIALIZED (SELECT vec_id, md AS r FROM sc$i ORDER BY md DESC, vec_id LIMIT 1),
         |sel$i AS MATERIALIZED (SELECT vec_id, embedding FROM sel${i - 1}
         |          UNION ALL
         |          SELECT c.vec_id, c.embedding FROM pool c JOIN p$i USING (vec_id))""".stripMargin
    }.mkString(",\n")
    val ranks = (1 to k)
      .map(i => s"SELECT $i AS rnk, vec_id, r FROM p$i")
      .mkString("\n UNION ALL\n ")
    s"""WITH pool AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
       |              WHERE vec_id < $bound ORDER BY vec_id LIMIT $fetch),
       |sel1 AS MATERIALIZED (SELECT vec_id, embedding FROM pool ORDER BY vec_id LIMIT 1),
       |p1 AS MATERIALIZED (SELECT vec_id, 0.0 AS r FROM sel1),
       |$stages
       |SELECT CAST(rnk AS INT) AS rnk, vec_id, round(r, 3) AS radius
       |FROM ($ranks) ORDER BY rnk""".stripMargin
  }

  /** Unrolled-greedy MMR oracle: stage i scores the unpicked
    * candidates against the selected set and picks the max-m (id-asc
    * tie) row — the same expression tree the driver-side greedy
    * evaluates. */
  private def mmrOracleSql(qid: Long, k: Int, fetch: Int): String = {
    val stages = (2 to k).map { i =>
      s"""sc$i AS (SELECT c.vec_id,
         |  0.5 * (-c.d) - 0.5 * max(-(${l2Sql("c.embedding", "s.embedding")})) AS m, c.d AS d
         |  FROM cand c CROSS JOIN sel${i - 1} s
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
         |  GROUP BY c.vec_id, c.d),
         |p$i AS (SELECT vec_id, d FROM sc$i ORDER BY m DESC, vec_id LIMIT 1),
         |sel$i AS (SELECT vec_id, embedding FROM sel${i - 1}
         |          UNION ALL
         |          SELECT c.vec_id, c.embedding FROM cand c JOIN p$i USING (vec_id))""".stripMargin
    }.mkString(",\n")
    val ranks = (1 to k)
      .map(i => s"SELECT $i AS rnk, vec_id, d FROM p$i")
      .mkString("\n UNION ALL\n ")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $qid),
       |cand AS (SELECT e.vec_id, e.embedding, ${l2Sql("e.embedding", "q.qv")} AS d
       |         FROM embeddings e CROSS JOIN q
       |         ORDER BY d, e.vec_id LIMIT $fetch),
       |sc1 AS (SELECT vec_id, 0.5 * (-d) AS m, d FROM cand),
       |p1 AS (SELECT vec_id, d FROM sc1 ORDER BY m DESC, vec_id LIMIT 1),
       |sel1 AS (SELECT c.vec_id, c.embedding FROM cand c JOIN p1 USING (vec_id)),
       |$stages
       |SELECT CAST(rnk AS INT) AS rnk, vec_id, round(d, 3) AS dist
       |FROM ($ranks) ORDER BY rnk""".stripMargin
  }

  /** Ingest validation + len (ref `src/lib.rs:62-69` dimension check,
    * `src/disk_store.rs:22-27` size check, `src/lib.rs:350-352` len). */
  def qValidate(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).agg(
      count(lit(1)).as("n_rows"),
      count(when(hasDim(col("embedding"), Dim), 1)).as("n_valid"),
      count(when(!hasDim(col("embedding"), Dim), 1)).as("n_invalid"))

  // ---- DuckDB oracle fragments --------------------------------------

  private val l2SqlAB =
    "list_sum(list_transform(list_zip(%s, %s), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))^2))"
  def l2Sql(a: String, b: String): String = l2SqlAB.format(a, b)
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
  def cosSql(a: String, b: String): String =
    s"""(CASE WHEN sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE)^2))) = 0
       |        OR sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE)^2))) = 0
       |   THEN 0.0
       |   ELSE list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       |        / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE)^2)))
       |           * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE)^2))))
       |   END)""".stripMargin.replaceAll("\\s+", " ")

  /** ColBERT-style late-interaction retrieval: documents and queries
    * are SETS of vectors (4 consecutive fixture vectors per set), top-5
    * docs by MaxSim — every query vector's best-matching doc vector,
    * summed decimal-exact. The oracle replays the nested-loop scoring,
    * both aggregates, and the (score DESC, doc_id) ranking. */
  def qMaxsim(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val dv = e.select(expr("vec_id div 4").as("doc_id"), col("embedding").as("vec"))
    val qv = e.filter(col("vec_id") < 8)
      .select(expr("vec_id div 4").as("qid"), col("vec_id").as("q_ord"),
        col("embedding").as("qv"))
    graft.operators.LateInteraction.maxSimJoin(dv, qv, k = 5)
      .select(col("qid"), col("rank"), col("doc_id"),
        round(col("score"), 3).as("score"))
      .orderBy("qid", "rank")
  }

  /** Exact-MaxSim oracle, shared by the exact arm AND the routed arm
    * at exhaustive probes (with every cell probed, every document is
    * a candidate, so routed ≡ exact — the equality the gate pins). */
  private val maxsimOracleSql =
    s"""WITH dv AS (SELECT vec_id // 4 AS doc_id, embedding FROM embeddings),
       |qv AS (SELECT vec_id // 4 AS qid, vec_id AS q_ord, embedding AS qe
       |       FROM embeddings WHERE vec_id < 8),
       |m AS (SELECT qv.qid, dv.doc_id, qv.q_ord,
       |        max(${dotSql("dv.embedding", "qv.qe")}) AS mx
       |      FROM dv CROSS JOIN qv GROUP BY 1, 2, 3),
       |sc AS (SELECT qid, doc_id,
       |         CAST(sum(CAST(mx AS DECIMAL(25,10))) AS DOUBLE) AS score
       |       FROM m GROUP BY 1, 2),
       |r AS (SELECT qid, doc_id, score,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
       |      FROM sc)
       |SELECT qid, CAST(rnk AS INT) AS rank, doc_id, round(score, 3) AS score
       |FROM r WHERE rnk <= 5 ORDER BY qid, rank""".stripMargin

  /** The ROUTED MaxSim serving arm at exhaustive probes (VERDICT r10
    * item #1): a trained doc-vector coarse quantizer generates
    * candidates (probed-cell inverted listing → (qid, doc) pairs),
    * then exact MaxSim runs over the In(doc_id)-pruned candidates.
    * With nprobe = k(router) every doc is a candidate, so the routed
    * pipeline — train, listing, probe, prune, re-score — must
    * reproduce the exact arm bit-for-bit against the SAME oracle;
    * production-nprobe recall is RecallSpec's floor. */
  private val maxsimRouterMemo =
    new IndexQueries.SessionMemo[(graft.index.IvfIndex.Model, DataFrame)]

  def qMaxsimRouted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val dv = e.select(expr("vec_id div 4").as("doc_id"), col("embedding").as("vec"))
    val qv = e.filter(col("vec_id") < 8)
      .select(expr("vec_id div 4").as("qid"), col("vec_id").as("q_ord"),
        col("embedding").as("qv"))
    // router + inverted listing are BUILD-TIME artifacts (persisted
    // beside the corpus in a deployment) — memoized per session like
    // every other trained model in this file; serving is what runs
    val (router, cells) = maxsimRouterMemo.get(s, dir) {
      val m = graft.index.IvfIndex.train(e, k = 8, iters = 1)
      val listing = graft.operators.LateInteraction.docCellListing(dv, m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      listing.count()
      (m, listing)
    }
    graft.operators.LateInteraction
      .maxSimRouted(dv, cells, qv, k = 5, router, nprobe = 8)
      .select(col("qid"), col("rank"), col("doc_id"),
        round(col("score"), 3).as("score"))
      .orderBy("qid", "rank")
  }

  private val maxsimSelMemo =
    new IndexQueries.SessionMemo[(graft.index.IvfIndex.Model, DataFrame)]

  /** Routed MaxSim at SELECTIVE probes (nprobe=2 of 16 trained cells
    * per query vector): the oracle replays the ROUTED semantics end
    * to end — the 1-iteration k-means router (the q_vectordb_search
    * machinery), per-query-vector probe selection, the doc-cell
    * inverted listing, the (qid, doc) candidate union, and exact
    * MaxSim over only the candidates — so the pruning path itself is
    * hash-pinned, not just its exhaustive-probe degenerate case. */
  def qMaxsimRoutedSelective(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val dv = e.select(expr("vec_id div 4").as("doc_id"), col("embedding").as("vec"))
    val qv = e.filter(col("vec_id") < 8)
      .select(expr("vec_id div 4").as("qid"), col("vec_id").as("q_ord"),
        col("embedding").as("qv"))
    val (router, cells) = maxsimSelMemo.get(s, dir) {
      val m = graft.index.IvfIndex.train(e, k = 16, iters = 1)
      val listing = graft.operators.LateInteraction.docCellListing(dv, m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      listing.count()
      (m, listing)
    }
    graft.operators.LateInteraction
      .maxSimRouted(dv, cells, qv, k = 5, router, nprobe = 2)
      .select(col("qid"), col("rank"), col("doc_id"),
        round(col("score"), 3).as("score"))
      .orderBy("qid", "rank")
  }

  private val maxsimRoutedSelectiveOracleSql: String =
    s"""WITH qv AS (SELECT vec_id // 4 AS qid, vec_id AS q_ord, embedding AS qe
       |            FROM embeddings WHERE vec_id < 8),
       |${IndexQueries.trainedCellsSqlFrom("embeddings")},
       |cd AS (SELECT qv.qid, qv.q_ord, c.cell,
       |         sum((c.m - CAST(qv.qe[c.i] AS DOUBLE))^2) AS d
       |       FROM c1 c, qv GROUP BY 1, 2, 3),
       |probes AS (SELECT qid, cell FROM
       |             (SELECT qid, q_ord, cell,
       |                row_number() OVER (PARTITION BY q_ord ORDER BY d, cell) AS rn
       |              FROM cd) WHERE rn <= 2),
       |qprobes AS (SELECT DISTINCT qid, cell FROM probes),
       |dcells AS (SELECT DISTINCT vec_id // 4 AS doc_id, cell FROM a1),
       |cand AS (SELECT DISTINCT qp.qid, dc.doc_id
       |         FROM qprobes qp JOIN dcells dc ON dc.cell = qp.cell),
       |dvv AS (SELECT vec_id // 4 AS doc_id, embedding FROM embeddings),
       |m AS (SELECT qv.qid, dv.doc_id, qv.q_ord,
       |        max(${dotSql("dv.embedding", "qv.qe")}) AS mx
       |      FROM dvv dv
       |      JOIN cand ON cand.doc_id = dv.doc_id
       |      JOIN qv ON qv.qid = cand.qid
       |      GROUP BY 1, 2, 3),
       |sc AS (SELECT qid, doc_id,
       |         CAST(sum(CAST(mx AS DECIMAL(25,10))) AS DOUBLE) AS score
       |       FROM m GROUP BY 1, 2),
       |r AS (SELECT qid, doc_id, score,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
       |      FROM sc)
       |SELECT qid, CAST(rnk AS INT) AS rank, doc_id, round(score, 3) AS score
       |FROM r WHERE rnk <= 5 ORDER BY qid, rank""".stripMargin

  /** Exact embedding covariance census
    * ([[graft.index.Pca.covariance]] — the profiling pass feeding the
    * PCA/OPQ rotation): all 2080 upper-triangle entries from the
    * integer-unit census (floor(x_i·x_j·1e12) longs — the PageRank
    * exactness convention, O(d²) per-task state, nothing explodes
    * per row). The oracle replays every census term and the
    * covariance assembly arithmetic. */
  def qEmbedCov(s: SparkSession, dir: String): DataFrame =
    graft.index.Pca.covariance(emb(s, dir), col("embedding"), Dim)

  /** Embedding centroid-drift census
    * ([[graft.operators.Profile.centroidDrift]] — the embedding-space
    * drift monitor beside KS/PSI: per label, the cosine of the label
    * centroid against the global centroid, from exactly-mergeable
    * integer-unit dimension sums). */
  def qEmbedDrift(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.centroidDrift(
      emb(s, dir), col("label"), col("embedding"))
      .orderBy("group")

  /** Embedding anisotropy census — the representation-collapse
    * diagnostic (Ethayarajh, EMNLP 2019 shape: how much of the
    * average vector energy sits in the common mean direction):
    * anisotropy = ‖mean vector‖² / mean ‖x‖², ~0 for isotropic
    * embeddings, →1 when the space collapses. Two map-side-combined
    * aggregates (per-dim decimal-exact sums over a posexplode; per-row
    * HOF norm² summed in the decimal convention), the cross-dim
    * assembly in floor-1e12 integer units so the 64-term sum is
    * order-exact. One row out — a monitoring gauge, not a table. */
  def qEmbedAnisotropy(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val dims = e.select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(sum(col("x").cast("decimal(18,12)")).as("sx"), count(lit(1)).as("n"))
      .select((col("sx").cast("double") / col("n")).as("m"), col("n"))
    val mv = dims
      .agg(max(col("n")).as("n_vectors"),
        (sum(floor(col("m") * col("m") * lit(1e12))).cast("double") / lit(1e12))
          .as("mean_vec_norm_sq"))
    val ms = e.select(
        aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double"))
          .cast("decimal(18,6)").as("nsq"))
      .agg((sum(col("nsq")).cast("double") / count(lit(1))).as("mean_norm_sq"))
    mv.crossJoin(ms)
      .select(col("n_vectors"),
        round(col("mean_norm_sq"), 6).as("mean_norm_sq"),
        round(col("mean_vec_norm_sq"), 6).as("mean_vec_norm_sq"),
        round(col("mean_vec_norm_sq") / col("mean_norm_sq"), 6).as("anisotropy"))
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_embed_anisotropy", qEmbedAnisotropy, Some(
      """WITH d AS (SELECT u.i AS pos,
        |         CAST(sum(CAST(e.embedding[u.i] AS DECIMAL(18,12))) AS DOUBLE) AS sx,
        |         count(*) AS n
        |       FROM embeddings e, unnest(range(1, 65)) AS u(i) GROUP BY u.i),
        |mv AS (SELECT max(n) AS n_vectors,
        |         CAST(sum(CAST(floor((sx / n) * (sx / n) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12
        |           AS mean_vec_norm_sq
        |       FROM d),
        |ms AS (SELECT CAST(sum(CAST(list_sum(list_transform(embedding,
        |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DECIMAL(18,6)))
        |              AS DOUBLE) / count(*) AS mean_norm_sq
        |       FROM embeddings)
        |SELECT n_vectors, round(mean_norm_sq, 6) AS mean_norm_sq,
        |  round(mean_vec_norm_sq, 6) AS mean_vec_norm_sq,
        |  round(mean_vec_norm_sq / mean_norm_sq, 6) AS anisotropy
        |FROM mv CROSS JOIN ms""".stripMargin)),
    QueryDef("q_embed_drift", qEmbedDrift, Some(
      """WITH e AS (SELECT CAST(label AS VARCHAR) AS g, u.i AS dim,
        |             CAST(embedding[u.i] AS DOUBLE) AS v
        |           FROM embeddings CROSS JOIN unnest(range(1, len(embedding) + 1)) AS u(i)
        |           WHERE label IS NOT NULL),
        |s AS (SELECT g, dim,
        |        CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS DECIMAL(18,6)) * 1000000
        |             AS BIGINT) AS u
        |      FROM e GROUP BY 1, 2),
        |gt AS (SELECT dim, CAST(sum(u) AS BIGINT) AS ut FROM s GROUP BY 1),
        |cnt AS (SELECT CAST(label AS VARCHAR) AS g, CAST(count(*) AS BIGINT) AS n_vecs
        |        FROM embeddings WHERE label IS NOT NULL GROUP BY 1),
        |p AS (SELECT s.g,
        |        sum(CAST(s.u AS HUGEINT) * gt.ut) AS dot,
        |        sum(CAST(s.u AS HUGEINT) * s.u) AS ng,
        |        sum(CAST(gt.ut AS HUGEINT) * gt.ut) AS nt
        |      FROM s JOIN gt USING (dim) GROUP BY 1)
        |SELECT p.g AS "group", cnt.n_vecs,
        |  CASE WHEN ng = 0 OR nt = 0 THEN 0.0
        |       ELSE round(CAST(dot AS DOUBLE)
        |                  / (sqrt(CAST(ng AS DOUBLE)) * sqrt(CAST(nt AS DOUBLE))), 4)
        |  END AS cos_to_global
        |FROM p JOIN cnt USING (g) ORDER BY 1""".stripMargin)),
    QueryDef("q_embed_cov", qEmbedCov, Some(
      """WITH x AS (SELECT embedding AS e FROM embeddings),
        |nn AS (SELECT count(*) AS n FROM x),
        |ij AS (SELECT a.i AS i, b.j AS j
        |       FROM (SELECT unnest(range(1, 65)) AS i) a
        |       CROSS JOIN (SELECT unnest(range(1, 65)) AS j) b
        |       WHERE a.i <= b.j),
        |s2 AS (SELECT i, j,
        |         sum(CAST(floor(CAST(e[i] AS DOUBLE) * CAST(e[j] AS DOUBLE) * 1e12) AS BIGINT)) AS s
        |       FROM x CROSS JOIN ij GROUP BY i, j),
        |s1 AS (SELECT i,
        |         sum(CAST(floor(CAST(e[i] AS DOUBLE) * 1e12) AS BIGINT)) AS s
        |       FROM x CROSS JOIN (SELECT unnest(range(1, 65)) AS i) dd GROUP BY i)
        |SELECT CAST(s2.i AS INT) AS i, CAST(s2.j AS INT) AS j,
        |  floor(((CAST(s2.s AS DOUBLE) / 1e12) / nn.n
        |    - (CAST(a.s AS DOUBLE) / 1e12 / nn.n) * (CAST(b.s AS DOUBLE) / 1e12 / nn.n)) * 1e12) / 1e12 AS cov
        |FROM s2 CROSS JOIN nn JOIN s1 a ON s2.i = a.i JOIN s1 b ON s2.j = b.i
        |ORDER BY i, j""".stripMargin)),
    QueryDef("q_maxsim", qMaxsim, Some(maxsimOracleSql)),
    QueryDef("q_maxsim_routed", qMaxsimRouted, Some(maxsimOracleSql)),
    QueryDef("q_maxsim_routed_selective", qMaxsimRoutedSelective,
      Some(maxsimRoutedSelectiveOracleSql)),
    QueryDef("q_mmr", qMmr, Some(mmrOracleSql(95L, k = 5, fetch = 20))),
    QueryDef("q_kcenter", qKCenter, Some(kCenterOracleSql(k = 8, bound = 200L, fetch = 200))),
    QueryDef("q_knn_truncated", qKnnTruncated, Some(
      s"""WITH t AS (SELECT vec_id, embedding[1:16] AS embedding FROM embeddings),
         |q AS (SELECT embedding AS qv FROM t WHERE vec_id = 93)
         |SELECT e.vec_id, round(${l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM t e CROSS JOIN q
         |ORDER BY ${l2Sql("e.embedding", "q.qv")}, e.vec_id LIMIT 10""".stripMargin)),
    QueryDef("q_knn_exact", qKnnExact, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, round(${l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM embeddings e CROSS JOIN q
         |ORDER BY ${l2Sql("e.embedding", "q.qv")}, e.vec_id LIMIT 10""".stripMargin)),
    QueryDef("q_knn_mutual", qKnnMutual, Some(
      s"""WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0),
         |d AS (SELECT x.vec_id AS src, y.vec_id AS dst,
         |        ${l2Sql("x.embedding", "y.embedding")} AS dist
         |      FROM s x JOIN s y ON x.vec_id <> y.vec_id),
         |r AS (SELECT src, dst, dist,
         |        row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn FROM d),
         |e AS (SELECT src, dst, dist FROM r WHERE rn <= 4)
         |SELECT e.src AS a, e.dst AS b, round(e.dist, 3) AS dist
         |FROM e WHERE e.src < e.dst
         |  AND EXISTS (SELECT 1 FROM e m WHERE m.src = e.dst AND m.dst = e.src)
         |ORDER BY 1, 2""".stripMargin)),
    QueryDef("q_knn_cosine", qKnnCosine, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |scored AS (SELECT e.vec_id, 1.0 - ${cosSql("e.embedding", "q.qv")} AS d
         |           FROM embeddings e CROSS JOIN q)
         |SELECT vec_id, round(d, 4) + CAST(0.0 AS DOUBLE) AS dist FROM scored
         |ORDER BY d, vec_id LIMIT 10""".stripMargin)),
    QueryDef("q_l2_kernel", qL2Kernel, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
         |SELECT e.vec_id, round(${l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM embeddings e CROSS JOIN q ORDER BY e.vec_id""".stripMargin)),
    QueryDef("q_cosine_kernel", qCosineKernel, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
         |SELECT e.vec_id,
         |  round(${cosSql("e.embedding", "q.qv")}, 4) + CAST(0.0 AS DOUBLE) AS cos_sim,
         |  CAST(0.0 AS DOUBLE) AS cos_zero
         |FROM embeddings e CROSS JOIN q ORDER BY e.vec_id""".stripMargin)),
    QueryDef("q_knn_multi", qKnnMulti, Some(
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
         |scored AS (SELECT q.qid, e.vec_id, ${l2Sql("e.embedding", "q.qv")} AS d
         |           FROM embeddings e CROSS JOIN q),
         |ranked AS (SELECT qid, vec_id, d,
         |                  row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rnk
         |           FROM scored)
         |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, round(d, 3) AS dist
         |FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),
    QueryDef("q_knn_batch", qKnnBatch, Some(
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |           WHERE vec_id % 4 = 0 AND vec_id < 512),
         |scored AS (SELECT q.qid, e.vec_id, ${l2Sql("e.embedding", "q.qv")} AS d
         |           FROM embeddings e CROSS JOIN q),
         |ranked AS (SELECT qid, vec_id, d,
         |                  row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rnk
         |           FROM scored)
         |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, round(d, 3) AS dist
         |FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),
    QueryDef("q_knn_filtered", qKnnFiltered, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, round(${l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM embeddings e CROSS JOIN q
         |WHERE e.label IN (2, 5, 7)
         |ORDER BY ${l2Sql("e.embedding", "q.qv")}, e.vec_id LIMIT 10""".stripMargin)),
    QueryDef("q_range_search", qRangeSearch, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, round(${l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM embeddings e CROSS JOIN q
         |WHERE ${l2Sql("e.embedding", "q.qv")} <= 2.0
         |ORDER BY ${l2Sql("e.embedding", "q.qv")}, e.vec_id""".stripMargin)),
    QueryDef("q_validate", qValidate, Some(
      s"""SELECT count(*) AS n_rows,
         |       count(*) FILTER (WHERE len(embedding) = $Dim) AS n_valid,
         |       count(*) FILTER (WHERE len(embedding) != $Dim OR embedding IS NULL) AS n_invalid
         |FROM embeddings""".stripMargin)),
  )
}
