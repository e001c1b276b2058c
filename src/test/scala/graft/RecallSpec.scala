package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{HnswIndex, HnswParams, IvfIndex}
import graft.operators.Knn

/** Production-config recall FLOORS (VERDICT r6 item #5): the
  * oracle-gated queries pin ef/nprobe at exhaustive settings, and
  * [[RecallCurve]] only REPORTS the production tradeoff — so before
  * this spec, a refactor that silently degraded production recall
  * (a beam bug that only bites under candidate pressure, a router
  * regression) would change BASELINE.md numbers without failing
  * anything. These assertions pin the measured round-6 curve
  * (BASELINE.md: single graph ef=16 → 0.987, routed 16 trained cells
  * nprobe=8 → 0.869) with a small margin, on the same fixture and
  * query set the table is measured on (sf0.1: n=2000, 64 queries). */
class RecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.1"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val P = HnswParams(m = 16, efConstruction = 32)
  private val K = 10
  private val NQueries = 64

  private lazy val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  private lazy val queries = e.filter(col("vec_id") < NQueries)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))
  /** Exact top-10 ids per qid — the ground truth both floors score
    * against (same construction as RecallCurve's). */
  private lazy val exact: Map[Long, Set[Long]] =
    Knn.knnJoin(e, queries, K)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private def recallOf(hits: org.apache.spark.sql.DataFrame): Double = {
    val ann = hits.select("qid", "vector_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    exact.keys.toSeq.map(q => ann.getOrElse(q, Set.empty).intersect(exact(q)).size / K.toDouble)
      .sum / exact.size
  }

  test("single-graph beam at production ef=16 holds recall@10 >= 0.98 (measured 0.987)") {
    val one = HnswIndex.build(e.withColumn("part", lit(0)), P)
    val r = recallOf(HnswIndex.search(one, queries, K, P, efSearch = 16))
    assert(r >= 0.98, s"production-ef beam recall regressed: $r (floor 0.98, measured 0.987)")
  }

  test("dot-metric handle at production nprobe=8/ef=64 holds recall@10 vs exact MIPS") {
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexIvf(numCells = 16, iters = 3, metric = Knn.Dot)
    db.nprobe = 8
    db.efSearch = 64
    val ann = db.searchBatch(queries, K)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exactDot = Knn.knnJoin(e, queries, K, metric = Knn.Dot)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val r = exactDot.keys.toSeq
      .map(q => ann.getOrElse(q, Set.empty).intersect(exactDot(q)).size / K.toDouble)
      .sum / exactDot.size
    assert(r >= 0.85, s"dot-serving production recall regressed: $r (floor 0.85)")
  }

  /** Recall of a handle's batch serving vs the exact L2 ground truth
    * (handles emit the id under `vec_id`; index-level search emits
    * `vector_id` — see [[recallOf]]). */
  private def handleRecall(db: VectorDB, refined: Boolean): Double = {
    val hits = (if (refined) db.searchBatchRefined(queries, K, refine = 4)
                else db.searchBatch(queries, K))
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    exact.keys.toSeq
      .map(q => hits.getOrElse(q, Set.empty).intersect(exact(q)).size / K.toDouble)
      .sum / exact.size
  }

  /** ADC floors pin the PRODUCTION compressed config (PQ 8×256 with 2
    * trained Lloyd rounds, SQ int8; 16 trained cells, nprobe = 8,
    * refine = 4) — the serving mode whose recall is most sensitive to
    * its knobs. Measured on this fixture (sf0.1, 64 queries, k=10):
    * PQ ADC 0.406 → 0.713 refined; SQ ADC 0.858 → 0.869 refined (the
    * nprobe=8 routing cap is ≈0.869 — SQ's in-cell ranking is
    * near-exact, PQ's 8-dim subspaces pay real quantization error on
    * this clusterless synthetic corpus). The whole train/encode
    * pipeline is deterministic, so the floors carry only a small
    * fixture-drift margin. */
  test("PQ 8x256 ADC at production nprobe=8 holds recall@10 >= 0.35 (0.65 refined; measured 0.406/0.713)") {
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexPq(numCells = 16, routerIters = 3, numSub = 8,
      codebookK = 256, pqIters = 2)
    db.nprobe = 8
    val adc = handleRecall(db, refined = false)
    val ref = handleRecall(db, refined = true)
    info(f"pq adc=$adc%.4f refined=$ref%.4f")
    assert(adc >= 0.35, s"pq adc recall regressed: $adc (floor 0.35, measured 0.406)")
    assert(ref >= 0.65, s"pq refined recall regressed: $ref (floor 0.65, measured 0.713)")
    assert(ref >= adc, s"refine must not lose recall: $ref vs $adc")
  }

  test("SQ int8 ADC at production nprobe=8 holds recall@10 >= 0.82 (0.85 refined; measured 0.858/0.869)") {
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexSq(numCells = 16, routerIters = 3)
    db.nprobe = 8
    val adc = handleRecall(db, refined = false)
    val ref = handleRecall(db, refined = true)
    info(f"sq adc=$adc%.4f refined=$ref%.4f")
    assert(adc >= 0.82, s"sq adc recall regressed: $adc (floor 0.82, measured 0.858)")
    assert(ref >= 0.85, s"sq refined recall regressed: $ref (floor 0.85, measured 0.869)")
    assert(ref >= adc, s"refine must not lose recall: $ref vs $adc")
  }

  test("truncated-64->16 (MRL) prefix fetch at production sizes holds recall@10") {
    import graft.functions.VectorFunctions._
    // the knob a Matryoshka deployment tunes: how many truncated-prefix
    // candidates the coarse pass fetches before the full-width refine.
    // Coarse pass ranks by L2^2 over the FIRST 16 of 64 dims (the
    // composition q_knn_truncated gates at exhaustive settings); the
    // fetched candidates re-score at full width and the top-10 scores
    // against the exact full-width ground truth.
    val t = e.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
    val tq = queries.select(col("qid"), slice(col("qv"), 1, 16).as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d").asc, col("vec_id").asc)
    def recallAtFetch(fetch: Int): Double = {
      val cand = Knn.knnJoin(t, tq, fetch).select("qid", "vec_id")
      val refined = cand
        .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .join(queries, Seq("qid"))
        .select(col("qid"), col("vec_id"),
          l2SqNative(col("embedding"), col("qv")).as("d"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= K)
      val hits = refined.select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      exact.keys.toSeq
        .map(q => hits.getOrElse(q, Set.empty).intersect(exact(q)).size / K.toDouble)
        .sum / exact.size
    }
    val r2 = recallAtFetch(2 * K)
    val r4 = recallAtFetch(4 * K)
    info(f"truncated-16 prefix recall@10: fetch=2k -> $r2%.4f, fetch=4k -> $r4%.4f")
    assert(r4 >= r2 - 1e-9, "a larger candidate fetch must not lose recall")
    // Measured 0.200 / 0.269 (BASELINE.md): the fixture's dims are
    // i.i.d. random, so a 16/64 prefix carries ~1/4 of the distance
    // signal — the measured values ARE the information-theoretic story,
    // unlike real MRL embeddings which concentrate signal in the
    // prefix. The floors pin the deterministic pipeline with a small
    // fixture-drift margin.
    assert(r2 >= 0.17, s"truncated fetch=2k recall regressed: $r2 (floor 0.17, measured 0.200)")
    assert(r4 >= 0.23, s"truncated fetch=4k recall regressed: $r4 (floor 0.23, measured 0.269)")
  }

  test("routed 16 trained cells at production nprobe=8 holds recall@10 >= 0.85 (measured 0.869)") {
    val model = IvfIndex.train(e, k = 16, iters = 3)
    val routed = HnswIndex.build(
      IvfIndex.assign(e, model).withColumn("part", col("cell")), P)
    val r = recallOf(HnswIndex.search(routed, queries, K, P, efSearch = 256,
      router = Some(model), nprobe = 8))
    assert(r >= 0.85, s"routed production recall regressed: $r (floor 0.85, measured 0.869)")
  }

  test("routed MaxSim at nprobe=1/16 cells holds recall@5 >= 0.85 and actually prunes (measured 0.925 at 0.63 candidate fraction)") {
    import graft.operators.LateInteraction
    // multi-vector corpus: 4 consecutive fixture vectors per document
    // (the q_maxsim construction), 8 multi-vector queries. Honesty
    // note (same as the residual-ADC one): on this i.i.d. fixture a
    // doc's 4 random vectors land in ~4 distinct cells, so even
    // nprobe=1 unions to a 0.63 candidate fraction — real ColBERT
    // token vectors cluster, where the probed fraction drops far
    // lower at the same recall. nprobe=1 is the config where pruning
    // is measurably real on this data (nprobe=2/4 measured
    // 1.000 recall at 0.85/0.99 fractions).
    val dv = e.select(expr("vec_id div 4").as("doc_id"), col("embedding").as("vec"))
    val qv = e.filter(col("vec_id") < 32)
      .select(expr("vec_id div 4").as("qid"), col("vec_id").as("q_ord"),
        col("embedding").as("qv"))
    val kTop = 5
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "doc_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val truth = topSets(LateInteraction.maxSimJoin(dv, qv, kTop))
    val model = IvfIndex.train(e, k = 16, iters = 3)
    val cells = LateInteraction.docCellListing(dv, model)
    val got = topSets(LateInteraction.maxSimRouted(dv, cells, qv, kTop, model, nprobe = 1))
    val r = truth.keys.toSeq
      .map(q => got.getOrElse(q, Set.empty).intersect(truth(q)).size / kTop.toDouble)
      .sum / truth.size
    // the pruned fraction, replayed from the listing: candidate docs
    // for a qid = docs with a vector in any cell probed by its vectors
    val listing = cells.collect().map(r0 => (r0.getLong(0), r0.getInt(1)))
    val nDocs = listing.map(_._1).distinct.length
    val qRows = qv.select(col("qid"), col("qv")).collect()
      .map(r0 => (r0.getLong(0), r0.getSeq[Float](1).toArray))
    val frac = qRows.groupBy(_._1).map { case (_, vs) =>
      val pc = vs.map { case (_, v) => model.probeOrder(v).head }.toSet
      listing.filter(t => pc(t._2)).map(_._1).distinct.length.toDouble / nDocs
    }.sum / truth.size
    info(f"routed MaxSim at nprobe=1: recall@5 $r%.3f, candidate fraction $frac%.3f")
    assert(r >= 0.85, s"routed MaxSim recall regressed: $r (floor 0.85, measured 0.925)")
    assert(frac < 0.80, s"routed MaxSim candidate generation stopped pruning: fraction $frac")
  }

  test("TRAINED residual ADC beats raw ADC recall@10 on a clustered corpus (the claim residuals exist for)") {
    // ResidualPqSpec records the honesty note that residuals do NOT
    // help on the i.i.d. fixture; this is the counterpart floor on a
    // DELIBERATELY clustered one (seeded mixture of 16 Gaussians,
    // within-cluster std 0.5 vs between-center scale 5), where the
    // variance decomposition argument actually applies: residuals
    // against trained cell centroids carry ~1% of raw energy, so the
    // PQ codebook's 16 codes/subspace resolve neighbors instead of
    // cluster geometry.
    import spark.implicits._
    import graft.index.ProductQuantizer
    val rnd = new scala.util.Random(42)
    val dims = 64; val nCenters = 16; val n = 2000; val nq = 32; val nprobe = 4
    val centers = Array.fill(nCenters, dims)(rnd.nextGaussian() * 5.0)
    def point(c: Int): Array[Float] =
      Array.tabulate(dims)(d => (centers(c)(d) + rnd.nextGaussian() * 0.5).toFloat)
    val corpus = (0 until n).map(i => (i.toLong, point(i % nCenters)))
    val qs = (0 until nq).map(i => (i.toLong, point(i % nCenters)))
    // exact ground truth, driver-side (tiny)
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i).toDouble - b(i).toDouble; s += t * t; i += 1 }
      s
    }
    val truth: Map[Long, Set[Long]] = qs.map { case (qid, qv) =>
      qid -> corpus.map { case (id, v) => (l2(qv, v), id) }.sorted.take(K).map(_._2).toSet
    }.toMap
    val e = corpus.toDF("vec_id", "embedding")
    val qdf = qs.toDF("qid", "qv")
    val router = IvfIndex.train(e, k = nCenters, iters = 3)
    val assigned = IvfIndex.assign(e, router)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centDf = router.centroids.indices
      .map(i => (router.cellId(i), router.centroids(i).toSeq)).toDF("cell", "cv")
    val probePairs = qs.flatMap { case (qid, qv) =>
      router.probeOrder(qv).take(nprobe).map(qid -> _)
    }.toDF("qid", "cell")
    def recallOfAdc(scored: org.apache.spark.sql.DataFrame): Double = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("d").asc, col("vec_id").asc)
      val hits = scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= K).select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      truth.keys.toSeq
        .map(q => hits.getOrElse(q, Set.empty).intersect(truth(q)).size / K.toDouble)
        .sum / truth.size
    }
    // raw-vector ADC (trained codebooks, same router/probes)
    val rawModel = ProductQuantizer.train(e, numSub = 8, k = 16, iters = 2)
    val rawScored = assigned
      .select(col("vec_id"), col("cell"),
        ProductQuantizer.encodeExpr(col("embedding"), rawModel).as("codes"))
      .join(broadcast(probePairs), "cell")
      .join(broadcast(qdf), "qid")
      .select(col("qid"), col("vec_id"),
        ProductQuantizer.adcExpr(col("codes"), col("qv"), rawModel).as("d"))
    val rawR = recallOfAdc(rawScored)
    // residual ADC: encode x − centroid(cell(x)), query residualized
    // per probed cell, codebooks trained on the residuals
    val res = assigned.join(broadcast(centDf), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("embedding"), col("cv"),
          (x, c) => (x.cast("double") - c).cast("float")).as("embedding"))
    val resModel = ProductQuantizer.train(res, numSub = 8, k = 16, iters = 2)
    val qres = probePairs.join(broadcast(qdf), "qid").join(broadcast(centDf), "cell")
      .select(col("qid"), col("cell"),
        zip_with(col("qv"), col("cv"),
          (x, c) => (x.cast("double") - c).cast("float")).as("qrv"))
    val resScored = res
      .select(col("vec_id"), col("cell"),
        ProductQuantizer.encodeExpr(col("embedding"), resModel).as("codes"))
      .join(broadcast(qres), "cell")
      .select(col("qid"), col("vec_id"),
        ProductQuantizer.adcExpr(col("codes"), col("qrv"), resModel).as("d"))
    val resR = recallOfAdc(resScored)
    assigned.unpersist(blocking = false)
    info(f"clustered-fixture ADC recall@10: raw $rawR%.3f, residual $resR%.3f")
    // measured 0.081 raw vs 0.309 residual (seeded fixture — stable):
    // floors pin both the absolute level and the ~4x advantage that
    // motivates residual encoding, with drift margin
    assert(resR >= 0.25,
      f"residual ADC recall regressed: $resR%.3f (floor 0.25, measured 0.309)")
    assert(resR >= 2.0 * rawR,
      f"residual ADC lost its clustered-data advantage: $resR%.3f vs raw $rawR%.3f")
  }

  test("cell-blocked near-dup pairs: planted duplicates recall@tau=0.99 >= 0.95 (measured 0.980)") {
    // The claim the SemDeDup blocking (q_dedup_embcos/q_dedup_semantic)
    // actually rests on: NEAR-IDENTICAL vectors share a nearest coarse
    // centroid except exactly on a cell boundary. The i.i.d. fixture
    // contains no true near-dups (one pair above cos 0.6 in 2M), so
    // the floor plants them: every 10th vector re-enters under a new
    // id with +0.01 on one component (cos ≈ 0.9999). Measured: 196 of
    // 200 planted pairs found (4 boundary losses), ZERO false pairs
    // at τ = 0.99. Honesty note (BASELINE.md): at MODERATE similarity
    // the same blocking is only a low-recall candidate generator —
    // cos ≥ 0.4 recall on the i.i.d. fixture measures 0.162 (920
    // true pairs, single-probe cells) — which is the documented
    // contract: blocked dedup detects near-duplicates; tunable-recall
    // candidate generation at lower thresholds is the multi-band LSH
    // arm (q_dedup_emblsh).
    import org.apache.spark.sql.functions.{col, lit, transform, when}
    val base = e.select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x)).as("embedding"))
    val corpus = base.union(planted)
    val pairs = graft.queries.DedupQueries.blockedPairsOf(corpus, tau = 0.99)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wanted = base.filter(col("vec_id") % 10 === 0).select("vec_id")
      .collect().map(_.getLong(0)).map(i => (i, i + 100000L)).toSet
    val recall = pairs.intersect(wanted).size.toDouble / wanted.size
    assert(recall >= 0.95,
      f"planted near-dup recall through the cell blocking: $recall%.3f (measured 0.980)")
    assert((pairs -- wanted).isEmpty,
      s"τ=0.99 must admit no false pairs on this fixture: ${(pairs -- wanted).take(5)}")
  }

  test("multi-probe blocking recall at cos>=0.4 beats single-probe (measured 0.353 vs 0.162)") {
    // the quantified response to the moderate-similarity honesty note:
    // joining each vector through its TWO nearest cells recovers the
    // pairs split by one cell boundary. Floors pin the measured lift
    // and the strict superset property (multi-probe can never lose a
    // single-probe pair — cell 1 of 2 IS the single-probe cell).
    import org.apache.spark.sql.functions.col
    val sp = graft.queries.DedupQueries.qDedupEmbcos(spark, sfDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mp = graft.queries.DedupQueries.qDedupEmbcosMp(spark, sfDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sp.subsetOf(mp), s"single-probe pairs missing from multi-probe: ${(sp -- mp).take(5)}")
    val a = e.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val truth = a.crossJoin(b).filter(col("a") < col("b"))
      .filter(graft.functions.VectorFunctions.cosineNative(col("va"), col("vb")) >= 0.4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rs = sp.intersect(truth).size.toDouble / truth.size
    val rm = mp.intersect(truth).size.toDouble / truth.size
    assert(rm >= 0.30, f"multi-probe recall regressed: $rm%.3f (floor 0.30, measured 0.353)")
    assert(rm >= rs + 0.10,
      f"multi-probe must hold its measured lift over single-probe: $rm%.3f vs $rs%.3f")
  }
}
