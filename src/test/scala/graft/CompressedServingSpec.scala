package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.HnswParams
import graft.operators.Knn

/** Compressed (PQ/SQ) serving under the cosine and dot metrics, the
  * incremental codes maintenance that keeps add/remove on ADC serving,
  * and the cache hygiene contract (superseded serving generations must
  * release — a churn chain pins ONE live generation, never its
  * history). Complements the oracle gates: q_vectordb_pq_cosine,
  * q_vectordb_sq_dot, q_vectordb_pq_add, q_vectordb_sq_remove. */
class CompressedServingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val P = HnswParams(16, 32)
  private lazy val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private def qvOf(id: Long): Seq[Float] =
    e.filter(col("vec_id") === id).select("embedding").head().getSeq[Float](0)

  test("splitCells: oversized cells split routably, codes untouched, serving conserved") {
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexSq(numCells = 4, routerIters = 1)
    db.nprobe = 4
    val before = db.stats.head()
    val split = db.splitCells(maxCellSize = 64)
    val after = split.stats.head()
    // more, smaller cells; every row still served exactly once
    assert(after.getAs[Long]("n_cells") > before.getAs[Long]("n_cells"), after)
    assert(after.getAs[Long]("max_cell") < before.getAs[Long]("max_cell"), after)
    assert(after.getAs[Long]("n_indexed") == 500L, after)
    // exhaustive probing: serving is IDENTICAL before and after — the
    // split moved routing metadata, never a code
    split.nprobe = after.getAs[Long]("n_cells").toInt
    val qv = qvOf(19L)
    def top(h: VectorDB) = h.search(qv, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(split) == top(db), "split changed exhaustive-probe serving")
    // finite probing still finds the self-hit through the re-derived
    // sub-centroids (geometric routability, not just conservation)
    split.nprobe = 3
    assert(split.search(qv, 1).collect().head.getLong(0) == 19L,
      "finite-probe routing lost the self-hit after the split")
    // balanced tables pass through untouched; HNSW handles are loud
    val noop = split.splitCells(maxCellSize = 1 << 20)
    assert(noop.stats.head().getAs[Long]("n_cells") ==
      after.getAs[Long]("n_cells"))
    val hnsw = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    hnsw.buildIndexIvf(numCells = 4, iters = 1)
    val e1 = intercept[IllegalArgumentException] { hnsw.splitCells(64) }
    assert(e1.getMessage.contains("rebalance"), e1.getMessage)
  }

  test("splitCells seed collect ships exactly sum(arity) rows on a skewed-arity corpus (VERDICT r16 nit)") {
    // one pathological cell of arity 50 next to many arity-2 cells:
    // the r16 `rn <= max(arity)` filter would collect up to 50 rows
    // per big cell and discard driver-side; the in-plan arity join
    // must make the collect EXACTLY the new cell count
    import spark.implicits._
    val members = (
      (1 to 500).map(i => (i.toLong, 0, Seq(i.toFloat))) ++      // cell 0: huge
      (1 to 20).flatMap(c => (1 to 10).map(i =>
        ((c * 1000 + i).toLong, c, Seq(i.toFloat))))             // 20 modest cells
    ).toDF("vec_id", "cell", "embedding")
    val arity = (Map(0 -> 50) ++ (1 to 20).map(_ -> 2).toMap)
    val seeds = VectorDB.seedCandidates(members, arity, "vec_id")
    assert(seeds.count() == arity.values.sum.toLong,
      s"seed frame must be exactly sum(arity) = ${arity.values.sum} rows")
    // and per cell: the arity(c) LOWEST-id members, rn-ranked
    val got = seeds.select("cell", "rn", "vec_id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got.count(_._1 == 0) == 50 && got.filter(_._1 == 0).map(_._3).max == 50L)
    assert((1 to 20).forall(c => got.count(_._1 == c) == 2))
    assert(got.forall { case (c, rn, _) => rn <= arity(c) })
  }

  test("searchLocal serves compressed handles: ADC identity with the distributed arm, zero jobs warm") {
    val qv = qvOf(23L)
    def distOf(db: VectorDB) = db.search(qv, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .sortBy { case (id, d) => (d, id) }
    val builds: Seq[(String, VectorDB => Unit)] = Seq(
      ("pq", db => { db.buildIndexPq(numCells = 4, routerIters = 1); () }),
      ("opq", db => { db.buildIndexOpq(numCells = 4, routerIters = 1); () }),
      ("sq", db => { db.buildIndexSq(numCells = 4, routerIters = 1); () }),
      ("bq", db => { db.buildIndexBq(numCells = 4, routerIters = 1); () }),
      ("sq-dot", db => { db.buildIndexSq(numCells = 4, routerIters = 1,
        metric = Knn.Dot); () }))
    for ((tag, build) <- builds) {
      val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
      build(db)
      db.nprobe = 3
      // bit-exact: the local ADC mirrors accumulate in the kernels'
      // exact order, so == on raw doubles is the right assertion
      assert(db.searchLocal(qv, 10) == distOf(db),
        s"$tag local/distributed ADC divergence")
    }
    // zero jobs when warm (the searchLocal headline), on the PQ arm
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexPq(numCells = 4, routerIters = 1)
    db.nprobe = 4
    db.searchLocal(qv, 10) // cold: cells load
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
    val before = jobs.get()
    db.searchLocal(qv, 10)
    org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
    assert(jobs.get() == before, "warm compressed searchLocal must launch no Spark job")
    // cap breach falls back to the identical distributed answer
    val capped = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    capped.buildIndexPq(numCells = 4, routerIters = 1)
    capped.nprobe = 4
    capped.localCellRowCap = 1
    assert(capped.searchLocal(qv, 10) == db.searchLocal(qv, 10),
      "cap-breach fallback diverged from local compressed serving")
  }

  test("cosine PQ/SQ: wide refine equals exact brute-force cosine bit-for-bit") {
    val qv = qvOf(11L)
    val exact = Knn.searchKnn(e, qv, 10, metric = Knn.Cosine)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    for ((build, tag) <- Seq(
        ((db: VectorDB) => db.buildIndexPq(numCells = 4, routerIters = 1,
          metric = Knn.Cosine), "pq"),
        ((db: VectorDB) => db.buildIndexSq(numCells = 4, routerIters = 1,
          metric = Knn.Cosine), "sq"))) {
      val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
      build(db)
      db.nprobe = 4
      // refine covers the whole 500-row corpus: the exact cosine
      // re-rank must equal brute force — the unit-space ADC
      // approximation cannot reach the output
      val refined = db.searchRefined(qv, k = 10, refine = 64)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(refined.toSeq == exact.toSeq,
        s"$tag cosine wide refine diverged:\n${refined.toSeq}\nvs\n${exact.toSeq}")
    }
  }

  test("dot PQ/SQ: wide refine equals exact max-inner-product bit-for-bit") {
    val qv = qvOf(13L)
    val exact = Knn.searchKnn(e, qv, 10, metric = Knn.Dot)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    for ((build, tag) <- Seq(
        // 64 dims + 1 augmentation dim pads to 72 = 9-wide subspaces
        ((db: VectorDB) => db.buildIndexPq(numCells = 4, routerIters = 1,
          metric = Knn.Dot), "pq"),
        ((db: VectorDB) => db.buildIndexSq(numCells = 4, routerIters = 1,
          metric = Knn.Dot), "sq"))) {
      val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
      build(db)
      db.nprobe = 4
      val refined = db.searchRefined(qv, k = 10, refine = 64)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(refined.toSeq == exact.toSeq,
        s"$tag dot wide refine diverged:\n${refined.toSeq}\nvs\n${exact.toSeq}")
    }
  }

  test("OPQ handle: wide refine equals exact brute force (permutation is distance-neutral)") {
    val qv = qvOf(17L)
    val exact = Knn.searchKnn(e, qv, 10, metric = Knn.L2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexOpq(numCells = 4, routerIters = 1)
    db.nprobe = 4
    // refine covers the whole corpus: the permuted-space ADC shortlist
    // cannot reach the output, and the exact re-rank runs on the RAW
    // vectors — any leakage of the permutation into refine distances
    // (or vice versa) breaks bit-for-bit equality
    val refined = db.searchRefined(qv, k = 10, refine = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(refined.toSeq == exact.toSeq,
      s"opq wide refine diverged:\n${refined.toSeq}\nvs\n${exact.toSeq}")
  }

  test("OPQ add encodes through the STORED permutation; remove round-trips; stats says opq") {
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexOpq(numCells = 4, routerIters = 1)
    db.nprobe = 4
    val batch = e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    val grown = db.add(batch)
    val codes = grown.servedCodes.getOrElse(fail("add must maintain the codes"))
    assert(codes.count() == 505L)
    // resident corpus never re-encodes; only the batch does
    val plan = codes.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"appended codes must reuse the cached parent generation:\n$plan")
    // THE permutation-maintenance pin: row 3's shifted twin encodes
    // through the stored permutation, so it serves at the IDENTICAL
    // ADC distance as row 3 itself — a batch encoded un-permuted (or
    // re-permuted under a re-derived order) would diverge
    val hits = grown.search(qvOf(3L), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val d3 = hits.toMap.apply(3L)
    assert(hits.toMap.get(900003L).contains(d3),
      s"appended row must serve at its twin's permuted ADC distance: ${hits.toSeq}")
    val st = grown.stats.head()
    assert(st.getAs[String]("serving") == "opq" && st.getAs[Long]("n_indexed") == 505L)
    val shrunk = grown.remove(batch.select("vec_id"))
    assert(shrunk.servedCodes.get.count() == 500L)
    val roundTrip = shrunk.search(qvOf(3L), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val original = db.search(qvOf(3L), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(roundTrip.toSeq == original.toSeq,
      "add → remove round trip must serve exactly the original ranking")
  }

  test("compressed add appends batch codes only; resident codes reuse the cached generation") {
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexPq(numCells = 4, routerIters = 1)
    db.nprobe = 4
    val batch = e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    val grown = db.add(batch)
    val codes = grown.servedCodes.getOrElse(fail("add must maintain the codes"))
    assert(codes.count() == 505L, "union codes must cover corpus + batch")
    // maintenance contract: the appended generation's plan reads the
    // PARENT's cached codes (InMemoryTableScan) — the resident corpus
    // never re-encodes, only the 5-row batch does
    val plan = codes.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"appended codes must reuse the cached parent generation:\n$plan")
    // the shifted twin of row 3 serves at the same ADC distance as
    // row 3 itself (identical vector → identical codes)
    val hits = grown.search(qvOf(3L), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val d3 = hits.toMap.apply(3L)
    assert(hits.toMap.get(900003L).contains(d3),
      s"appended row must serve from codes at its twin's ADC distance: ${hits.toSeq}")
    // stats stays truthful: still compressed serving, census covers
    // the union
    val st = grown.stats.head()
    assert(st.getAs[String]("serving") == "pq" && st.getAs[Long]("n_indexed") == 505L)
    // remove prunes codes back without touching bounds/codebooks
    val shrunk = grown.remove(batch.select("vec_id"))
    assert(shrunk.servedCodes.get.count() == 500L)
    val roundTrip = shrunk.search(qvOf(3L), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val original = db.search(qvOf(3L), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(roundTrip.toSeq == original.toSeq,
      "add → remove round trip must serve exactly the original ranking")
  }

  test("SQ bound-expanding add rebuilds bounds instead of appending clamped codes") {
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexSq(numCells = 4, routerIters = 1)
    db.nprobe = 4
    // in-bounds batch (copies of corpus rows — bounds are exact per-dim
    // min/max, so resident values always re-admit) maintains
    // incrementally: the parent's cached codes generation is reused
    val inb = e.filter(col("vec_id") < 3)
      .select((col("vec_id") + 920000L).as("vec_id"), col("embedding"))
    val kept = db.add(inb)
    assert(kept.servedCodes.get.count() == 503L)
    val plan = kept.servedCodes.get.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"in-bounds add must reuse the cached parent codes:\n$plan")
    // a component far above every trained hi must take the rebuild arm
    // (ADVICE r9: clamped codes would bias its ADC distances silently).
    // With rebuilt bounds the extreme vector encodes exactly (code 255
    // decodes to the new hi = 10.0) so its ADC self-distance is ~0;
    // clamped codes would leave it at sum((10 - hi_i)^2) >> 1.
    val ext = spark.range(1).select(lit(930000L).as("vec_id"),
      array_repeat(lit(10.0f), 64).as("embedding"))
    val grown = db.add(ext)
    assert(grown.servedCodes.isDefined && grown.servedCodes.get.count() == 501L,
      "bound-expanding add must stay on compressed serving over the grown corpus")
    val hit = grown.search(Seq.fill(64)(10.0f), 1).collect().head
    assert(hit.getLong(0) == 930000L, s"extreme vector must self-serve: $hit")
    assert(hit.getDouble(1) < 1.0,
      s"ADC self-distance implies clamped codes survived: ${hit.getDouble(1)}")
  }

  test("churn chains release superseded serving generations (cache census)") {
    def census(): Int = spark.sparkContext.getPersistentRDDs.size
    // HNSW chain: build → remove → add → compact holds ONE live index
    val before = census()
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexIvf(numCells = 4, iters = 1)
    db.nprobe = 4
    db.efSearch = 4096
    val slice = e.filter(col("vec_id") % 9 === 5).select("vec_id", "embedding")
    val churned = db.remove(slice.select("vec_id")).add(slice)
    val compacted = churned.compact(minCellSize = (churned.len / 4 + 1).toInt)
    compacted.search(qvOf(5L), 5).count()
    val afterHnsw = census()
    assert(afterHnsw - before <= 1,
      s"HNSW churn chain pinned ${afterHnsw - before} generations (want <= 1)")
    // rebuilds on the same handle release the replaced state too
    db.buildIndexIvf(numCells = 4, iters = 1)
    db.buildIndexSq(numCells = 4, routerIters = 1)
    db.search(qvOf(5L), 5).count()
    val afterRebuilds = census()
    assert(afterRebuilds - before <= 2,
      s"rebuild chain pinned ${afterRebuilds - before} cached datasets (want <= 2: one live per handle)")
    // compressed chain: build → add → remove holds ONE live codes table
    val cdb = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    cdb.buildIndexPq(numCells = 4, routerIters = 1)
    val batch = e.filter(col("vec_id") < 3)
      .select((col("vec_id") + 910000L).as("vec_id"), col("embedding"))
    val chained = cdb.add(batch).remove(batch.select("vec_id"))
    chained.search(qvOf(5L), 5).count()
    val afterCodes = census()
    assert(afterCodes - afterRebuilds <= 1,
      s"codes churn chain pinned ${afterCodes - afterRebuilds} generations (want <= 1)")
  }

  test("dot handles: empty add is a no-op; norm-expanding add rebuilds with recorded shape") {
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexIvf(numCells = 8, iters = 1, metric = Knn.Dot)
    db.nprobe = 8
    db.efSearch = 4096
    val qv = qvOf(21L)
    val want = db.search(qv, 5).collect().map(_.getLong(0)).toSeq
    // ADVICE r8: agg(max) over an empty batch is null — must not NPE,
    // must not rebuild
    val emptyBatch = e.filter(lit(false)).select("vec_id", "embedding")
    val same = db.add(emptyBatch)
    assert(same.search(qv, 5).collect().map(_.getLong(0)).toSeq == want)
    // a norm-expanding batch rebuilds under the new M with the
    // RECORDED build shape (numCells = 8, not the 16 default)
    val big = spark.range(1).select(lit(990000L).as("vec_id"),
      array_repeat(lit(9.9f), 64).as("embedding"))
    val grown = db.add(big)
    assert(grown.stats.head().getAs[Long]("n_cells") <= 8L,
      "rebuild must replay the recorded cell count, not defaults")
    val top = grown.search(qvOf(21L).map(x => math.abs(x) + 0.1f), 3)
      .collect().map(_.getLong(0))
    assert(top.head == 990000L,
      s"dominant-dot vector must rank first after the rebuild: ${top.toSeq}")
    // compressed dot handles take the same rebuild arm and stay on ADC
    val cdb = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    cdb.buildIndexSq(numCells = 8, routerIters = 1, metric = Knn.Dot)
    cdb.nprobe = 8
    val cGrown = cdb.add(big)
    assert(cGrown.servedCodes.isDefined,
      "norm-expanding add on a compressed dot handle must rebuild codes, not degrade")
    assert(cGrown.servedCodes.get.count() == 501L)
    val cTop = cGrown.searchRefined(qvOf(21L).map(x => math.abs(x) + 0.1f), 3, refine = 8)
      .collect().map(_.getLong(0))
    assert(cTop.head == 990000L,
      s"rebuilt dot codes must surface the dominant vector: ${cTop.toSeq}")
  }

  test("compact on compressed handles dissolves small cells losslessly and restricts the router") {
    for ((build, tag) <- Seq(
        ((db: VectorDB) => db.buildIndexPq(numCells = 16, routerIters = 1), "pq"),
        ((db: VectorDB) => db.buildIndexSq(numCells = 16, routerIters = 1), "sq"))) {
      val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
      build(db)
      db.nprobe = 16
      val qv = qvOf(9L)
      val before = db.search(qv, 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
      val pre = db.stats.head().getAs[Long]("n_cells")
      val compacted = db.compact(minCellSize = (db.len / 16L + 1L).toInt)
      val st = compacted.stats.head()
      assert(st.getAs[String]("serving") == tag,
        s"$tag compaction must stay on compressed serving")
      assert(st.getAs[Long]("n_cells") < pre,
        s"$tag: adaptive threshold must dissolve at least one cell (${st.getAs[Long]("n_cells")} vs $pre)")
      assert(st.getAs[Long]("n_indexed") == 500L,
        s"$tag compaction must preserve the codes row set")
      // all surviving cells probed: the compacted ADC ranking must
      // equal the parent's (codes never change, only routing cells)
      val after = compacted.search(qv, 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(after.toSeq == before.toSeq,
        s"$tag compaction changed the global ADC ranking:\n${before.toSeq}\nvs\n${after.toSeq}")
      // routed probes (nprobe < cells) must never target dissolved
      // cells — the restricted router serves without error and k hits
      compacted.nprobe = 2
      assert(compacted.search(qv, 5).collect().length == 5)
    }
  }

  test("BQ handle: wide refine equals exact; maintenance keeps 1-bit serving") {
    val qv = qvOf(21L)
    val exact = Knn.searchKnn(e, qv, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexBq(numCells = 4, routerIters = 1)
    db.nprobe = 4
    val refined = db.searchRefined(qv, k = 10, refine = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(refined.toSeq == exact.toSeq,
      s"bq wide refine diverged:\n${refined.toSeq}\nvs\n${exact.toSeq}")
    // maintained add: the stateless pack encodes only the batch; the
    // resident codes reuse the cached parent generation
    val batch = e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    val grown = db.add(batch)
    val codes = grown.servedCodes.getOrElse(fail("add must maintain the codes"))
    assert(codes.count() == 505L)
    val plan = codes.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"appended codes must reuse the cached parent generation:\n$plan")
    val st = grown.stats.head()
    assert(st.getAs[String]("serving") == "bq" && st.getAs[Long]("n_indexed") == 505L)
    // an identical appended vector packs to the identical sign pattern:
    // row 3's twin must serve at row 3's own Hamming distance
    val hits = grown.search(qvOf(3L), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(hits.get(900003L) == hits.get(3L),
      s"appended twin must serve from codes at the twin Hamming distance: $hits")
    // remove prunes the codes back; serving returns to the original
    val shrunk = grown.remove(batch.select("vec_id"))
    assert(shrunk.servedCodes.get.count() == 500L)
    assert(shrunk.search(qv, 10).collect().toSeq ==
      db.search(qv, 10).collect().toSeq)
  }

  test("BQ cosine/dot: wide refine equals the exact metric ranking; batch == per-query") {
    import spark.implicits._
    for ((metric, qid) <- Seq((Knn.Cosine, 23L), (Knn.Dot, 26L))) {
      val qv = qvOf(qid)
      val exact = Knn.searchKnn(e, qv, 10, metric = metric)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
      db.buildIndexBq(numCells = 4, routerIters = 1, metric = metric)
      db.nprobe = 4
      val refined = db.searchRefined(qv, k = 10, refine = 64)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(refined.toSeq == exact.toSeq,
        s"bq $metric wide refine diverged:\n${refined.toSeq}\nvs\n${exact.toSeq}")
      // one batch job serves the same Hamming ranking as point queries
      val qs = Seq((0L, qvOf(qid).toArray), (1L, qvOf(qid + 1).toArray))
        .toDF("qid", "qv")
      val batch = db.searchBatch(qs, 5)
        .select("qid", "rank", "vec_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val single = (for ((q, i) <- Seq(qid, qid + 1).zipWithIndex;
          (r, j) <- db.search(qvOf(q), 5).collect().zipWithIndex)
        yield (i.toLong, j + 1, r.getLong(0))).toSet
      assert(batch == single, s"bq $metric batch arm diverged from point arm")
    }
  }

  test("compressed cosine state survives save/load with payloads") {
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64, P)
    db.buildIndexPq(numCells = 4, routerIters = 1, metric = Knn.Cosine,
      payloadCols = Seq("label"))
    db.nprobe = 4
    val qv = qvOf(17L)
    val pred = element_at(col("payload"), "label").cast("int") === 3
    val before = db.searchWhere(qv, 5, pred).collect().map(_.getLong(0)).toSeq
    val path = java.nio.file.Files.createTempDirectory("graft_cos_pq_").toString
    db.save(path)
    val loaded = VectorDB.load(spark, path)
    val after = loaded.searchWhere(qv, 5, pred).collect().map(_.getLong(0)).toSeq
    assert(after == before,
      s"cosine PQ + payload serving must survive the restart: $before vs $after")
    val plain = loaded.search(qv, 5).collect().map(_.getLong(0)).toSeq
    assert(plain == db.search(qv, 5).collect().map(_.getLong(0)).toSeq)
  }
}
