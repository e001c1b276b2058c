package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{HnswParams, SharedTraining}
import graft.operators.Knn

/** The corpus-global compressed build path (VERDICT r15 item #1):
  * train once ([[SharedTraining.train]]), encode per shard
  * ([[VectorDB.buildIndexShared]]), merge fingerprint-equal handles
  * ([[VectorDB.mergeWith]]) — the path that makes PQ/SQ/BQ/OPQ and
  * dot (MIPS) handles shard-buildable and mergeable. The anchor pin:
  * a merged handle serves IDENTICALLY to a single shared build over
  * the union corpus, on every mode. */
class SharedTrainingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def shardHandle(t: SharedTraining, parity: Int): VectorDB = {
    val db = VectorDB.fromDataFrame(
      e.filter(col("vec_id") % 2 === parity), dims = 64, P)
    db.buildIndexShared(t)
    db
  }

  private def served(db: VectorDB, qv: Seq[Float], k: Int = 10) =
    db.search(qv, k).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("merged compressed shards serve bit-identically to one shared build over the union (all modes)") {
    val cases = Seq(
      ("pq", Knn.L2), ("opq", Knn.L2), ("sq", Knn.Cosine),
      ("bq", Knn.L2), ("pq", Knn.Dot))
    for ((mode, metric) <- cases) {
      val t = SharedTraining.train(e, dims = 64, mode = mode, metric = metric,
        numCells = 4, routerIters = 1, numSub = 8, codebookK = 16, pqIters = 0)
      val single = VectorDB.fromDataFrame(e, dims = 64, P)
      single.buildIndexShared(t)
      single.nprobe = 2
      val merged = shardHandle(t, 0).mergeWith(shardHandle(t, 1))
      merged.nprobe = 2
      val qv = qvOf(29L)
      assert(served(merged, qv) == served(single, qv),
        s"$mode/$metric merged serving diverged from the single shared build")
      // the zero-job local point arm serves the merged compressed
      // handle too (the shared router + unioned codes cells cache
      // driver-side), identically to the distributed ADC
      assert(merged.searchLocal(qv, 10) == served(merged, qv),
        s"$mode/$metric merged local point serving diverged")
    }
  }

  test("dot HNSW shards merge under a shared max-norm and serve exact MIPS at exhaustive settings") {
    val t = SharedTraining.train(e, dims = 64, mode = "ivf", metric = Knn.Dot,
      numCells = 4, routerIters = 1)
    val merged = shardHandle(t, 0).mergeWith(shardHandle(t, 1))
    val st = merged.stats.head()
    merged.nprobe = st.getAs[Long]("n_cells").toInt
    merged.efSearch =
      math.max(4096L, st.getAs[Long]("max_cell") + 1L).min(Int.MaxValue).toInt
    val qv = qvOf(31L)
    val exact = Knn.searchKnn(e, qv, 10, metric = Knn.Dot)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served(merged, qv) == exact,
      "merged dot HNSW at exhaustive settings diverged from brute-force MIPS")
  }

  test("a shard over the trained norm bound fails loudly at encode time") {
    val t = SharedTraining.train(e, dims = 64, mode = "ivf", metric = Knn.Dot,
      numCells = 4, routerIters = 1, normBoundSq = Some(1e-12))
    val db = VectorDB.fromDataFrame(e.filter(col("vec_id") < 50), dims = 64, P)
    val ex = intercept[IllegalArgumentException] { db.buildIndexShared(t) }
    assert(ex.getMessage.contains("exceeds the artifact's trained"), ex.getMessage)
  }

  test("fingerprint gating: different artifacts reject; shared+local rejects; duplicate ids reject") {
    val tA = SharedTraining.train(e, dims = 64, mode = "pq", metric = Knn.L2,
      numCells = 4, routerIters = 1)
    val tB = SharedTraining.train(e, dims = 64, mode = "pq", metric = Knn.L2,
      numCells = 8, routerIters = 1)
    assert(tA.fingerprint != tB.fingerprint)
    val a = shardHandle(tA, 0)
    val eMix = intercept[IllegalArgumentException] { a.mergeWith(shardHandle(tB, 1)) }
    assert(eMix.getMessage.contains("fingerprint mismatch"), eMix.getMessage)
    // shared + shard-local-trained: falls to the rebuild reject
    val local = VectorDB.fromDataFrame(
      e.filter(col("vec_id") % 2 === 1), dims = 64, P)
    local.buildIndexPq(numCells = 4, routerIters = 1)
    val eLoc = intercept[IllegalArgumentException] { a.mergeWith(local) }
    assert(eLoc.getMessage.contains("shard-local"), eLoc.getMessage)
    // overlapping ids under the SAME artifact: loud, never double-served
    val eDup = intercept[IllegalArgumentException] { a.mergeWith(shardHandle(tA, 0)) }
    assert(eDup.getMessage.contains("unique vector ids"), eDup.getMessage)
  }

  test("mergeAllWith: N-way shared ≡ single shared build; N-way local ≡ the binary fold; mixes reject") {
    // shared N-way (compressed): 4 residue shards, one call
    val t = SharedTraining.train(e, dims = 64, mode = "pq", metric = Knn.L2,
      numCells = 4, routerIters = 1)
    def resShard(r: Int) = {
      val db = VectorDB.fromDataFrame(
        e.filter(col("vec_id") % 4 === r), dims = 64, P)
      db.buildIndexShared(t)
      db
    }
    val many = resShard(0).mergeAllWith((1 to 3).map(resShard))
    many.nprobe = 2
    val single = VectorDB.fromDataFrame(e, dims = 64, P)
    single.buildIndexShared(t)
    single.nprobe = 2
    val qv = qvOf(41L)
    assert(served(many, qv) == served(single, qv),
      "N-way shared merge diverged from the single shared build")
    // local-trained N-way HNSW ≡ the binary mergeWith fold at
    // exhaustive settings
    def localShard(r: Int) = {
      val db = VectorDB.fromDataFrame(
        e.filter(col("vec_id") % 4 === r), dims = 64, P)
      db.buildIndexIvf(numCells = 4, iters = 1)
      db
    }
    def exhaustive(db: VectorDB): VectorDB = {
      val st = db.stats.head()
      db.nprobe = st.getAs[Long]("n_cells").toInt
      db.efSearch = math.max(4096L, st.getAs[Long]("max_cell") + 1L).toInt
      db
    }
    val nary = exhaustive(localShard(0).mergeAllWith((1 to 3).map(localShard)))
    val fold = exhaustive((1 to 3).map(localShard)
      .foldLeft(localShard(0))(_ mergeWith _))
    assert(served(nary, qv) == served(fold, qv),
      "N-way local merge diverged from the binary fold")
    // mixed shared/local shards cannot reconcile
    val eMix = intercept[IllegalArgumentException] {
      resShard(0).mergeAllWith(Seq(localShard(1)))
    }
    assert(eMix.getMessage.contains("mixed"), eMix.getMessage)
  }

  test("shared status round-trips save/load: a loaded shard still merges and serves identically") {
    val t = SharedTraining.train(e, dims = 64, mode = "sq", metric = Knn.L2,
      numCells = 4, routerIters = 1)
    val a = shardHandle(t, 0)
    val p = java.nio.file.Files.createTempDirectory("graft_shared_rt_")
    try {
      a.save(p.toString)
      val loaded = VectorDB.load(spark, p.toString)
      val merged = loaded.mergeWith(shardHandle(t, 1))
      merged.nprobe = 2
      val single = VectorDB.fromDataFrame(e, dims = 64, P)
      single.buildIndexShared(t)
      single.nprobe = 2
      val qv = qvOf(37L)
      assert(served(merged, qv) == served(single, qv),
        "loaded-shard merge diverged from the single shared build")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("a MERGED shared HNSW handle save/load round-trips and stays mergeable (ADVICE r16)") {
    // the HNSW (ivf/dot) merge arm serves a router RE-DERIVED from the
    // merged layout while the artifact keeps its trained router — save
    // must persist the artifact's own router separately or load's
    // reassembly-fingerprint integrity check rejects a legitimate save
    val t = SharedTraining.train(e, dims = 64, mode = "ivf", metric = Knn.Dot,
      numCells = 4, routerIters = 1)
    def thirdShard(r: Int): VectorDB = {
      val db = VectorDB.fromDataFrame(
        e.filter(col("vec_id") % 3 === r), dims = 64, P)
      db.buildIndexShared(t)
      db
    }
    def exhaustive(db: VectorDB): VectorDB = {
      val st = db.stats.head()
      db.nprobe = st.getAs[Long]("n_cells").toInt
      db.efSearch = math.max(4096L, st.getAs[Long]("max_cell") + 1L).toInt
      db
    }
    val merged = thirdShard(0).mergeWith(thirdShard(1))
    val p = java.nio.file.Files.createTempDirectory("graft_merged_shared_rt_")
    try {
      merged.save(p.toString)
      // r16 behavior: this threw 'altered or mixed' — the serving
      // router's fingerprint diverges from the artifact's
      val loaded = VectorDB.load(spark, p.toString)
      val qv = qvOf(59L)
      assert(served(exhaustive(loaded), qv) == served(exhaustive(merged), qv),
        "loaded merged shared HNSW handle diverged from the saved one")
      // merge compatibility survives the round-trip: a third
      // fingerprint-equal shard still merges into the loaded handle
      val more = exhaustive(loaded.mergeWith(thirdShard(2)))
      val exact = Knn.searchKnn(e, qv, 10, metric = Knn.Dot)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(served(more, qv) == exact,
        "post-load merge of the third shard diverged from brute-force MIPS")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  test("a NO-OP splitCells keeps shared status (ADVICE r16): nothing diverged, so merges still reconcile") {
    val t = SharedTraining.train(e, dims = 64, mode = "pq", metric = Knn.L2,
      numCells = 4, routerIters = 1)
    val noop = shardHandle(t, 0).splitCells(maxCellSize = 1 << 20)
    val merged = noop.mergeWith(shardHandle(t, 1))
    merged.nprobe = 2
    val single = VectorDB.fromDataFrame(e, dims = 64, P)
    single.buildIndexShared(t)
    single.nprobe = 2
    val qv = qvOf(73L)
    assert(served(merged, qv) == served(single, qv),
      "no-op split broke merge parity with the single shared build")
  }

  test("a rejected merge unpersists the union it materialized (ADVICE r16 error path)") {
    def census(): Int = spark.sparkContext.getPersistentRDDs.size
    val t = SharedTraining.train(e, dims = 64, mode = "pq", metric = Knn.L2,
      numCells = 4, routerIters = 1)
    val a = shardHandle(t, 0)
    val dup = shardHandle(t, 0)
    // materialize the shards' own (legitimate) caches first — persist
    // registers the RDD only at first use, and the merge's duplicate
    // aggregate would otherwise register them inside the window
    a.search(qvOf(2L), 1).count(); dup.search(qvOf(2L), 1).count()
    val before = census()
    intercept[IllegalArgumentException] { a.mergeWith(dup) }
    assert(census() == before,
      "rejected compressed merge leaked cached union blocks")
    // the HNSW-index arm (HnswIndex.merge / mergeAll) has the same
    // contract: duplicate-id rejection must not pin the union
    def localShard(): VectorDB = {
      val db = VectorDB.fromDataFrame(
        e.filter(col("vec_id") % 2 === 0), dims = 64, P)
      db.buildIndexIvf(numCells = 4, iters = 1)
      db
    }
    val h = localShard(); val hDup = localShard()
    h.search(qvOf(2L), 1).count(); hDup.search(qvOf(2L), 1).count()
    val beforeH = census()
    intercept[IllegalArgumentException] { h.mergeWith(hDup) }
    assert(census() == beforeH,
      "rejected HNSW merge leaked cached union blocks")
    val beforeN = census()
    intercept[IllegalArgumentException] { h.mergeAllWith(Seq(hDup)) }
    assert(census() == beforeN,
      "rejected HNSW mergeAll leaked cached union blocks")
  }

  test("merge -> splitCells composition: the merged shared handle splits routably and serves conserved") {
    // the compressed post-merge lifecycle: a fixed shared router means
    // merged shards pile rows into the same cells — split restores
    // probe selectivity. Shared status drops (the split router
    // diverges from the artifact), serving must not change at
    // exhaustive probing, and the split cells must stay routable.
    val t = SharedTraining.train(e, dims = 64, mode = "sq", metric = Knn.L2,
      numCells = 4, routerIters = 1)
    val merged = shardHandle(t, 0).mergeWith(shardHandle(t, 1))
    merged.nprobe = 4
    val split = merged.splitCells(maxCellSize = 64)
    val st = split.stats.head()
    assert(st.getAs[Long]("n_cells") > 4L && st.getAs[Long]("n_indexed") == 500L, st)
    split.nprobe = st.getAs[Long]("n_cells").toInt
    val qv = qvOf(83L)
    val exhaustive = merged.search(qv, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(split.search(qv, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == exhaustive,
      "split changed exhaustive-probe serving on the merged handle")
    // shared status dropped: a further merge with an un-split shard
    // must reject rather than reconcile divergent routers
    val eMix = intercept[IllegalArgumentException] {
      split.mergeWith(shardHandle(t, 0))
    }
    assert(eMix.getMessage.contains("shard-local") ||
      eMix.getMessage.contains("mixed"), eMix.getMessage)
  }

  test("reshare: split -> reshare -> merge-more ≡ one shared build; v1 shards reject against v2") {
    val t1 = SharedTraining.train(e, dims = 64, mode = "pq", metric = Knn.L2,
      numCells = 4, routerIters = 1)
    def shard(pred: org.apache.spark.sql.Column, t: SharedTraining): VectorDB = {
      val db = VectorDB.fromDataFrame(e.filter(pred), dims = 64, P)
      db.buildIndexShared(t)
      db
    }
    val merged = shard(col("vec_id") % 4 < 2, t1)
      .mergeWith(shard(col("vec_id") % 4 === 2, t1))
    val split = merged.splitCells(maxCellSize = 64)
    val v2 = split.reshare()
    assert(v2.fingerprint != t1.fingerprint,
      "a real split must mint a NEW fingerprint (the router diverged)")
    // v1-encoded late shards reject loudly against the v2 handle
    val eV1 = intercept[IllegalArgumentException] {
      split.mergeWith(shard(col("vec_id") % 4 === 3, t1))
    }
    assert(eV1.getMessage.contains("fingerprint mismatch"), eV1.getMessage)
    // v2-encoded late shard merges; exhaustive probing ≡ ONE shared
    // v2 build over the union corpus (codes are global — only routing
    // metadata differs, and exhaustive probing erases that too)
    val fin = split.mergeAllWith(Seq(shard(col("vec_id") % 4 === 3, v2)))
    val cells = fin.stats.head().getAs[Long]("n_cells").toInt
    fin.nprobe = cells
    val single = VectorDB.fromDataFrame(e, dims = 64, P)
    single.buildIndexShared(v2)
    single.nprobe = cells
    val qv = qvOf(89L)
    assert(served(fin, qv) == served(single, qv),
      "reshared lifecycle diverged from the single v2 shared build")
    // and the reshared handle's OWN next split/merge round still works
    // (the rolling-pipeline claim): reshare is not a one-shot
    val split2 = fin.splitCells(maxCellSize = 48)
    val v3 = split2.reshare()
    assert(v3.fingerprint != v2.fingerprint)
  }

  test("sample-trained artifacts: quality degrades gracefully, never correctness (the 100 TB training contract)") {
    // the real 100 TB shape: codebooks/router train on a SAMPLE (here
    // the lowest-id 25%), the dot norm bound comes from a full
    // max-norm pass (one cheap aggregate — sampling IT would be a
    // correctness bug, not a quality one; the loud-check test above)
    val sample = e.filter(col("vec_id") < 125)
    val full = e
    def recallOf(t: SharedTraining): Double = {
      val db = VectorDB.fromDataFrame(e, dims = 64, P)
      db.buildIndexShared(t)
      db.nprobe = 3
      val qids = Seq(43L, 47L, 53L, 59L, 61L, 67L, 71L, 73L)
      val scores = qids.map { q =>
        val qv = qvOf(q)
        val exact = graft.operators.Knn.searchKnn(e, qv, 10)
          .collect().map(_.getLong(0)).toSet
        // refined serving: the ADC shortlist re-scores exactly, so the
        // only quality channel left is ROUTING + shortlist membership —
        // the two things sample training can degrade
        val got = db.searchRefined(qv, k = 10, refine = 8)
          .collect().map(_.getLong(0)).toSet
        exact.count(got.contains).toDouble / exact.size
      }
      scores.sum / scores.size
    }
    val fullTrained = recallOf(SharedTraining.train(full, dims = 64,
      mode = "pq", metric = Knn.L2, numCells = 4, routerIters = 1))
    val sampleTrained = recallOf(SharedTraining.train(sample, dims = 64,
      mode = "pq", metric = Knn.L2, numCells = 4, routerIters = 1))
    info(f"recall@10 (nprobe 3/4, refine 8): full-trained $fullTrained%.3f, " +
      f"sample-trained (25%%) $sampleTrained%.3f")
    assert(sampleTrained >= 0.6,
      f"sample-trained recall $sampleTrained%.3f below the contract floor")
    assert(sampleTrained >= fullTrained - 0.25,
      f"sample training degraded recall past the graceful band: " +
        f"$sampleTrained%.3f vs $fullTrained%.3f")
  }

  test("in-bound maintenance keeps merge compatibility; bound-expanding adds fail with the retrain message") {
    val t = SharedTraining.train(e, dims = 64, mode = "pq", metric = Knn.Dot,
      numCells = 4, routerIters = 1)
    // id+vec corpora on BOTH sides: add() narrows its derived handle to
    // the served columns, and merge requires matching corpus schemas
    def narrowShard(parity: Int): VectorDB = {
      val db = VectorDB.fromDataFrame(
        e.select(col("vec_id"), col("embedding"))
          .filter(col("vec_id") % 2 === parity), dims = 64, P)
      db.buildIndexShared(t)
      db
    }
    val a = narrowShard(0)
    // in-bound add (an existing vector under a fresh id keeps every
    // norm under the trained bound): the derived handle still merges
    val row3 = e.filter(col("vec_id") === 3L)
      .select((col("vec_id") + 300000L).as("vec_id"), col("embedding"))
    val aAdded = a.add(row3)
    val merged = aAdded.mergeWith(narrowShard(1))
    merged.nprobe = 4
    val got = served(merged, qvOf(3L)).map(_._1)
    assert(got.contains(300003L) && got.contains(3L),
      s"maintained shared shard lost the added row after merge: $got")
    // norm-expanding add: global geometry — the shard must NOT quietly
    // retrain its own artifact
    val big = e.filter(col("vec_id") === 3L)
      .select((col("vec_id") + 400000L).as("vec_id"),
        transform(col("embedding"), x => x * 1000.0f).as("embedding"))
    val eEx = intercept[IllegalStateException] { aAdded.add(big) }
    assert(eEx.getMessage.contains("retrain SharedTraining"), eEx.getMessage)
  }
}
