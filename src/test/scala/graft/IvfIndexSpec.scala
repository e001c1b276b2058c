package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.IvfIndex

/** Trained IVF quantizer tests: determinism, Lloyd's monotonicity, and
  * end-to-end VectorDB IVF+HNSW search. */
class IvfIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("training is deterministic run-to-run") {
    val m1 = IvfIndex.train(emb, k = 10, iters = 3)
    val m2 = IvfIndex.train(emb, k = 10, iters = 3)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("Lloyd's iterations do not increase inertia") {
    val i1 = IvfIndex.inertia(emb, IvfIndex.train(emb, 10, iters = 1))
    val i3 = IvfIndex.inertia(emb, IvfIndex.train(emb, 10, iters = 3))
    val i5 = IvfIndex.inertia(emb, IvfIndex.train(emb, 10, iters = 5))
    assert(i3 <= i1 + 1e-9 && i5 <= i3 + 1e-9, s"inertia rose: $i1 -> $i3 -> $i5")
  }

  test("expression assignment matches the driver-side model") {
    val model = IvfIndex.train(emb, 10, iters = 3)
    import spark.implicits._
    val fromExpr = IvfIndex.assign(emb, model).select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    val local = emb.select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> model.assignOne(v) }.toMap
    assert(fromExpr == local)
  }

  test("routed search: recall rises with nprobe and clears 0.8 at nprobe=5") {
    import spark.implicits._
    val P = graft.index.HnswParams(16, 32)
    val model = graft.index.IvfIndex.train(emb, k = 10, iters = 3)
    val idx = graft.index.HnswIndex.build(
      graft.index.IvfIndex.assign(emb, model).withColumn("part", col("cell")), P)
    val qids = Seq(0L, 7L, 42L, 99L, 250L, 333L, 444L, 499L)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = graft.operators.Knn.knnJoin(emb, queries, k = 10)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recallAt(nprobe: Int): Double = {
      val ann = graft.index.HnswIndex.search(idx, queries, k = 10, P,
          router = Some(model), nprobe = nprobe)
        .select("qid", "vector_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      qids.map { q => ann.getOrElse(q, Set.empty).intersect(exact(q)).size / 10.0 }.sum / qids.length
    }
    val (r1, r3, r5) = (recallAt(1), recallAt(3), recallAt(5))
    // probing more cells only adds candidates -> recall is monotone
    assert(r1 <= r3 + 1e-9 && r3 <= r5 + 1e-9, s"recall not monotone: $r1, $r3, $r5")
    assert(r5 >= 0.8, s"recall@10 with nprobe=5: $r5 (nprobe=1: $r1, nprobe=3: $r3)")
  }

  // ---- GraphRouter: the sublinear second routing level ----

  /** Deterministic synthetic centroid table: a many-cell routing
    * problem (the regime the graph router exists for) without needing
    * a many-cell corpus — the router only ever sees the O(L·d) model. */
  private def syntheticModel(l: Int, d: Int, seed: Int): IvfIndex.Model = {
    val rnd = new scala.util.Random(seed)
    IvfIndex.Model(Array.fill(l)(Array.fill(d)(rnd.nextGaussian())))
  }

  test("graph router at exhaustive ef is bit-identical to the flat probe order") {
    val model = IvfIndex.fromPartitionMeans(emb, "label", "embedding")
    val g = new IvfIndex.GraphRouter(model)
    val qs = emb.select(col("embedding").cast("array<float>"))
      .limit(20).collect().map(_.getSeq[Float](0).toArray)
    qs.foreach { q =>
      val flat = model.probeOrder(q).take(4).toSeq
      val walked = g.probe(q, nprobe = 4, ef = math.max(64, model.k)).toSeq
      assert(walked == flat, s"exhaustive graph probe diverged: $walked vs $flat")
      // the adaptive cutoff composes identically at exhaustive ef
      val flatA = model.probeAdaptive(q, alpha = 2.0, maxProbes = 4).toSeq
      val walkedA = g.probeAdaptive(q, alpha = 2.0, maxProbes = 4,
        ef = math.max(64, model.k)).toSeq
      assert(walkedA == flatA, s"adaptive graph probe diverged: $walkedA vs $flatA")
    }
  }

  test("graph router at production ef: probe-set recall >= 0.9 at <= a third of the distance evals of flat routing (L=4096)") {
    val l = 4096
    val model = syntheticModel(l, d = 32, seed = 7)
    // denser graph than the default: i.i.d. 32-dim centroids are the
    // hardest navigation case (no cluster structure), m=16 buys the
    // connectivity back
    val g = new IvfIndex.GraphRouter(model,
      graft.index.HnswParams(m = 16, efConstruction = 64))
    val rnd = new scala.util.Random(11)
    val nprobe = 8
    val ef = 64 // production beam: ~L/64 surfaced candidates
    var hit = 0
    var tot = 0
    var evals = 0L
    (1 to 100).foreach { _ =>
      val q = Array.fill(32)(rnd.nextGaussian().toFloat)
      val truth = model.probeOrder(q).take(nprobe).toSet
      val walked = g.probe(q, nprobe, ef).toSet
      evals += g.lastEvals
      hit += walked.intersect(truth).size
      tot += nprobe
    }
    val recall = hit.toDouble / tot
    val meanEvals = evals.toDouble / 100
    info(f"probe-set recall@$nprobe: $recall%.3f, mean distance evals $meanEvals%.1f of $l cells")
    // measured 2026-08-15 (seeded fixture — stable): recall and mean
    // evals recorded in BASELINE.md; floors with drift margin. The
    // i.i.d. Gaussian fixture is the WORST case for a graph walk (no
    // cluster structure to exploit), so these floors are conservative.
    assert(recall >= 0.9, f"graph-probe recall regressed: $recall%.3f (floor 0.9)")
    assert(meanEvals <= l / 3.0,
      f"graph routing evaluated $meanEvals%.1f >= L/3 = ${l / 3} distances — not sublinear")
  }

  test("VectorDB graphRouteEf: graph-routed handle serves identically to flat routing at exhaustive beams") {
    import spark.implicits._
    val qv = emb.filter(col("vec_id") === 7L)
      .select(col("embedding").cast("array<float>")).as[Array[Float]].collect()(0).toSeq
    def open() = {
      val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64)
      db.buildIndexIvf(numCells = 8, iters = 1)
      db.efSearch = 4096
      db
    }
    val flat = open()
    val graph = open()
    graph.graphRouteEf = 64 // >= L = 8: exhaustive walk, flat-identical probes
    def rows(db: VectorDB) =
      db.search(qv, k = 5).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows(graph) == rows(flat),
      "graph-routed handle must serve the flat-routed answer at exhaustive beams")
    // retrain invalidates the cached centroid graph (eq-based rebuild):
    // the retrained graph handle must match a retrained FLAT handle,
    // not the stale 8-cell routing
    graph.buildIndexIvf(numCells = 4, iters = 1)
    graph.efSearch = 4096
    flat.buildIndexIvf(numCells = 4, iters = 1)
    flat.efSearch = 4096
    assert(rows(graph) == rows(flat),
      "after retrain the graph router must re-derive from the new centroids")
  }

  test("VectorDB end-to-end: IVF-partitioned HNSW self-query") {
    val db = VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64)
    db.buildIndexIvf(numCells = 8, iters = 3)
    import spark.implicits._
    val qv = emb.filter(col("vec_id") === 42L)
      .select(col("embedding").cast("array<float>")).as[Array[Float]].collect()(0)
    val hits = db.search(qv.toSeq, k = 3).collect()
    assert(hits.nonEmpty)
    // every dispatch arm serves the id under idCol ("vec_id")
    assert(hits(0).getAs[Long]("vec_id") == 42L, s"self-query must rank itself first: ${hits.toSeq}")
    assert(hits(0).getAs[Double]("dist") < 1e-4)
  }
}
