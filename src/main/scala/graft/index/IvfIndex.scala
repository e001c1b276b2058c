package graft.index

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Trained IVF coarse quantizer: seeded Lloyd's k-means over the
  * vector table, used to route vectors into ANN cells (the partition
  * key for per-cell HNSW graphs) and queries into probed cells.
  *
  * Scale shape: the centroid model is O(k·d) — it lives on the driver
  * and broadcasts to tasks (exactly how MLlib's KMeans iterates);
  * assignment is one map pass over the corpus, the mean update is one
  * decimal-exact aggregation. Nothing corpus-sized ever reaches the
  * driver. Determinism: init = the k lowest-id vectors, means
  * accumulate in exact decimals, ties in assignment break toward the
  * lower cell id — training is bit-reproducible run to run.
  *
  * (Extension: the reference has no quantizer — its coarse-to-fine
  * structure is the HNSW layer hierarchy, `/root/reference/src/lib.rs:152-169`;
  * IVF is the standard set-oriented replacement at cluster scale.)
  */
object IvfIndex {

  /** `centroids(ord)` routes to cell id `cellIds(ord)`. `cellIds` is
    * empty for identity routing (trained models: cells 0..k-1); a
    * partition-derived router carries the actual part keys, sorted
    * ascending, so a sparse or large key space costs O(#cells·d) —
    * never O(maxKey·d) (a hash-derived part key must not size a dense
    * driver array). */
  final case class Model(centroids: Array[Array[Double]], cellIds: Array[Int] = Array.empty) {
    def k: Int = centroids.length
    /** Cell id for centroid ordinal `ord`. */
    def cellId(ord: Int): Int = if (cellIds.isEmpty) ord else cellIds(ord)
    def assignOne(v: Array[Float]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val cv = centroids(c)
        var d = 0.0
        var i = 0
        while (i < cv.length) {
          val t = cv(i) - v(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict < keeps lower cell on ties
        c += 1
      }
      cellId(best)
    }
    /** Cells sorted by centroid distance to the query, closest first. */
    def probeOrder(q: Array[Float]): Array[Int] =
      probeOrderWithDist(q).map(_._2)

    private def probeOrderWithDist(q: Array[Float]): Array[(Double, Int)] =
      centroids.indices
        .map { c =>
          val cv = centroids(c)
          var d = 0.0
          var i = 0
          while (i < cv.length) { val t = cv(i) - q(i); d += t * t; i += 1 }
          (d, cellId(c))
        }
        .sorted.toArray

    /** Adaptive probe set: cells closest-first until `maxProbes` are
      * taken or the next cell's centroid distance exceeds
      * `alpha ×` the nearest cell's — a diminishing-returns cutoff, so
      * a query deep inside a cluster probes 1-2 cells while a
      * boundary query (near-tied centroids) fans as wide as a fixed
      * nprobe would. Always probes at least the nearest cell. At scale
      * this trades a fixed scan fraction (nprobe/L) for a
      * per-query-difficulty one, cutting mean probe cost at equal
      * recall. */
    def probeAdaptive(q: Array[Float], alpha: Double, maxProbes: Int): Array[Int] = {
      require(alpha >= 1.0 && maxProbes >= 1, "alpha >= 1 and maxProbes >= 1")
      val ordered = probeOrderWithDist(q)
      // the nearest cell always survives: d0 <= d0*alpha for alpha >= 1
      val cutoff = ordered.head._1 * alpha
      ordered.take(maxProbes).takeWhile(_._1 <= cutoff).map(_._2)
    }
  }

  /** Sublinear query routing over the centroid table itself — the
    * second routing level a 100 TB index needs. Flat routing
    * ([[Model.probeOrder]]) scans every centroid per query: at ~1 M
    * vectors per cell, a 100 TB/512-dim corpus carries ~50 k-500 k
    * cells, so O(L·d) per query becomes the serving bottleneck long
    * before the cell scans do (the standard coarse-quantizer scaling
    * wall — FAISS meets it with an HNSW coarse quantizer, the
    * IVF_HNSW layout). This router walks an HNSW graph built OVER THE
    * CENTROIDS instead: O(ef·log L) distance evaluations per query.
    *
    * Scale + determinism shape: the graph is built once, driver-side,
    * from the O(L·d) model artifact (the same bounded object that
    * already broadcasts — nothing corpus-sized is touched) with the
    * deterministic [[Hnsw.levelFor]] ordinal levels, so the build is
    * bit-reproducible. The walk navigates in float (the graph storage
    * dtype); the ≤ ef surfaced candidates then RE-RANK in the
    * router's own double space with the cell-id tiebreak — so at
    * exhaustive ef (≥ L, connected layer 0) the probe set is
    * bit-identical to [[Model.probeOrder]], which is what anchors the
    * oracle gate; at production ef the probe set is approximate and
    * its recall is pinned by a measured RecallSpec floor, the
    * q_maxsim_routed convention. [[probeAdaptive]]'s
    * diminishing-returns cutoff applies unchanged over the re-ranked
    * candidates (identical math at exhaustive ef). */
  final class GraphRouter(val model: Model,
      params: HnswParams = HnswParams(m = 8, efConstruction = 32)) {
    private val graph = HnswGraph.build(
      params,
      model.centroids.map(cv => cv.map(_.toFloat)).toIndexedSeq,
      ord => Hnsw.levelFor(ord.toLong, params.mL))

    /** Graph-walk distance evaluations during the last [[probeWithDist]]
      * call — the measured sublinearity evidence (flat routing always
      * evaluates exactly L). */
    @volatile var lastEvals: Long = 0L

    /** Up to `nprobe` nearest cells: float graph walk at beam
      * max(ef, nprobe) — defaulting ef to the graph's efConstruction —
      * then double re-rank of the surfaced candidates. */
    def probe(q: Array[Float], nprobe: Int, ef: Int = -1): Array[Int] =
      probeWithDist(q, nprobe, ef).map(_._2)

    /** The adaptive arm over graph candidates: same cutoff rule as
      * [[Model.probeAdaptive]] (closest-first until distance exceeds
      * alpha × the nearest), applied to the re-ranked candidate list. */
    def probeAdaptive(q: Array[Float], alpha: Double, maxProbes: Int,
        ef: Int = -1): Array[Int] = {
      require(alpha >= 1.0 && maxProbes >= 1, "alpha >= 1 and maxProbes >= 1")
      val ordered = probeWithDist(q, maxProbes, ef)
      val cutoff = ordered.head._1 * alpha
      ordered.takeWhile(_._1 <= cutoff).map(_._2)
    }

    private def probeWithDist(q: Array[Float], nprobe: Int, ef: Int): Array[(Double, Int)] = {
      require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
      // the beam never drops below nprobe — an ef smaller than the
      // probe count would silently return fewer cells than the flat
      // router's min(nprobe, L) contract; default = max(efc, nprobe)
      val beam = math.max(if (ef > 0) ef else params.efConstruction, nprobe)
      // synchronized: the router is session-memoized and shared; the
      // graph's eval counter (and its internal beam scratch) must not
      // interleave across concurrent driver-side probes — probes are
      // sub-ms, so serializing them is the cheap correct choice
      graph.synchronized {
        graph.resetDistEvals()
        // k = beam: surface the WHOLE beam, not just nprobe — the double
        // re-rank below needs every candidate the walk found
        val cand = graph.searchEf(q, beam, beam)
        lastEvals = graph.distEvals
        val reranked = cand.map { case (ord, _) =>
          val cv = model.centroids(ord)
          var d = 0.0
          var i = 0
          while (i < cv.length) { val t = cv(i) - q(i); d += t * t; i += 1 }
          (d, model.cellId(ord))
        }.sorted
        reranked.take(nprobe).toArray
      }
    }
  }

  /** Exact-decimal per-cell mean of the assigned vectors (the same
    * deterministic-centroid construction the q_ann_ivf oracle uses). */
  private def cellMeans(assigned: DataFrame, vecCol: String): Map[Int, Array[Double]] =
    assigned
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg((sum(col("x").cast("decimal(18,12)")).cast("double") / count(lit(1))).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))), s => s("m")).as("cv"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .toMap

  /** Router model from an existing partitioning: centroid c = the
    * decimal-exact mean of the vectors whose `partCol` equals c (the
    * same deterministic construction the q_ann_ivf oracle SQL uses),
    * so `Model.probeOrder` routes queries to partition keys directly.
    * Backed by a (sorted cell ids, centroids) pair — driver memory is
    * O(#cells·d) regardless of the key space, so sparse or
    * hash-derived part keys (any `Int`, holes included) route without
    * densifying. */
  def fromPartitionMeans(df: DataFrame, partCol: String = "label",
      vecCol: String = "embedding"): Model = {
    val means = cellMeans(df.withColumn("cell", col(partCol).cast("int")), vecCol)
    require(means.nonEmpty, "cannot build a router over an empty corpus")
    val sorted = means.toArray.sortBy(_._1)
    Model(sorted.map(_._2), sorted.map(_._1))
  }

  /** Train with fixed iterations (Lloyd's: inertia is monotonically
    * non-increasing; fixed iters keep the train deterministic). */
  def train(df: DataFrame, k: Int, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val init = df.orderBy(col(idCol).asc).limit(k)
      .select(col(vecCol).cast("array<double>"))
      .as[Array[Double]].collect()
    // corpora smaller than k train with one cell per row
    val kEff = init.length
    require(kEff > 0, "cannot train IVF on an empty corpus")
    var model = Model(init)
    var it = 0
    while (it < iters) {
      val means = cellMeans(assign(df, model, idCol, vecCol), vecCol)
      // empty cells keep their previous centroid (standard Lloyd's fix)
      model = Model(Array.tabulate(kEff)(c => means.getOrElse(c, model.centroids(c))))
      it += 1
    }
    model
  }

  /** Nearest-centroid cell as a pure column expression: the centroid
    * model rides along as a reference object (broadcast with the task
    * binary), so assignment is a map-only pass — no join, no shuffle.
    * Ties break to the lowest cell ordinal, matching
    * [[Model.assignOne]]. Fused into one native codegen kernel
    * ([[graft.functions.expressions.IvfAssign]]) — the HOF
    * `transform(centroids, cv => aggregate(zip_with(...)))` form paid
    * interpreted lambda dispatch per centroid per element (2.8 s at
    * sf0.1 for 62 cells; the kernel runs it in one codegen loop). */
  def assignExpr(vec: org.apache.spark.sql.Column, model: Model): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    val dim = model.centroids.head.length
    toCol(graft.functions.expressions.IvfAssign(
      toExpr(vec), model.centroids.flatten, model.cellIds, dim))
  }

  /** Add a `cell` column: each vector's nearest centroid. */
  def assign(df: DataFrame, model: Model,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.withColumn("cell", assignExpr(col(vecCol), model))

  /** Router-staleness census — the MONITORING counterpart to the
    * shared-training retrain contract ([[graft.index.SharedTraining]]
    * fails loudly when new data breaks a trained bound; this op tells
    * you it is COMING): assign two epochs of vectors to THIS router's
    * cells and return the per-cell population census
    * `(cell, ca, cb)` — feed it to
    * [[graft.operators.Profile.psiFromCensus]] for the drift number
    * that gates "retrain the router". A router trained on epoch A
    * serves epoch B exactly as well as B's cell populations still
    * match A's; population shift IS recall erosion in the making
    * (probed cells stop covering the data).
    *
    * Scale shape: two map-only [[assignExpr]] passes (the codegen
    * kernel — no join, no shuffle until the O(#cells) census), one
    * full-outer cell join. Cells empty in one epoch carry 0 and are
    * add-one smoothed by the PSI assembly; cells empty in BOTH are
    * absent (the psi "observed domain" convention). */
  def cellDrift(model: Model, a: DataFrame, b: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val ca = a.select(assignExpr(col(vecCol), model).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("ca"))
    val cb = b.select(assignExpr(col(vecCol), model).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("cb"))
    ca.join(cb, Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
  }

  /** Total within-cluster squared distance (training diagnostic). */
  def inertia(df: DataFrame, model: Model,
      idCol: String = "vec_id", vecCol: String = "embedding"): Double = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    df.select(col(vecCol).cast("array<float>")).as[Array[Float]]
      .map { v =>
        val cv = bc.value.centroids(bc.value.assignOne(v))
        var d = 0.0
        var i = 0
        while (i < cv.length) { val t = cv(i) - v(i); d += t * t; i += 1 }
        d
      }
      .reduce(_ + _)
  }
}
