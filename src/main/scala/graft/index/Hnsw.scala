package graft.index

import scala.collection.mutable

/** HNSW build/search parameters.
  *
  * Derivations follow the reference (`/root/reference/src/lib.rs:127-142`):
  * m is clamped to >= 2, layer-0 degree cap is 2m, and the level-sampling
  * factor is 1/ln(m). `efSearch = max(efConstruction, k)` at query time
  * (`src/lib.rs:164`).
  */
final case class HnswParams(m: Int = 16, efConstruction: Int = 32) {
  val mEff: Int = math.max(2, m)
  val mMax0: Int = mEff * 2
  val mL: Double = 1.0 / math.log(mEff.toDouble)
  def mMax(layer: Int): Int = if (layer == 0) mMax0 else mEff
}

object Hnsw {
  /** Deterministic level assignment: the reference samples
    * `floor(-ln(U(0,1]) * mL)` from an unseeded RNG
    * (`/root/reference/src/lib.rs:144-150`); we derive U from the vector
    * id with a Knuth multiplicative hash so builds are reproducible and
    * the level histogram is SQL-expressible for the oracle gate. */
  def levelFor(id: Long, mL: Double): Int = {
    // floorMod keeps u in (0, 1] even when id * 2654435761 wraps
    // negative (ids beyond ~3.47e9 — well inside the 100 TB design
    // range); the plain % would yield u <= 0 -> NaN/Inf levels
    val u = (Math.floorMod(id * 2654435761L, 1000003L) + 1L).toDouble / 1000003.0
    math.min(62, math.floor(-math.log(u) * mL).toInt)
  }

  def l2Sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    s
  }
}

/** A partition-local HNSW graph: the sequential priority-queue walk is
  * inherently single-threaded (SURVEY.md §7.4), so each executor
  * partition owns an independent graph built inside `mapPartitions`;
  * cross-partition parallelism comes from IVF-style routing above it.
  *
  * Semantics mirror the reference: greedy descent with ef=1 above the
  * insertion level (`/root/reference/src/lib.rs:244-253`), beam search
  * with efConstruction per layer, bidirectional linking to the m
  * closest, degree-capped neighbor pruning by recomputed distance
  * (`src/lib.rs:271-290`), entry-point promotion (`src/lib.rs:298-301`),
  * and search = descent + layer-0 beam with `ef = max(efc, k)`
  * (`src/lib.rs:152-169`). Implementation is original Scala against the
  * published HNSW algorithm.
  */
final class HnswGraph(params: HnswParams, vectors: IndexedSeq[Array[Float]], levels: Int => Int) {

  /** adjacency(node)(layer) = neighbor node ordinals (mutable during build). */
  private val adjacency = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var entryPoint: Int = -1
  private var maxLayer: Int = 0

  def size: Int = adjacency.length
  def entry: Int = entryPoint
  def topLayer: Int = maxLayer

  /** Neighbors of `node` at `layer` (empty when the node tops out below). */
  def neighbors(node: Int, layer: Int): Seq[Int] = {
    val layers = adjacency(node)
    if (layer < layers.length) layers(layer).toSeq else Seq.empty
  }

  /** Number of layers this node participates in (top layer + 1). */
  def layerCount(node: Int): Int = adjacency(node).length

  /** The stored vector at `ord` — the driver-local serving path
    * re-scores candidates under the intended metric from it. */
  def vectorAt(ord: Int): Array[Float] = vectors(ord)

  def hasLayer(node: Int, layer: Int): Boolean = layer < adjacency(node).length

  /** Distance evaluations since [[resetDistEvals]] — a diagnostics
    * counter (one long increment beside a d-element float loop; used
    * by [[IvfIndex.GraphRouter]] to MEASURE routing sublinearity
    * instead of asserting it in prose). */
  private var evals: Long = 0L
  def distEvals: Long = evals
  def resetDistEvals(): Unit = evals = 0L

  private def dist(q: Array[Float], node: Int): Double = {
    evals += 1
    Hnsw.l2Sq(q, vectors(node))
  }

  /** Best-first beam search within one layer. Returns up to `ef`
    * (node, dist) pairs ascending by distance.
    *
    * `keep` is the filtered-ANN hook (the post-filtering strategy of
    * hnswlib/Qdrant-style engines): the beam NAVIGATES through every
    * node — the graph's small-world structure is only usable intact —
    * but the RESULT heap admits matching nodes only, so filtered-out
    * rows can bridge the walk yet never surface as hits. With the
    * default accept-all `keep` the walk is bit-identical to the
    * unfiltered one. */
  def searchLayer(q: Array[Float], entryId: Int, layer: Int, ef: Int,
      keep: Int => Boolean = _ => true): mutable.ArrayBuffer[(Int, Double)] = {
    val visited = mutable.BitSet(entryId)
    val d0 = dist(q, entryId)
    // candidates: closest first; results: farthest first (bounded at ef)
    val candidates = mutable.PriorityQueue((d0, entryId))(Ordering.by(-_._1))
    val results = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(_._1))
    if (keep(entryId)) results.enqueue((d0, entryId))

    while (candidates.nonEmpty) {
      val (cd, c) = candidates.dequeue()
      // size check FIRST: with a selective filter the result heap can be
      // empty while candidates remain (head would throw)
      if (results.size >= ef && cd > results.head._1) {
        candidates.clear() // all remaining candidates are farther still
      } else {
        val nbrs = adjacency(c)
        if (layer < nbrs.length) {
          nbrs(layer).foreach { n =>
            if (!visited(n)) {
              visited += n
              val d = dist(q, n)
              if (results.size < ef || d < results.head._1) {
                candidates.enqueue((d, n))
                if (keep(n)) {
                  results.enqueue((d, n))
                  if (results.size > ef) results.dequeue()
                }
              }
            }
          }
        }
      }
    }
    val out = mutable.ArrayBuffer.empty[(Int, Double)]
    val drained: Seq[(Double, Int)] = results.dequeueAll
    drained.reverseIterator.foreach { dn => out += ((dn._2, dn._1)) }
    out
  }

  /** Greedy single-path descent from the top layer down to `toLayer`
    * (exclusive), returning the entry for the next phase. */
  private def descend(q: Array[Float], toLayer: Int): Int = {
    var ep = entryPoint
    var layer = maxLayer
    while (layer > toLayer) {
      ep = searchLayer(q, ep, layer, 1).head._1
      layer -= 1
    }
    ep
  }

  /** Append a fully-formed node during reconstruction from persisted
    * adjacency (no linking, no pruning — the graph was already built). */
  private[index] def loadNode(layers: Array[mutable.ArrayBuffer[Int]]): Unit = {
    val node = adjacency.length
    adjacency += layers
    val top = layers.length - 1
    if (entryPoint < 0 || top > maxLayer) {
      entryPoint = node
      maxLayer = top
    }
  }

  /** Insert the next vector (ordinals must be appended 0,1,2,...). */
  def insert(node: Int): Unit = {
    val level = levels(node)
    val q = vectors(node)
    adjacency += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])

    if (entryPoint < 0) {
      entryPoint = node
      maxLayer = level
      return
    }

    var ep = descend(q, math.min(level, maxLayer))
    var layer = math.min(level, maxLayer)
    while (layer >= 0) {
      val found = searchLayer(q, ep, layer, params.efConstruction)
      val targets = found.take(params.mEff)
      targets.foreach { case (n, _) =>
        adjacency(node)(layer) += n
        adjacency(n)(layer) += node
        val cap = params.mMax(layer)
        if (adjacency(n)(layer).length > cap) {
          // prune back to the cap closest by recomputed distance
          val kept = adjacency(n)(layer)
            .map(x => (Hnsw.l2Sq(vectors(n), vectors(x)), x))
            .sorted
            .take(cap)
            .map(_._2)
          adjacency(n)(layer) = mutable.ArrayBuffer(kept.toSeq: _*)
        }
      }
      ep = found.head._1
      layer -= 1
    }

    if (level > maxLayer) {
      maxLayer = level
      entryPoint = node
    }
  }

  /** Number of connected components of the layer-0 graph. 1 means every
    * node is reachable from any beam start — the invariant that makes
    * exhaustive-ef search exact (degree-cap pruning can in principle
    * orphan a node; this makes the assumption checkable). */
  def layer0Components: Int = {
    val n = adjacency.length
    if (n == 0) return 0
    val seen = new mutable.BitSet(n)
    var components = 0
    var start = 0
    while (start < n) {
      if (!seen(start)) {
        components += 1
        val queue = mutable.Queue(start)
        seen += start
        while (queue.nonEmpty) {
          val c = queue.dequeue()
          adjacency(c)(0).foreach { nb =>
            if (!seen(nb)) { seen += nb; queue += nb }
          }
        }
      }
      start += 1
    }
    components
  }

  /** ANN top-k: empty-graph guard, descent to layer 1, layer-0 beam with
    * `ef = max(efConstruction, k)`, truncate to k ascending. */
  def search(q: Array[Float], k: Int): Seq[(Int, Double)] =
    searchEf(q, k, math.max(params.efConstruction, k))

  /** ANN top-k with an explicit beam width (recall/latency knob) and
    * an optional result predicate ([[searchLayer]]'s `keep` — descent
    * ignores it: upper layers only pick the navigation entry point). */
  def searchEf(q: Array[Float], k: Int, ef: Int,
      keep: Int => Boolean = _ => true): Seq[(Int, Double)] = {
    if (adjacency.isEmpty) return Seq.empty
    val ep = descend(q, 0)
    searchLayer(q, ep, 0, math.max(ef, k), keep).take(k).toSeq
  }
}

object HnswGraph {
  /** Build a graph over vectors in iteration order (ids are the caller's;
    * levels derived from the caller-supplied per-ordinal function). */
  def build(params: HnswParams, vectors: IndexedSeq[Array[Float]], levels: Int => Int): HnswGraph = {
    val g = new HnswGraph(params, vectors, levels)
    vectors.indices.foreach(g.insert)
    g
  }

  /** Reconstruct a searchable graph from persisted adjacency
    * (node ordinal -> layer -> neighbor ordinals). The entry point is
    * the lowest-ordinal node on the top layer — any top-layer node is a
    * valid entry; lowest makes reconstruction deterministic. */
  def fromAdjacency(
      params: HnswParams,
      vectors: IndexedSeq[Array[Float]],
      adj: IndexedSeq[Array[Array[Int]]]): HnswGraph = {
    val g = new HnswGraph(params, vectors, _ => 0)
    adj.foreach { layers =>
      g.loadNode(layers.map(l => mutable.ArrayBuffer(l.toSeq: _*)))
    }
    g
  }
}
