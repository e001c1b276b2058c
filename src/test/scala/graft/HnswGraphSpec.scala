package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Hnsw, HnswGraph, HnswParams}

/** Pure-Scala HNSW graph tests mirroring the reference's unit suite
  * (`/root/reference/src/lib.rs:360-514`). */
class HnswGraphSpec extends AnyFunSuite {

  private def v(xs: Float*): Array[Float] = xs.toArray

  // ref test_hnsw_structure (`src/lib.rs:394-406`): 4 vectors, M=16/efc=32
  test("structure: all inserted nodes exist and an entry point is set") {
    val vecs = IndexedSeq(v(1, 1), v(2, 2), v(3, 3), v(10, 10))
    val g = HnswGraph.build(HnswParams(16, 32), vecs, _ => 0)
    assert(g.size == 4)
    assert(g.entry >= 0)
  }

  // ref test_connection_pruning (`src/lib.rs:409-467`): tight cluster,
  // minimum M — degree stays capped and the closest neighbors survive
  test("pruning: layer-0 degree <= mMax0 and closest neighbors kept") {
    val p = HnswParams(1, 32) // clamps to m=2, mMax0=4 (ref src/lib.rs:131-138)
    assert(p.mEff == 2 && p.mMax0 == 4)
    val vecs = IndexedSeq(
      v(0.0f, 0.0f),   // 0: origin
      v(0.1f, 0.0f),   // 1: closest
      v(0.0f, 0.1f),   // 2: second closest
      v(5.0f, 5.0f),   // 3: far
      v(6.0f, 6.0f))   // 4: far
    val g = HnswGraph.build(p, vecs, _ => 0)
    val n0 = g.neighbors(0, 0)
    assert(n0.length <= p.mMax0)
    assert(n0.contains(1) && n0.contains(2),
      s"closest neighbors (1,2) must survive pruning; got $n0")
  }

  // ref test_end_to_end_search (`src/lib.rs:470-514`): known points,
  // query at origin, k=2 → exactly [0, 1] ascending by distance
  test("end-to-end: search returns the true nearest in order") {
    val vecs = IndexedSeq(v(0.1f, 0.1f), v(1, 1), v(5, 5), v(10, 10))
    val g = HnswGraph.build(HnswParams(16, 32), vecs, _ => 0)
    val hits = g.search(v(0, 0), 2)
    assert(hits.map(_._1) == Seq(0, 1), s"got $hits")
    assert(hits(0)._2 < hits(1)._2)
  }

  test("empty graph returns no results (ref src/lib.rs:153-155)") {
    val g = HnswGraph.build(HnswParams(16, 32), IndexedSeq.empty, _ => 0)
    assert(g.search(v(0, 0), 5).isEmpty)
  }

  test("level sampling is exponential-ish and deterministic (ref src/lib.rs:144-150)") {
    val mL = HnswParams(16, 32).mL
    val levels = (0L until 10000L).map(Hnsw.levelFor(_, mL))
    assert(levels.min == 0)
    val h = levels.groupBy(identity).view.mapValues(_.size).toMap
    assert(h(0) > h.getOrElse(1, 0), "level 0 must dominate")
    assert(levels == (0L until 10000L).map(Hnsw.levelFor(_, mL)), "deterministic")
  }

  test("multi-layer graphs: descent from upper layers still finds nearest") {
    val rnd = new scala.util.Random(7)
    val vecs = IndexedSeq.fill(300)(Array.fill(8)(rnd.nextFloat()))
    val p = HnswParams(16, 32)
    val g = HnswGraph.build(p, vecs, ord => Hnsw.levelFor(ord.toLong, p.mL))
    assert(g.topLayer >= 1, "expect at least one upper layer at n=300")
    // self-query invariant (ref src/lib.rs:546-549)
    (0 until 300 by 37).foreach { i =>
      val hits = g.search(vecs(i), 1)
      assert(hits.head._1 == i && hits.head._2 < 1e-4, s"self-query failed for $i: $hits")
    }
  }
}
