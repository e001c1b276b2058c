package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.index.{Hnsw, HnswGraph, HnswParams}
import graft.operators.TopKAggregator

/** Property-based invariants (SURVEY.md §5 item 2: the self-query
  * property over random vectors, plus kernel and aggregator algebra). */
object HnswProperties extends Properties("graft") {

  private val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](8, Gen.chooseNum(-100f, 100f))

  /** Self-query corpora snap to a 0.5-spaced grid and drop exact
    * duplicates, so distinct vectors are >= 0.25 apart in L2². The
    * strict distance-0 invariant presumes separated points — the
    * continuous generator can emit adjacent-ulp near-twins (pairs
    * ~1e-10 apart) that legitimately shadow the query row in an
    * approximate beam search, which falsifies the property without
    * any engine bug. The reference's own test draws continuous
    * random vectors where twins never occur (src/lib.rs:540-549). */
  private val gridVecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](8, Gen.chooseNum(-200, 200).map(_ / 2.0f))

  private val corpusGen: Gen[IndexedSeq[Array[Float]]] =
    Gen.chooseNum(1, 60)
      .flatMap(n => Gen.containerOfN[Vector, Array[Float]](n, gridVecGen))
      .map(_.distinctBy(_.toSeq))

  /** NoShrink: ScalaCheck shrinking mutates the generated FLOATS and
    * silently breaks the grid invariant above (a shrunk corpus can
    * contain a 1e-10 near-twin of the query, which then legitimately
    * tops the beam — a round-12 flake reproduced exactly that).
    * Exhaustive ef + the single-component guard make this a
    * DETERMINISTIC correctness property (the beam visits every
    * reachable node) rather than a recall gamble on the default
    * beam width — the same discipline as the filtered property
    * below; in exchange the assertion strengthens to identity, not
    * just distance zero. */
  property("selfQuerySearchReturnsDistanceZero (ref src/lib.rs:546-549)") =
    Prop.forAllNoShrink(corpusGen) { vecs =>
      val p = HnswParams(8, 16)
      val g = HnswGraph.build(p, vecs, ord => Hnsw.levelFor(ord.toLong, p.mL))
      (g.layer0Components == 1) ==> Prop.all(vecs.indices.take(10).map { i =>
        val hits = g.searchEf(vecs(i), 1, ef = vecs.length + 1, _ => true)
        Prop(hits.nonEmpty && hits.head._1 == i && hits.head._2 == 0.0) :|
          s"self-query miss at $i: $hits"
      }: _*)
    }

  /** Filtered beam at exhaustive ef ≡ brute force over the matching
    * subset (single-component graphs: the beam can then reach every
    * node, so only result-admission — not navigation — is filtered).
    * Distances compare as sequences (tie ORDER among equal distances
    * is heap-dependent; the distance profile is not). */
  property("filteredExhaustiveSearchEqualsBruteForceOverMatches") =
    forAll(corpusGen, Gen.chooseNum(2, 5)) { (vecs, mod) =>
      val p = HnswParams(8, 16)
      val g = HnswGraph.build(p, vecs, ord => Hnsw.levelFor(ord.toLong, p.mL))
      (g.layer0Components == 1) ==> Prop.all(vecs.indices.take(3).map { i =>
        val q = vecs(i)
        val keep: Int => Boolean = ord => ord % mod == 0
        val hits = g.searchEf(q, 5, ef = vecs.length + 1, keep)
        val expect = vecs.indices.filter(keep(_))
          .map(j => (j, Hnsw.l2Sq(q, vecs(j))))
          .sortBy(t => (t._2, t._1)).take(5)
        Prop(hits.map(_._2) == expect.map(_._2) && hits.forall(h => keep(h._1))) :|
          s"q=$i mod=$mod hits=$hits expect=$expect"
      }: _*)
    }

  /** The MIPS→L2 reduction behind `buildIndexIvf(metric = Dot)`
    * (VectorDB.mipsAugment): extending each vector with
    * sqrt(M²−‖x‖²) — M = max corpus norm — makes augmented-L2 order
    * against the 0-extended query equal dot-product order. The
    * extension is float-rounded exactly as the engine stores it, so
    * the property also bounds the reduction noise: on the 0.25-spaced
    * dot grid the served order's dot profile never deviates. */
  property("mipsAugmentationPreservesDotRanking (VectorDB dot serving)") =
    forAll(corpusGen, gridVecGen) { (vecs, q) =>
      def dot(a: Array[Float], b: Array[Float]): Double =
        a.iterator.zip(b.iterator).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val m2 = vecs.map(v => dot(v, v)).max
      val qAug = q :+ 0.0f
      def augL2(v: Array[Float]): Double = {
        val ext = math.sqrt(math.max(0.0, m2 - dot(v, v))).toFloat
        (v :+ ext).iterator.zip(qAug.iterator)
          .map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum
      }
      val byDot = vecs.map(v => dot(v, q)).sorted(Ordering[Double].reverse)
      val byAug = vecs.sortBy(augL2).map(v => dot(v, q))
      Prop.all(byDot.zip(byAug).map { case (a, b) =>
        Prop(math.abs(a - b) <= 0.2) :| s"augmented-L2 order broke dot order: $a vs $b"
      }: _*)
    }

  property("l2SqIsSymmetricAndNonNegative") =
    forAll(vecGen, vecGen) { (a, b) =>
      val d1 = Hnsw.l2Sq(a, b)
      val d2 = Hnsw.l2Sq(b, a)
      d1 == d2 && d1 >= 0.0 && Hnsw.l2Sq(a, a) == 0.0
    }

  property("topKAggregatorEqualsSortTake") =
    forAll(Gen.chooseNum(1, 8), Gen.listOf(Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0L, 1000L)))) {
      (k, xs) =>
        val agg = new TopKAggregator(k)
        val viaAgg = xs.foldLeft(agg.zero)(agg.reduce)
        val expected = xs.sortBy(t => (t._1, t._2)).take(k)
        viaAgg == expected
    }

  property("topKAggregatorMergeIsOrderInsensitive") =
    forAll(Gen.chooseNum(1, 5),
        Gen.listOf(Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0L, 1000L))),
        Gen.listOf(Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0L, 1000L)))) {
      (k, xs, ys) =>
        val agg = new TopKAggregator(k)
        val bx = xs.foldLeft(agg.zero)(agg.reduce)
        val by = ys.foldLeft(agg.zero)(agg.reduce)
        agg.merge(bx, by) == agg.merge(by, bx) &&
          agg.merge(bx, agg.zero) == bx
    }
}
