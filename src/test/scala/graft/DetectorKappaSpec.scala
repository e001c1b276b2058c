package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Detector-agreement kappa: hand-replayed rational arithmetic,
  * the chance-correction property, the negative-agreement arm's
  * explicit floor, and the loud constant-verdict rejection. */
class DetectorKappaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def kappa(n: Int, pairsA: Seq[(Long, Long)], pairsB: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val docs = (0 until n).map(_.toLong).toDF("doc_id")
    val r = Dedup.detectorKappa(docs,
      pairsA.toDF("a", "b"), pairsB.toDF("a", "b")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
  }

  test("identical detectors score exactly kappa = 1") {
    val p = Seq((0L, 1L), (2L, 3L))
    val (n, both, aOnly, bOnly, neither, k) = kappa(8, p, p)
    assert((n, both, aOnly, bOnly, neither) == (8L, 4L, 0L, 0L, 4L))
    assert(k == 1000000L, s"perfect agreement: $k")
  }

  test("hand case: one disputed doc — exact rational replay") {
    // A flags {0,1,2} (pairs 0-1, 1-2), B flags {0,1} only, n = 10:
    // n11 = 2, n10 = 1, n01 = 0, n00 = 7
    // po_n = 10·9 = 90; pe = a1·b1 + a0·b0 = 3·2 + 7·8 = 62
    // κ = (90 − 62)/(100 − 62) = 28/38 → floor(1e6·28/38) = 736842
    val (_, both, aOnly, bOnly, neither, k) =
      kappa(10, Seq((0L, 1L), (1L, 2L)), Seq((0L, 1L)))
    assert((both, aOnly, bOnly, neither) == (2L, 1L, 0L, 7L))
    assert(k == 736842L, s"hand kappa: $k")
  }

  test("systematic disagreement floors to a NEGATIVE kappa (not truncation)") {
    // A flags {0,1}, B flags {2,3}, n = 4: n11 = 0, n10 = 2, n01 = 2,
    // n00 = 0 → po_n = 0; pe = 2·2 + 2·2 = 8; κ = (0−8)/(16−8) = −1
    val (_, both, aOnly, bOnly, neither, k) =
      kappa(4, Seq((0L, 1L)), Seq((2L, 3L)))
    assert((both, aOnly, bOnly, neither) == (0L, 2L, 2L, 0L))
    assert(k == -1000000L, s"total disagreement: $k")
  }

  test("chance correction: high raw agreement from a rare class is NOT kappa 1") {
    // both flag doc 0-1 but A also flags 98-99: raw agreement 98/100,
    // kappa must sit well below 1 (and above 0 — they do co-flag)
    val (_, _, _, _, _, k) =
      kappa(100, Seq((0L, 1L), (98L, 99L)), Seq((0L, 1L)))
    assert(k > 0L && k < 900000L, s"chance-corrected: $k")
  }

  test("constant verdict vectors fail loudly") {
    import spark.implicits._
    val docs = (0 until 4).map(_.toLong).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    val e = intercept[Exception] {
      Dedup.detectorKappa(docs, none, none).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("constant"), s"$e")
  }

  // ---- adjusted Rand index (the clustering-level companion) ----------

  private def ari(n: Int, pairsA: Seq[(Long, Long)], pairsB: Seq[(Long, Long)])
      : (Long, Long, Long, Long) = {
    import spark.implicits._
    val docs = (0 until n).map(_.toLong).toDF("doc_id")
    val r = Dedup.adjustedRand(docs,
      pairsA.toDF("a", "b"), pairsB.toDF("a", "b")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Single-threaded ARI replay from cluster labelings. */
  private def naiveAri(la: Seq[Long], lb: Seq[Long]): Double = {
    val n = la.size
    val cells = la.zip(lb).groupBy(identity).view.mapValues(_.size.toLong)
    def ps(xs: Iterable[Long]) = xs.map(x => x * (x - 1)).sum.toDouble
    val sij = ps(cells.values)
    val sa = ps(la.groupBy(identity).view.mapValues(_.size.toLong).values)
    val sb = ps(lb.groupBy(identity).view.mapValues(_.size.toLong).values)
    val sn = n.toLong * (n - 1)
    2.0 * (sn * sij - sa * sb) / (sn * (sa + sb) - 2.0 * sa * sb)
  }

  test("ARI: identical partitions score exactly 1; degenerate all-singletons too") {
    val p = Seq((0L, 1L), (2L, 3L))
    assert(ari(8, p, p)._4 == 1000000L)
    assert(ari(8, Seq.empty, Seq.empty)._4 == 1000000L,
      "both all-singletons: the conventional ARI = 1 degenerate case")
  }

  test("ARI separates detectors kappa cannot: same flagged docs, different grouping") {
    // A groups {0,1,2,3} as one cluster; B as two pairs — the binary
    // dup-involved verdicts are IDENTICAL (kappa = 1) but the
    // partitions differ, so ARI < 1
    val a = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val b = Seq((0L, 1L), (2L, 3L))
    val kOnly = kappa(8, a, b)._6
    val (n, nca, ncb, ariMicro) = ari(8, a, b)
    assert(kOnly == 1000000L, s"kappa blind spot precondition: $kOnly")
    assert(nca == 5L && ncb == 6L && ariMicro < 1000000L && ariMicro > 0L,
      s"ARI must see the grouping difference: ($n, $nca, $ncb, $ariMicro)")
  }

  test("ARI: matches a naive replay on a seeded random instance (floor millionths)") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val n = 60
    val pa = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(p => p._1 != p._2)
    val pb = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(p => p._1 != p._2)
    val docs = (0 until n).map(_.toLong).toDF("doc_id")
    def labels(p: Seq[(Long, Long)]): Seq[Long] = {
      val lbl = Dedup.connectedComponents(p.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0 until n).map(i => lbl.getOrElse(i.toLong, i.toLong))
    }
    val want = math.floor(naiveAri(labels(pa), labels(pb)) * 1e6).toLong
    val got = ari(n, pa, pb)._4
    assert(got == want, s"engine $got vs naive $want")
  }

  test("partition count cannot change the census or the unit") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docs = (0 until 200).map(_.toLong).toDF("doc_id")
    val pa = Seq.fill(40)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(p => p._1 != p._2).toDF("a", "b")
    val pb = Seq.fill(40)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(p => p._1 != p._2).toDF("a", "b")
    def run(parts: Int) =
      Dedup.detectorKappa(docs.repartition(parts), pa, pb).head().toSeq
    assert(run(1) == run(8))
  }
}
