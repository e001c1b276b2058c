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
