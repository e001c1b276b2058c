package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Opq, Pca, ProductQuantizer}

/** End-to-end OPQ SERVING floors — the quality gate the oracle-replayed
  * q_ann_opq pipeline cannot carry (its eigensolve-free permutation arm
  * is the replayable one; the full rotation is driver math): on a
  * correlated corpus, ADC serving through the rotated+balanced space
  * must RECALL better than ADC serving through the raw space, with the
  * real serving expressions (encodeExpr/adcExpr) on both arms.
  * Measured values recorded in BASELINE.md. */
class OpqServingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Low-rank correlated fixture — the regime OPQ exists for: r ≪ d
    * informative directions with decaying scales, mixed into the raw
    * coordinates by a FIXED random basis (plus small isotropic noise).
    * Contiguous raw blocks each see an arbitrary mixture of every
    * informative direction, so plain per-block PQ wastes its codebooks;
    * the rotation re-aligns the axes and the balanced allocation deals
    * the informative dims evenly across blocks. (An AR(1) loading is
    * NOT such a fixture: its correlation is adjacent-dim, which
    * contiguous PQ blocks already capture — measured, the rotation
    * gains only ~0.03 recall there.) The mixing basis is shared by
    * corpus and queries; per-row randomness comes from `seed`. */
  private val rank = 12
  private lazy val mixing: Array[Array[Double]] = {
    val r0 = new scala.util.Random(424242L)
    Array.fill(rank) {
      val v = Array.fill(d)(r0.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nrm)
    }
  }
  private def correlated(n: Int, d: Int, seed: Long): Seq[(Long, Array[Float])] = {
    require(d == this.d)
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map { id =>
      val g = Array.fill(rank)(rnd.nextGaussian())
      val eps = Array.fill(d)(rnd.nextGaussian() * 0.05)
      val z = Array.tabulate(d) { i =>
        var acc = eps(i)
        var k = 0
        while (k < rank) {
          acc += 3.0 * math.pow(0.8, k.toDouble) * mixing(k)(i) * g(k)
          k += 1
        }
        acc.toFloat
      }
      (id, z)
    }
  }

  private val d = 64
  private val k = 10

  /** ADC top-k ids per query through the REAL serving path: encode the
    * corpus with `model`, score every (query, code) pair with adcExpr,
    * keep the top-k per query (distance, id tiebreak). */
  private def adcTopK(corpus: DataFrame, queries: DataFrame,
      model: ProductQuantizer.Model): Map[Long, Seq[Long]] = {
    val codes = corpus.select(col("vec_id"),
      ProductQuantizer.encodeExpr(col("embedding"), model).as("codes"))
    val w = Window.partitionBy("qid").orderBy(col("dd").asc, col("vec_id").asc)
    codes.crossJoin(queries)
      .select(col("qid"), col("vec_id"),
        ProductQuantizer.adcExpr(col("codes"), col("qv"), model).as("dd"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "vec_id", "rn")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
      }
  }

  private def recallAt(truth: Map[Long, Seq[Long]],
      got: Map[Long, Seq[Long]]): Double = {
    val per = truth.keys.toSeq.map { q =>
      got(q).toSet.intersect(truth(q).toSet).size.toDouble / k
    }
    per.sum / per.size
  }

  test("ADC serving recall@10: rotation + balanced allocation beats raw-space PQ on correlated data") {
    import spark.implicits._
    val corpus = correlated(n = 1200, d = d, seed = 11L).toDF("vec_id", "embedding")
      .persist()
    val queries = correlated(n = 48, d = d, seed = 101L)
      .toDF("qid", "qv").persist()

    // exact L2 truth on the raw vectors
    val wT = Window.partitionBy("qid").orderBy(col("dd").asc, col("vec_id").asc)
    val truth = corpus.crossJoin(queries)
      .select(col("qid"), col("vec_id"),
        graft.functions.VectorFunctions.l2Sq(col("embedding"), col("qv")).as("dd"))
      .withColumn("rn", row_number().over(wT)).filter(col("rn") <= k)
      .select("qid", "vec_id", "rn").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }

    // raw arm: PQ trained and served in the raw space
    val rawModel = ProductQuantizer.train(corpus, numSub = 8, k = 16, iters = 2)
    val rawRecall = recallAt(truth, adcTopK(corpus, queries, rawModel))

    // OPQ arm: jacobi rotation, balanced block allocation, rotate both
    // sides, train + serve in rotated space. Rotation is orthogonal, so
    // the exact-L2 truth is THE SAME id set — recall compares directly.
    val cov = Pca.covMatrix(Pca.covariance(corpus, col("embedding"), d).collect(), d)
    val (eig, rot) = Pca.jacobi(cov)
    val balRot = Pca.balancedOrder(eig, numSub = 8).map(rot)
    val rCorpus = Pca.rotate(corpus, col("embedding"), balRot)
      .select(col("vec_id"), col("rvec").as("embedding")).persist()
    val rQueries = Pca.rotate(queries, col("qv"), balRot)
      .select(col("qid"), col("rvec").as("qv")).persist()
    val opqModel = ProductQuantizer.train(rCorpus, numSub = 8, k = 16, iters = 2)
    val opqRecall = recallAt(truth, adcTopK(rCorpus, rQueries, opqModel))

    info(f"ADC recall@10 over 48 queries: raw $rawRecall%.4f, opq $opqRecall%.4f")
    // measured floors (raw 0.4313, opq 0.6792 — values in BASELINE.md;
    // margins absorb the ~ulp-level Lloyd accumulation-order wobble):
    // the gates fail if the rotation stops paying for itself
    assert(opqRecall >= rawRecall + 0.15,
      f"OPQ serving must beat raw PQ serving by >= 0.15 recall: $opqRecall%.4f vs $rawRecall%.4f")
    assert(opqRecall >= 0.60,
      f"OPQ serving recall@10 floor 0.60: measured $opqRecall%.4f")
  }

  test("energy-balanced permutation is a valid block-balanced permutation and preserves distances") {
    import spark.implicits._
    val df = correlated(n = 300, d = d, seed = 5L).toDF("vec_id", "embedding")
    val perm = Opq.energyBalancedPerm(df, col("embedding"), d, numSub = 8)
    assert(perm.sorted.sameElements(0 until d), "must be a permutation of 0..d-1")
    // deterministic: same data -> same permutation
    assert(perm.sameElements(Opq.energyBalancedPerm(df, col("embedding"), d, numSub = 8)))
    // a permutation is orthogonal: pairwise L2 is bit-preserved (floats
    // are reordered, never recomputed)
    val pdf = df.select(col("vec_id"), Opq.permuteExpr(col("embedding"), perm).as("embedding"))
    val a = df.orderBy("vec_id").collect().map(_.getSeq[Float](1).toArray)
    val b = pdf.orderBy("vec_id").collect().map(_.getSeq[Float](1).toArray)
    def l2(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => (p.toDouble - q) * (p.toDouble - q) }.sum
    for (i <- Seq(0, 7, 42); j <- Seq(3, 99, 250))
      assert(math.abs(l2(a(i), a(j)) - l2(b(i), b(j))) < 1e-9)
  }

  test("snake assignment: every block gets d/numSub dims and block energy sums stay balanced") {
    val numSub = 8
    val blocks = (0 until d).map(Opq.snakeBlock(_, numSub))
    assert(blocks.groupBy(identity).values.map(_.size).toSet == Set(d / numSub))
    // dealing any descending sequence: block sums differ by at most the
    // largest single element (the boustrophedon guarantee)
    val vals = (0 until d).map(r => 1000.0 / (r + 1))
    val sums = (0 until numSub).map(b =>
      (0 until d).filter(Opq.snakeBlock(_, numSub) == b).map(vals).sum)
    assert(sums.max - sums.min <= vals.max,
      s"snake imbalance ${sums.max - sums.min} exceeds max element ${vals.max}")
  }
}
