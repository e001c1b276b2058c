package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.Pca

/** PCA preprocessing: Jacobi correctness on known matrices,
  * orthonormality/diagonalization on the fixture covariance, exact
  * partition invariance of the census, distance preservation of the
  * rotation, and the measured truncated-prefix recall gain on a
  * correlated fixture (the property the rotation exists for). */
class PcaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("jacobi diagonalizes a known 2x2: eigvals (3, 1), eigvecs +-(1,1)/sqrt2") {
    val (eig, rot) = Pca.jacobi(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(eig(0) - 3.0) < 1e-12 && math.abs(eig(1) - 1.0) < 1e-12)
    val v0 = rot(0)
    assert(math.abs(math.abs(v0(0)) - math.sqrt(0.5)) < 1e-12 &&
      math.abs(v0(0) - v0(1)) < 1e-12, s"leading eigvec wrong: ${v0.toSeq}")
  }

  test("covariance census is exactly partition-invariant (integer units)") {
    def run(parts: Int) =
      Pca.covariance(emb.repartition(parts), col("embedding"), 64)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(run(1) == run(16), "integer-unit census must not depend on partitioning")
  }

  test("fixture rotation is orthonormal and diagonalizes the covariance") {
    val d = 64
    val cov = Pca.covMatrix(
      Pca.covariance(emb, col("embedding"), d).collect(), d)
    val (eig, rot) = Pca.jacobi(cov)
    // rows orthonormal
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => rot(i)(k) * rot(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"R row dot($i,$j) = $dot")
    }
    // eigenvalues descending and the rotated covariance near-diagonal
    assert(eig.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "eigvals must sort descending")
    val rotated = Pca.rotate(emb, col("embedding"), rot)
    val cov2 = Pca.covMatrix(
      Pca.covariance(rotated, col("rvec"), d).collect(), d)
    def offEnergy(m: Array[Array[Double]]) =
      (for (i <- 0 until d; j <- 0 until d if i != j) yield m(i)(j) * m(i)(j)).sum
    val (before, after) = (offEnergy(cov), offEnergy(cov2))
    // float re-cast + 12dp floors leave residue; 1e-4x is "diagonal"
    assert(after < before * 1e-4 + 1e-9,
      s"rotation failed to diagonalize: off-energy $before -> $after")
    // and the diagonal matches the eigenvalues
    for (i <- 0 until d)
      assert(math.abs(cov2(i)(i) - eig(i)) < 1e-4,
        s"rotated variance ${cov2(i)(i)} != eigenvalue ${eig(i)} at $i")
  }

  test("rotation preserves norms and pairwise distances (orthogonality in serving space)") {
    import spark.implicits._
    val rows = emb.limit(50).select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val d = 64
    val cov = Pca.covMatrix(Pca.covariance(emb, col("embedding"), d).collect(), d)
    val (_, rot) = Pca.jacobi(cov)
    val rotated = Pca.rotate(emb.limit(50), col("embedding"), rot)
      .select(col("vec_id"), col("rvec")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def l2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    for (Seq((ia, va), (ib, vb)) <- rows.toSeq.combinations(2).take(200)) {
      val raw = l2(va, vb)
      val rotd = l2(rotated(ia), rotated(ib))
      assert(math.abs(raw - rotd) <= 1e-3 * (raw + 1e-6),
        s"distance not preserved: $raw vs $rotd for ($ia,$ib)")
    }
  }

  /** Correlated fixture: z = A·g with a seeded dense mixing matrix, so
    * raw coordinates share variance and PCA has something to
    * concentrate — the production case the rotation exists for (the
    * i.i.d. fixture is the no-gain floor case, same honesty note as
    * the residual-PQ suite). */
  private def correlated(n: Int, d: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    val a = Array.fill(d, d)(0.0)
    for (i <- 0 until d; j <- 0 until d)
      a(i)(j) = (if (j <= i) rnd.nextGaussian() else 0.0) * math.pow(0.82, j)
    (0L until n.toLong).map { id =>
      val g = Array.fill(d)(rnd.nextGaussian())
      val z = Array.tabulate(d)(i => (0 until d).map(j => a(i)(j) * g(j)).sum.toFloat)
      (id, z)
    }
  }

  test("PQ reconstruction error after PCA rotation on correlated data (OPQ objective)") {
    import spark.implicits._
    import graft.index.ProductQuantizer
    val d = 64
    val data = correlated(n = 1200, d = d, seed = 11L)
    val df = data.toDF("vec_id", "embedding")
    val cov = Pca.covMatrix(Pca.covariance(df, col("embedding"), d).collect(), d)
    val (_, rot) = Pca.jacobi(cov)
    val rotDf = Pca.rotate(df, col("embedding"), rot)
      .select(col("vec_id"), col("rvec").as("embedding"))
    def mse(frame: org.apache.spark.sql.DataFrame): Double = {
      val m = ProductQuantizer.train(frame, numSub = 8, k = 16, iters = 2)
      val vecs = frame.select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
      val sub = d / 8
      vecs.map { v =>
        (0 until 8).map { s =>
          val x = java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub)
          m.codebooks(s).map(cw =>
            x.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }.sum / vecs.length
    }
    val (rawMse, pcaMse) = (mse(df), mse(rotDf))
    // the documented caveat: UNbalanced PCA concentrates variance into
    // block 1 and plain per-block PQ pays for it
    info(f"PQ 8x16 reconstruction MSE: raw $rawMse%.4f, unbalanced-pca $pcaMse%.4f")
    // OPQ non-parametric init: balance the variance product per block
    val (eig, _) = Pca.jacobi(cov)
    val perm = Pca.balancedOrder(eig, numSub = 8)
    val balRot = perm.map(rot)
    val balDf = Pca.rotate(df, col("embedding"), balRot)
      .select(col("vec_id"), col("rvec").as("embedding"))
    val balMse = mse(balDf)
    info(f"PQ 8x16 reconstruction MSE: balanced-pca $balMse%.4f")
    // measured floors (values in BASELINE.md): balancing must beat
    // BOTH the raw coordinates and the unbalanced rotation
    assert(balMse < pcaMse * 0.75,
      f"balanced allocation must repair the unbalanced rotation: $balMse%.4f vs $pcaMse%.4f")
    assert(balMse < rawMse * 0.95,
      f"balanced PCA-PQ must beat raw-coordinate PQ: $balMse%.4f vs $rawMse%.4f")
  }

  test("truncated-16 prefix recall: PCA rotation beats raw truncation on correlated data") {
    import spark.implicits._
    val d = 64
    val data = correlated(n = 1200, d = d, seed = 7L)
    val df = data.toDF("vec_id", "embedding")
    val cov = Pca.covMatrix(Pca.covariance(df, col("embedding"), d).collect(), d)
    val (eig, rot) = Pca.jacobi(cov)
    // energy concentrates: leading 16 eigen-dims must carry far more
    // variance than the leading 16 raw coordinates
    val rawLead = (0 until 16).map(i => cov(i)(i)).sum / (0 until d).map(i => cov(i)(i)).sum
    val pcaLead = eig.take(16).sum / eig.sum
    assert(pcaLead > rawLead + 0.10,
      f"no concentration: pca $pcaLead%.3f vs raw $rawLead%.3f")
    // recall@10 of exact-l2 truth under 16-dim prefix scoring
    def recallAt10(vecs: Map[Long, Array[Float]]): Double = {
      def l2(a: Array[Float], b: Array[Float], dims: Int) =
        (0 until dims).map(i => (a(i) - b(i)).toDouble * (a(i) - b(i))).sum
      val ids = vecs.keys.toSeq.sorted
      val queries = ids.take(40)
      val full = data.toMap
      queries.map { q =>
        val truth = ids.filter(_ != q)
          .sortBy(o => (l2(full(q), full(o), d), o)).take(10).toSet
        val got = ids.filter(_ != q)
          .sortBy(o => (l2(vecs(q), vecs(o), 16), o)).take(10).toSet
        (truth & got).size / 10.0
      }.sum / queries.size
    }
    val rawR = recallAt10(data.toMap)
    val pcaR = recallAt10(Pca.rotate(df, col("embedding"), rot)
      .select("vec_id", "rvec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap)
    info(f"truncated-16 recall@10 on correlated fixture: raw $rawR%.4f, pca $pcaR%.4f")
    // measured: pin the gain as a failing floor (values in BASELINE.md)
    assert(pcaR >= rawR + 0.15,
      f"PCA truncation gain regressed: raw $rawR%.4f vs pca $pcaR%.4f")
    assert(pcaR >= 0.80, f"absolute PCA truncated recall floor: $pcaR%.4f")
  }
}
