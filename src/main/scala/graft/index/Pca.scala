package graft.index

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** PCA preprocessing for compressed / truncated vector serving — the
  * OPQ-shape idea (Ge et al., CVPR 2013 §2: rotate so variance
  * decorrelates and concentrates, THEN quantize/truncate): a
  * distributed exact covariance census, a deterministic driver-side
  * Jacobi eigensolver over the d×d artifact, and a map-only rotation
  * for serving. On correlated embeddings the rotation concentrates
  * energy into the leading dimensions, which is exactly what
  * prefix-truncated (MRL-style) fetch and block-PQ consume.
  *
  * Scale shape: the ONLY corpus-scale stage is the census — O(d²)
  * per-task accumulator state emitted once per partition
  * (mapPartitions, the bottomK imperative niche), so the shuffle
  * carries O(d² · #partitions) longs and NOTHING explodes per row.
  * The d×d matrix is a driver/model artifact (d=64 → 16 KB); the
  * eigensolve is O(d³) driver math; rotation is map-only.
  *
  * Numeric convention (the PageRank integer-unit convention):
  * per-row terms enter the census as `floor(x_i · x_j · 1e12)` longs,
  * so sums are exact integers — order-independent at any parallelism
  * and replayable term-for-term by a SQL oracle.
  *
  * Overflow discipline (two tiers, so the census NEVER wraps
  * silently): per-task partials accumulate via `Math.addExact`, which
  * RAISES if a single task's partial leaves the Long range (for
  * unit-scale components that is ~9.2e6 rows in ONE task — an
  * ordinary 128 MB-split task holds ~5e5 d=64 vectors, 18× headroom);
  * the cross-partition combine then sums as DECIMAL(38,0), exact to
  * ~1e26 unit-scale rows — beyond any corpus (100 TB of d=64 doubles
  * is ~2e11 rows → pair sums ~2e23). The d×d covariance assembly
  * converts the exact integer census to double, which loses ulps
  * beyond 2^53 integer units (~9e3 unit rows per 1e12 scale — i.e.
  * covariance VALUES stay exact-to-12dp only while |Σ| < 2^53; past
  * that the assembly is correctly-rounded double math on an exact
  * integer, the same contract as the SQL oracle's CAST, so the two
  * engines still agree bit-for-bit).
  */
object Pca {

  /** The exact integer-unit census: rows `(i, j, s)` with
    * 1 ≤ i ≤ j ≤ d holding Σ floor(x_i·x_j·1e12), plus mean rows
    * `(i, 0, Σ floor(x_i·1e12))` — j = 0 is the mean sentinel. */
  def census(df: DataFrame, vec: Column, d: Int): DataFrame = {
    require(d >= 2, s"d must be >= 2, got $d")
    val spark = df.sparkSession
    val nPairs = d * (d + 1) / 2
    val src = df.select(vec.cast("array<double>").as("v"))
    val out = src.rdd.mapPartitions { it =>
      val sums = new Array[Long](d + nPairs)
      var nonEmpty = false
      it.foreach { r =>
        nonEmpty = true
        val v = r.getSeq[Double](0)
        require(v.length == d, s"vector dim ${v.length} != census d $d")
        var i = 0
        var p = d
        while (i < d) {
          sums(i) = Math.addExact(sums(i), math.floor(v(i) * 1e12).toLong)
          var j = i
          while (j < d) {
            sums(p) = Math.addExact(sums(p), math.floor(v(i) * v(j) * 1e12).toLong)
            p += 1
            j += 1
          }
          i += 1
        }
      }
      if (!nonEmpty) Iterator.empty
      else {
        val acc = scala.collection.mutable.ArrayBuffer.empty[Row]
        var i = 0
        var p = d
        while (i < d) {
          acc += Row(i + 1, 0, sums(i))
          var j = i
          while (j < d) {
            acc += Row(i + 1, j + 1, sums(p))
            p += 1
            j += 1
          }
          i += 1
        }
        acc.iterator
      }
    }
    spark.createDataFrame(out, StructType(Seq(
        StructField("i", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("s", LongType, nullable = false))))
      .groupBy("i", "j")
      .agg(sum(col("s").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"))
  }

  /** The covariance matrix as rows `(i, j, cov)` (upper triangle,
    * i ≤ j), cov floored to 12 dp — a pure function of the integer
    * census and the row count, identical at any parallelism. */
  def covariance(df: DataFrame, vec: Column, d: Int): DataFrame = {
    val c = census(df, vec, d)
    val n = df.count()
    require(n >= 2, s"covariance needs >= 2 rows, got $n")
    val means = c.filter(col("j") === 0)
      .select(col("i").as("mi"), col("s").as("ms"))
    c.filter(col("j") > 0)
      .join(means.withColumnRenamed("mi", "i1").withColumnRenamed("ms", "si"),
        col("i") === col("i1"))
      .join(means.withColumnRenamed("mi", "j1").withColumnRenamed("ms", "sj"),
        col("j") === col("j1"))
      .select(col("i"), col("j"),
        (floor(((col("s").cast("double") / lit(1e12)) / lit(n.toDouble) -
          (col("si").cast("double") / lit(1e12) / lit(n.toDouble)) *
            (col("sj").cast("double") / lit(1e12) / lit(n.toDouble))) * lit(1e12))
          .cast("double") / lit(1e12)).as("cov"))
      .orderBy("i", "j")
  }

  /** Classical cyclic Jacobi eigensolver over a symmetric matrix —
    * deterministic (fixed sweep order, fixed convergence threshold),
    * pure driver math on the d×d model artifact. Returns
    * (eigenvalues, rotation) with eigenvalues sorted DESCENDING and
    * the rotation's ROWS the matching unit eigenvectors (so
    * `R · x` expresses x in the principal basis, component 1 first).
    * Ties in the eigenvalue sort break by original column index. */
  def jacobi(a0: Array[Array[Double]], maxSweeps: Int = 30,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    require(a.forall(_.length == d), "matrix must be square")
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol * 1e-3) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case x   => x
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < d - 1) {
        var j = i + 1
        while (j < d) { off = math.max(off, math.abs(a(i)(j))); j += 1 }
        i += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val eig = order.map(i => a(i)(i)).toArray
    val rot = order.map(i => (0 until d).map(k => v(k)(i)).toArray).toArray
    (eig, rot)
  }

  /** Collect a [[covariance]] frame into the dense symmetric matrix
    * (bounded O(d²) rows — a model artifact, not data). */
  def covMatrix(covRows: Array[Row], d: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](d, d)
    covRows.foreach { r =>
      val (i, j, c) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getDouble(2))
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  /** OPQ non-parametric init (Ge et al. CVPR'13 §4.1): permute the
    * principal dimensions so every PQ block carries a balanced
    * variance PRODUCT — plain PCA concentrates variance into the
    * first block, which plain per-block PQ pays for (measured: PCA
    * alone RAISES PQ reconstruction MSE on the correlated spec
    * fixture, 62.2 → 82.1; balancing is what turns the rotation into
    * a PQ win). Greedy: eigenvalues descending, each assigned to the
    * unfilled block with the smallest log-variance product. Returns
    * the row permutation to apply to the rotation. */
  def balancedOrder(eig: Array[Double], numSub: Int): Array[Int] = {
    val d = eig.length
    require(d % numSub == 0, s"d=$d not divisible by numSub=$numSub")
    val cap = d / numSub
    val logs = Array.fill(numSub)(0.0)
    val fill = Array.fill(numSub)(0)
    val buckets = Array.fill(numSub)(scala.collection.mutable.ArrayBuffer.empty[Int])
    (0 until d).foreach { i => // eig is already sorted descending
      val b = (0 until numSub).filter(fill(_) < cap)
        .minBy(j => (logs(j), j))
      buckets(b) += i
      logs(b) += math.log(math.max(eig(i), 1e-30))
      fill(b) += 1
    }
    buckets.flatMap(_.toSeq)
  }

  /** Map-only rotation: re-express every vector in the principal
    * basis (`R · x`), emitted as array<float> so the rotated corpus
    * feeds the same PQ/SQ/truncated serving paths as the raw one.
    * The rotation rides as a broadcast-sized closure literal. */
  def rotate(df: DataFrame, vec: Column, rot: Array[Array[Double]],
      keep: Int = Int.MaxValue): DataFrame = {
    val d = rot.length
    val k = math.min(keep, d)
    val spark = df.sparkSession
    val src = df.withColumn("__v", vec.cast("array<double>"))
    val schema = StructType(src.schema.fields.filterNot(_.name == "__v") :+
      StructField("rvec", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false), nullable = false))
    val out = src.rdd.mapPartitions { it =>
      it.map { r =>
        val v = r.getSeq[Double](r.fieldIndex("__v"))
        require(v.length == d, s"vector dim ${v.length} != rotation d $d")
        val y = new Array[Float](k)
        var i = 0
        while (i < k) {
          var acc = 0.0
          var j = 0
          while (j < d) { acc += rot(i)(j) * v(j); j += 1 }
          y(i) = acc.toFloat
          i += 1
        }
        Row.fromSeq(r.toSeq.zipWithIndex
          .filterNot { case (_, idx) => idx == r.fieldIndex("__v") }
          .map(_._1) :+ (y.toSeq: Seq[Float]))
      }
    }
    spark.createDataFrame(out, schema)
  }
}
