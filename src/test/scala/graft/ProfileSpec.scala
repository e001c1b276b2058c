package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** Numeric profiling: histograms must partition the corpus exactly
  * (coverage, edge ownership, constant columns) and the decimal-exact
  * moments must match hand math and stay partition-invariant. */
class ProfileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("histogram partitions every non-null row into exactly one bin") {
    val h = Profile.histogram(li, col("l_extendedprice"), bins = 16).collect()
    assert(h.map(_.getLong(3)).sum == li.filter(col("l_extendedprice").isNotNull).count())
    assert(h.map(_.getInt(0)).distinct.length == h.length)
    assert(h.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 16))
  }

  test("histogram: the maximum lands in the last bin, the minimum in the first") {
    import spark.implicits._
    val df = Seq(0.0, 1.0, 2.0, 3.0, 4.0).toDF("v")
    val h = Profile.histogram(df, col("v"), bins = 4)
      .select("bin", "n").as[(Int, Long)].collect().toMap
    assert(h == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 2L),
      s"right-closed top edge must own the max: $h")
  }

  test("histogram of a constant column is one bin holding everything") {
    import spark.implicits._
    val df = Seq.fill(100)(7.5).toDF("v").repartition(8)
    val h = Profile.histogram(df, col("v"), bins = 32).collect()
    assert(h.length == 1 && h.head.getInt(0) == 0 && h.head.getLong(3) == 100L)
  }

  test("moments match hand math and count nulls") {
    import spark.implicits._
    val df = Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, null).toDF("v")
    val r = Profile.moments(df, col("v")).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 1)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 4.0)
    assert(r.getDouble(4) == 2.5)
    assert(r.getDouble(5) == 1.25) // E[x^2] - mean^2 = 7.5 - 6.25
  }

  test("moments are invariant to physical partitioning (decimal-exact sums)") {
    def run(parts: Int) =
      Profile.moments(li.repartition(parts), col("l_extendedprice"))
        .collect().toSeq
    assert(run(1) == run(32))
  }

  test("exactQuantiles: hand-computed order statistics, ties, nulls, tiny bins") {
    import spark.implicits._
    // 10 values with a tie block; ceil-rank convention:
    // q=1/2 -> k=5 -> 5th smallest = 30.0 (inside the tie block)
    val df = Seq[java.lang.Double](10.0, 20.0, 30.0, 30.0, 30.0,
      40.0, 50.0, 60.0, 70.0, 80.0, null).toDF("v").repartition(4)
    val got = Profile.exactQuantiles(df, col("v"),
        Seq((1, 10), (1, 2), (9, 10), (1, 1)), bins = 3)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(got == Seq((0.1, 10.0), (0.5, 30.0), (0.9, 70.0), (1.0, 80.0)),
      s"got $got")
  }

  test("exactQuantiles equals the full-sort order statistic on the fixture at any bin count") {
    val vs = li.select(col("l_extendedprice").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val n = vs.length.toLong
    def kth(num: Int, den: Int): Double = vs(((num * n + den - 1) / den - 1).toInt)
    val qs = Seq((1, 4), (1, 2), (99, 100))
    for (bins <- Seq(4, 64)) {
      val got = Profile.exactQuantiles(li, col("l_extendedprice"), qs, bins)
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
      qs.foreach { case (num, den) =>
        assert(got(num.toDouble / den) == kth(num, den),
          s"bins=$bins q=$num/$den: ${got(num.toDouble / den)} != ${kth(num, den)}")
      }
    }
  }

  test("exactQuantiles of a constant column returns the constant") {
    import spark.implicits._
    val df = Seq.fill(100)(7.5).toDF("v").repartition(8)
    val got = Profile.exactQuantiles(df, col("v"), Seq((1, 2), (1, 1)))
      .collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(7.5, 7.5))
  }

  test("groupedQuantiles: hand-computed per-group order statistics, uneven groups") {
    import spark.implicits._
    // group a: 1..5 (median 3, p90 -> k=ceil(9/2)... k=ceil(4.5)=5 -> 5)
    // group b: 10,20 (median -> k=1 -> 10; 9/10 -> k=ceil(1.8)=2 -> 20)
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0),
      ("b", 10.0), ("b", 20.0))).toDF("g", "v").repartition(4)
    val got = Profile.groupedQuantiles(df, col("g"), col("v"),
        Seq((1, 2), (9, 10)), bins = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 0.5, 3.0), ("a", 0.9, 5.0),
      ("b", 0.5, 10.0), ("b", 0.9, 20.0)), s"got $got")
  }

  test("groupedQuantiles equals the per-group full-sort order statistic on the fixture") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val truth = docs.select(col("source"), col("n_chars").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def kth(vs: Array[Double], num: Int, den: Int): Double =
      vs(((num.toLong * vs.length + den - 1) / den - 1).toInt)
    val qs = Seq((1, 2), (9, 10))
    val got = Profile.groupedQuantiles(docs, col("source"), col("n_chars"), qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    for ((g, vs) <- truth; (num, den) <- qs)
      assert(got((g, num.toDouble / den)) == kth(vs, num, den),
        s"group $g q=$num/$den mismatch")
  }

  test("robustStats: hand-math median/MAD, and the threshold does not move with the outlier") {
    import spark.implicits._
    // 1..9 plus one gross outlier: median 5 (5th of 10 by ceil-rank),
    // MAD 2 (5th smallest deviation of {0,1,1,2,2,3,3,4,4,995}),
    // threshold 3*1.4826*2 = 8.8956 -> exactly the outlier flags
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).toDF("x")
    val r = Profile.robustStats(df, col("x")).head()
    assert(r.getDouble(0) == 5.0, s"median ${r.getDouble(0)}")
    assert(r.getDouble(1) == 2.0, s"mad ${r.getDouble(1)}")
    assert(r.getLong(2) == 10L && r.getLong(3) == 1L,
      s"exactly the injected outlier must flag: $r")
    // contamination-proofness: without the outlier the estimates are
    // the same location/scale (median 5, mad 2) — the outlier moved
    // NEITHER (a mean/std threshold would have moved with it)
    val clean = Profile.robustStats((1 to 9).map(_.toDouble).toDF("x"), col("x")).head()
    assert(clean.getDouble(0) == 5.0 && clean.getDouble(1) == 2.0 &&
      clean.getLong(3) == 0L, s"clean baseline: $clean")
  }

  // ---- weighted quantiles ----

  test("weightedQuantiles == exactQuantiles over the weight-exploded multiset") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0 until 300).map(_ => (rnd.nextInt(1000).toDouble, 1L + rnd.nextInt(9)))
    val df = rows.toDF("v", "w")
    val qs = Seq((1, 4), (1, 2), (3, 4), (19, 20))
    val weighted = Profile.weightedQuantiles(df, col("v"), col("w"), qs)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    val exploded = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.toDF("v")
    val plain = Profile.exactQuantiles(exploded, col("v"), qs)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(weighted == plain,
      s"weighted must equal the exploded-multiset quantiles: $weighted vs $plain")
  }

  test("weightedQuantiles: hand case and the size-bias direction") {
    import spark.implicits._
    // values 1,2,3 with weights 1,1,8 -> W=10, p50 rank 5 lands in the 3s
    val hand = Profile.weightedQuantiles(
      Seq((1.0, 1L), (2.0, 1L), (3.0, 8L)).toDF("v", "w"),
      col("v"), col("w"), Seq((1, 2))).head().getDouble(1)
    assert(hand == 3.0, s"hand-computed weighted median: $hand")
    // fixture: doc length weighted by token count - the size-biased
    // median can never sit below the plain one (weight grows with value)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val wq = Profile.weightedQuantiles(docs, col("n_chars"),
      org.apache.spark.sql.functions.size(
        graft.functions.TextFunctions.tokens(col("text"))), Seq((1, 2)))
      .head().getDouble(1)
    val pq = Profile.exactQuantiles(docs, col("n_chars"), Seq((1, 2))).head().getDouble(1)
    info(f"doc-median length $pq%.0f vs token-weighted $wq%.0f")
    assert(wq >= pq, s"size bias must not lower the median: $wq < $pq")
  }

  test("weightedQuantiles: NULL / non-positive weights are rejected loudly") {
    import spark.implicits._
    val df = Seq((1.0, 1L), (2.0, 0L)).toDF("v", "w")
    val e = intercept[Exception] {
      Profile.weightedQuantiles(df, col("v"), col("w"), Seq((1, 2))).collect()
    }
    assert(e.getMessage != null)
  }

  private def ks(rows: Seq[(Double, String)]): (Long, Long, Long, Long, Double) = {
    import spark.implicits._
    val r = Profile.ksTwoSample(rows.toDF("v", "s"), col("v"),
      col("s") === "a", col("s") === "b").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("ksTwoSample: identical samples have zero statistic") {
    val rows = Seq(1.0, 2.0, 3.0, 3.0, 7.0)
      .flatMap(v => Seq((v, "a"), (v, "b")))
    val (na, nb, dNum, dMicro, _) = ks(rows)
    assert((na, nb) == (5L, 5L))
    assert(dNum == 0L && dMicro == 0L)
  }

  test("ksTwoSample: disjoint supports give D = 1 at the lower sample's max") {
    val rows = Seq((1.0, "a"), (2.0, "a"), (3.0, "a"),
      (10.0, "b"), (11.0, "b"))
    val (na, nb, dNum, dMicro, at) = ks(rows)
    assert(dNum == na * nb, "full separation: max gap = n_a*n_b")
    assert(dMicro == 1000000L)
    assert(at == 3.0, "the gap peaks once all of a has accumulated")
  }

  test("ksTwoSample: hand case — D = max |cumA*nB - cumB*nA|") {
    // a: {1,2,2,5}  b: {2,3}
    // at v=1: |1*2-0*4|=2; v=2: |3*2-1*4|=2; v=3: |3*2-2*4|=2; v=5: 0
    val rows = Seq((1.0, "a"), (2.0, "a"), (2.0, "a"), (5.0, "a"),
      (2.0, "b"), (3.0, "b"))
    val (na, nb, dNum, dMicro, at) = ks(rows)
    assert((na, nb) == (4L, 2L))
    assert(dNum == 2L)
    assert(dMicro == 250000L) // 2*1e6 div 8
    assert(at == 1.0, "ties on the max gap resolve to the smallest value")
  }

  test("tableProfile: null / distinct / constant / all-null columns") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), "x", Option.empty[Double]),
      (Some(1L), "y", None),
      (None, "x", None),
      (Some(3L), "x", None))
      .toDF("a", "b", "c")
    val r = Profile.tableProfile(df, Seq("a", "b", "c"))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r("a") == ((4L, 1L, 2L)), "NULL excluded from the distinct count")
    assert(r("b") == ((4L, 0L, 2L)))
    assert(r("c") == ((4L, 4L, 0L)), "dead column: all NULL, zero distinct")
  }

  test("ksByGroup row == ksTwoSample(group vs rest) for every group on the fixture") {
    val df = li.select(col("l_quantity").as("v"), col("l_returnflag").as("g"))
    val grouped = Profile.ksByGroup(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(grouped.keySet == Set("A", "N", "R"))
    grouped.keys.foreach { g =>
      val two = Profile.ksTwoSample(df, col("v"), col("g") === g, col("g") =!= g).head()
      assert(grouped(g) == ((two.getLong(0), two.getLong(1), two.getLong(2),
        two.getLong(3), two.getDouble(4))),
        s"group $g must match the dedicated two-sample arm")
    }
  }

  test("ksTwoSample matches a naive two-ECDF scan on the fixture") {
    val rows = li.select(col("l_quantity"), col("l_returnflag"))
      .filter(col("l_returnflag").isin("A", "N"))
      .collect().map(r => (r.getDouble(0), r.getString(1)))
    val a = rows.filter(_._2 == "A").map(_._1)
    val b = rows.filter(_._2 == "N").map(_._1)
    val dom = (a ++ b).distinct.sorted
    val naive = dom.map(x =>
      math.abs(a.count(_ <= x).toLong * b.length - b.count(_ <= x).toLong * a.length)).max
    val (na, nb, dNum, _, _) = ks(rows.map { case (v, f) =>
      (v, if (f == "A") "a" else "b") }.toSeq)
    assert((na, nb) == (a.length.toLong, b.length.toLong))
    assert(dNum == naive)
  }

  private def pearsonOf(rows: Seq[(String, java.lang.Double, java.lang.Double)])
      : Map[String, Option[Double]] = {
    import spark.implicits._
    Profile.pearson(rows.toDF("g", "x", "y"), col("g"), col("x"), col("y"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
  }

  test("pearson: exact ±1 on linear data, NULL on zero variance, hand value") {
    val rows =
      (1 to 5).map(i => ("up", Double.box(i.toDouble), Double.box(2.0 * i + 1))) ++
      (1 to 5).map(i => ("down", Double.box(i.toDouble), Double.box(-i.toDouble))) ++
      Seq(("flat", Double.box(1.0), Double.box(7.0)),
          ("flat", Double.box(2.0), Double.box(7.0)),
          ("flat", Double.box(3.0), Double.box(7.0))) ++
      // hand case: (1,1),(2,3),(3,2) → num = 3·13 − 36 = 3, den = 6 → 0.5
      Seq(("hand", Double.box(1.0), Double.box(1.0)),
          ("hand", Double.box(2.0), Double.box(3.0)),
          ("hand", Double.box(3.0), Double.box(2.0)))
    val r = pearsonOf(rows)
    assert(r("up").contains(1.0) && r("down").contains(-1.0))
    assert(r("flat").isEmpty, "zero variance has no defined correlation")
    assert(r("hand").contains(0.5))
  }

  test("pearson: NULL and NaN rows are excluded, not poisonous") {
    val clean = (1 to 4).map(i => ("g", Double.box(i.toDouble), Double.box(3.0 * i)))
    val noisy = clean ++ Seq(
      ("g", null.asInstanceOf[java.lang.Double], Double.box(9.0)),
      ("g", Double.box(2.0), null.asInstanceOf[java.lang.Double]),
      ("g", Double.box(Double.NaN), Double.box(1.0)))
    assert(pearsonOf(clean) == pearsonOf(noisy))
  }

  test("linearFit recovers an exact line and declines zero variance") {
    import spark.implicits._
    val rows =
      (1 to 6).map(i => ("line", i.toDouble, 2.5 * i - 3.0)) ++
      (1 to 3).map(_ => ("flat", 4.0, 9.0))
    val f = Profile.linearFit(rows.toDF("g", "x", "y"),
        col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some((r.getDouble(2), r.getDouble(3))))).toMap
    assert(f("line").contains((2.5, -3.0)))
    assert(f("flat").isEmpty, "zero x-variance has no defined line")
  }

  // ---- exact ROC-AUC census ------------------------------------------

  private def auc(rows: Seq[(Double, Boolean)]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Profile.aucCensus(rows.toDF("s", "lab"), col("s"), col("lab"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Independent model: Mann-Whitney with average ranks, carried as
    * 2·U so ties stay integer. */
  private def aucModel(rows: Seq[(Double, Boolean)]): Long = {
    val sorted = rows.sortBy(_._1)
    // 2×average rank per value (average of consecutive ints, doubled)
    val byVal = sorted.zipWithIndex.groupBy(_._1._1)
    val rank2 = byVal.map { case (v, g) =>
      v -> g.map(_._2 + 1).map(_.toLong * 2).sum / g.size
    }
    val rankSum2 = rows.filter(_._2).map(r => rank2(r._1)).sum
    val p = rows.count(_._2).toLong
    rankSum2 - p * (p + 1) // = 2·U = 2·AUC·P·N
  }

  test("aucCensus: perfect separation scores exactly 1.0 (and 0.0 reversed)") {
    val rows = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
    val (p, n, num2, micro) = auc(rows)
    assert((p, n) == ((2L, 2L)) && num2 == 2L * p * n && micro == 1000000L)
    val (_, _, num2r, micror) = auc(rows.map { case (s, l) => (-s, l) })
    assert(num2r == 0L && micror == 0L)
  }

  test("aucCensus: ties count one half — the all-tied score is a coin flip") {
    val rows = Seq((5.0, true), (5.0, true), (5.0, false), (5.0, false))
    val (_, _, num2, micro) = auc(rows)
    assert(num2 == 4L && micro == 500000L, s"2*AUC*P*N = P*N on full ties: $num2")
  }

  test("aucCensus: equals the average-rank Mann-Whitney model on seeded data with ties") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextInt(40) / 4.0, rnd.nextBoolean())) ++
      Seq.fill(50)((3.25, true)) // pile extra ties on one value
    val (_, _, num2, _) = auc(rows)
    assert(num2 == aucModel(rows), "census identity must equal rank-sum U")
  }

  test("aucCensus: score and its negation partition the mass — num2 + num2' = 2PN") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(300)((rnd.nextInt(20) / 2.0, rnd.nextInt(3) == 0))
    val (p, n, a, _) = auc(rows)
    val (_, _, b, _) = auc(rows.map { case (s, l) => (-s, l) })
    assert(a + b == 2L * p * n)
  }

  // ---- embedding centroid drift ---------------------------------------

  test("centroidDrift: aligned group ≈ 1, opposed group negative, zero-centroid guarded") {
    import spark.implicits._
    // group 'a' points +x, 'b' points −x, 'z' cancels to the zero vector;
    // global = sum points +x (a dominates)
    val rows = Seq(
      ("a", Seq(1f, 0f)), ("a", Seq(2f, 0f)), ("a", Seq(3f, 0f)),
      ("b", Seq(-1f, 0f)),
      ("z", Seq(0f, 1f)), ("z", Seq(0f, -1f)))
    val m = Profile.centroidDrift(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m("a") == ((3L, 1.0)), s"$m")
    assert(m("b")._2 == -1.0, s"$m")
    assert(m("z") == ((2L, 0.0)), "a cancelled centroid must report 0, never NaN")
  }

  test("centroidDrift: partition invariance (integer-unit sums)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(120)(("g" + rnd.nextInt(3), Seq.fill(8)(rnd.nextFloat() - 0.3f)))
    val df = rows.toDF("g", "v")
    def run(p: Int) = Profile.centroidDrift(df.repartition(p), col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(run(1) == run(8))
  }

  // ---- PSI drift -------------------------------------------------------

  private def psiRow(rows: Seq[(Double, String)]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val df = rows.toDF("v", "side")
    val r = Profile.psi(df, col("v"), col("side") === "a", col("side") === "b")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("psi: identical samples score exactly zero") {
    val rows = Seq(1.0, 2.0, 2.0, 3.0).flatMap(v => Seq((v, "a"), (v, "b")))
    val (na, nb, bins, psi) = psiRow(rows)
    assert(na == 4L && nb == 4L && bins == 3L && psi == 0L,
      s"equal per-bin counts → every dn = 0: $psi")
  }

  test("psi: disjoint supports score large; hand value on a 2-bin shift") {
    val disjoint = Seq((1.0, "a"), (1.0, "a"), (9.0, "b"), (9.0, "b"))
    assert(psiRow(disjoint)._4 > 1000000L, "full mass swap must exceed PSI 1.0")
    // hand case: a = {1,1,2}, b = {1,2,2}; B = 2 bins, N = 3 each
    // p1 = 3/5, q1 = 2/5 → dn1 = 3·5−2·5 = 5, ln(15/10) = 0.405465
    // bin2 symmetric: dn2 = −5... wait p2 = 2/5, q2 = 3/5, dn2 = 2·5−3·5 = −5,
    // ln(10/15) = −0.405465 → both terms +5·405465 → psi_micro =
    // (2·5·405465)/25 = 162186
    val hand = Seq((1.0, "a"), (1.0, "a"), (2.0, "a"), (1.0, "b"), (2.0, "b"), (2.0, "b"))
    val (_, _, _, psi) = psiRow(hand)
    assert(psi == 162186L, s"hand PSI: got $psi")
  }

  private def youdenRow(rows: Seq[(Double, String)]): (Long, Long, Double, Long, Long, Long, Long) = {
    import spark.implicits._
    val df = rows.toDF("v", "side")
    val r = Profile.youden(df, col("v"), col("side") === "p").collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))
  }

  test("youden: hand case — the cut lands between the classes") {
    // pos = {3, 4}, neg = {1, 2}: t = 3 gives TP = 2, FP = 0 →
    // j_num = 2·2 − 0·2 = 4 = P·N → J = 1.0 exactly
    val (np, nn, t, tp, fp, jn, jm) = youdenRow(
      Seq((3.0, "p"), (4.0, "p"), (1.0, "n"), (2.0, "n")))
    assert((np, nn, t, tp, fp, jn, jm) == (2L, 2L, 3.0, 2L, 0L, 4L, 1000000L),
      s"got ($np, $nn, $t, $tp, $fp, $jn, $jm)")
  }

  test("youden: identical score distributions give J = 0 at every cut") {
    val rows = Seq(1.0, 2.0, 3.0).flatMap(v => Seq((v, "p"), (v, "n")))
    val (_, _, t, _, _, jn, jm) = youdenRow(rows)
    assert(jn == 0L && jm == 0L, s"J must be 0: $jn/$jm")
    assert(t == 1.0, "smallest threshold attaining the max breaks the tie")
  }

  test("youden: a backward-ranking score bottoms out at the all-admit cut (max J = 0, never negative)") {
    // the smallest observed value's cut admits every row, so
    // j_num(min v) = P·N − N·P = 0 and the reported max is ≥ 0 for
    // ANY input — the invariant that makes DIV-truncation floor.
    // Two backward-ranking shapes (pos below neg; pos interleaved
    // under a neg majority) must both report exactly the all-admit 0
    // at the smallest threshold:
    val a = youdenRow(Seq((1.0, "p"), (1.0, "p"), (1.0, "p"), (9.0, "n"), (9.0, "n")))
    assert(a._3 == 1.0 && a._6 == 0L && a._7 == 0L, s"$a")
    val b = youdenRow(Seq((1.0, "p"), (2.0, "p"), (2.0, "n"), (3.0, "n"), (3.0, "n")))
    assert(b._3 == 1.0 && b._6 == 0L && b._7 == 0L, s"$b")
  }

  test("youden: single-class input fails loudly") {
    import spark.implicits._
    val df = Seq((1.0, "p"), (2.0, "p")).toDF("v", "side")
    val e = intercept[Exception] {
      Profile.youden(df, col("v"), col("side") === "p").collect()
    }
    assert(Option(e.getMessage).getOrElse("").contains("both classes") ||
      Option(e.getCause).exists(c => Option(c.getMessage).exists(_.contains("both classes"))),
      s"$e")
  }

  test("youden: partition count cannot change the cut") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(300)((rnd.nextInt(20).toDouble,
      if (rnd.nextInt(3) == 0) "p" else "n"))
    val df = rows.toDF("v", "side")
    def run(parts: Int) =
      Profile.youden(df.repartition(parts), col("v"), col("side") === "p")
        .collect().head.toSeq
    assert(run(1) == run(8))
  }

  private def apRow(rows: Seq[(Double, String)]): (Long, Long, Long) = {
    import spark.implicits._
    val r = Profile.averagePrecision(rows.toDF("v", "side"),
      col("v"), col("side") === "p").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("averagePrecision: a perfect ranking scores exactly 1e6") {
    assert(apRow(Seq((9.0, "p"), (8.0, "p"), (2.0, "n"), (1.0, "n")))._3 == 1000000L)
  }

  test("averagePrecision: hand case with a tie block") {
    // blocks DESC: v=3 (1p), v=2 (1p + 1n TIED), v=1 (1n)
    // b1: tp=1, fp=0, term = 1·1·1e6/1 = 1e6
    // b2: tp=2, fp=1, term = 1·2·1e6 div 3 = 666666
    // ap = (1e6 + 666666) div 2 = 833333
    val (np, nn, ap) = apRow(Seq((3.0, "p"), (2.0, "p"), (2.0, "n"), (1.0, "n")))
    assert((np, nn, ap) == (2L, 2L, 833333L), s"got ($np, $nn, $ap)")
  }

  test("averagePrecision: an uninformative constant score reports the prevalence") {
    // one block: tp = P, fp = N → AP = P/(P+N) exactly
    val (_, _, ap) = apRow(Seq.fill(3)((5.0, "p")) ++ Seq.fill(7)((5.0, "n")))
    assert(ap == 300000L, s"prevalence 3/10: $ap")
  }

  test("averagePrecision: no positives fails loudly; zero negatives is trivially 1") {
    import spark.implicits._
    val e = intercept[Exception] {
      Profile.averagePrecision(Seq((1.0, "n")).toDF("v", "side"),
        col("v"), col("side") === "p").collect()
    }
    assert((Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse(""))
      .contains("positive"), s"$e")
    assert(apRow(Seq((1.0, "p"), (2.0, "p")))._3 == 1000000L)
  }

  test("averagePrecision: partition count cannot change a unit") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(300)((rnd.nextInt(15).toDouble,
      if (rnd.nextInt(4) == 0) "p" else "n"))
    val df = rows.toDF("v", "side")
    def run(parts: Int) =
      Profile.averagePrecision(df.repartition(parts), col("v"), col("side") === "p")
        .collect().head.toSeq
    assert(run(1) == run(8))
  }

  test("calibrationCensus: a calibrated score tracks the diagonal; constant scores one bin") {
    import spark.implicits._
    // score IS the positive probability over a deterministic lattice:
    // at v = k/10, exactly k of 10 rows are positive
    val rows = for (k <- 0 to 9; i <- 0 until 10)
      yield (k / 10.0, if (i < k) "p" else "n")
    val got = Profile.calibrationCensus(rows.toDF("v", "side"),
        col("v"), col("side") === "p", bins = 9)
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(6) - r.getDouble(5)) < 0.12,
        s"bin ${r.getInt(0)}: pos_rate ${r.getDouble(6)} far from mean score ${r.getDouble(5)}")
    }
    assert(got.map(_.getLong(3)).sum == 100L, "every row lands in a bin")
    val const = Profile.calibrationCensus(
      Seq((5.0, "p"), (5.0, "n")).toDF("v", "side"),
      col("v"), col("side") === "p", bins = 10).collect()
    assert(const.length == 1 && const.head.getLong(3) == 2L &&
      const.head.getDouble(6) == 0.5)
  }

  test("calibrationCensus: bin grid identical to histogram's on the same column") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val df = Seq.fill(500)((rnd.nextInt(1000) / 10.0,
      if (rnd.nextBoolean()) "p" else "n")).toDF("v", "side")
    val h = Profile.histogram(df, col("v"), bins = 16)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
    val c = Profile.calibrationCensus(df, col("v"), col("side") === "p", bins = 16)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(h.toSeq == c.toSeq, "the two censuses must share one grid convention")
  }

  test("psi: partition count cannot change a unit") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(400)((rnd.nextInt(12).toDouble, if (rnd.nextBoolean()) "a" else "b"))
    val df = rows.toDF("v", "side")
    def run(parts: Int) =
      Profile.psi(df.repartition(parts), col("v"), col("side") === "a", col("side") === "b")
        .collect().head.getLong(3)
    assert(run(1) == run(7))
  }

  test("aucByGroup: every group row equals the dedicated one-vs-rest aucCensus") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(400)(("g" + rnd.nextInt(4), rnd.nextInt(15) / 2.0))
    val df = rows.toDF("g", "s")
    val grouped = Profile.aucByGroup(df, col("g"), col("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    for (g <- rows.map(_._1).distinct) {
      val one = Profile.aucCensus(df, col("s"), col("g") === g).collect().head
      assert(grouped(g) == ((one.getLong(0), one.getLong(1), one.getLong(2), one.getLong(3))),
        s"group $g diverged from the dedicated census")
    }
  }

  test("aucByGroup: a single-group corpus fails loudly") {
    import spark.implicits._
    val df = Seq(("only", 1.0), ("only", 2.0)).toDF("g", "s")
    val e = intercept[Exception] {
      Profile.aucByGroup(df, col("g"), col("s")).collect()
    }
    assert(e.getMessage.contains("no rest"))
  }

  test("aucCensus: single-class input fails loudly") {
    val e = intercept[Exception] { auc(Seq((1.0, true), (2.0, true))) }
    assert(e.getMessage.contains("undefined"))
  }

  test("pearson: partition count cannot change a bit of r") {
    import spark.implicits._
    val df = (1 to 200)
      .map(i => ("s" + i % 3, i.toDouble, (i % 17).toDouble + 0.25 * i))
      .toDF("g", "x", "y")
    val one = Profile.pearson(df.repartition(1), col("g"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSet
    val many = Profile.pearson(df.repartition(7), col("g"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(one == many, "decimal-exact sums must be partition invariant")
  }
}
