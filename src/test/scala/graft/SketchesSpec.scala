package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** KMV distinct-count sketch: accuracy within the 1/√k band, exactness
  * below k, and invariance to partitioning and duplication (the
  * properties that make it a mergeable 100 TB census primitive). */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("estimate lands within 10% of truth on the fixture (k=256, ~1.5k distinct)") {
    val est = Sketches.kmvDistinct(li, col("l_orderkey"), k = 256)
      .head().getDouble(2)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0).toDouble
    assert(math.abs(est - exact) / exact < 0.10,
      f"est $est%.1f vs exact $exact%.0f drifts past the 1/sqrt(k) band")
  }

  test("sketch is invariant to physical partitioning") {
    def run(parts: Int) =
      Sketches.kmvDistinct(li.repartition(parts), col("l_orderkey"), k = 128)
        .collect().toSeq
    assert(run(1) == run(32))
  }

  test("duplicating every row leaves the sketch unchanged") {
    val once = Sketches.kmvDistinct(li, col("l_orderkey"), k = 128).collect().toSeq
    val twice = Sketches.kmvDistinct(li.union(li), col("l_orderkey"), k = 128)
      .collect().toSeq
    assert(once == twice, "KMV estimates distinct keys — multiplicity must not matter")
  }

  test("overlap: disjoint corpora estimate zero, identical corpora estimate Jaccard 1") {
    import spark.implicits._
    val a = (0L until 5000L).toDF("id")
    val b = (10000L until 15000L).toDF("id")
    val disj = Sketches.kmvOverlap(a, col("id"), b, col("id"), k = 128).head()
    assert(disj.getDouble(4) == 0.0 && disj.getDouble(5) == 0.0,
      "disjoint key spaces must estimate zero overlap")
    val same = Sketches.kmvOverlap(a, col("id"), a, col("id"), k = 128).head()
    assert(same.getDouble(4) == 1.0, "identical corpora must estimate Jaccard 1")
    assert(same.getDouble(5) == same.getDouble(1),
      "self-overlap estimate must equal the self cardinality estimate")
  }

  test("overlap: intersection estimate within 10% of truth on the fixture pair") {
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val r = Sketches.kmvOverlap(li, col("l_orderkey"), ord, col("o_orderkey"), k = 256)
      .head()
    val exact = li.select(col("l_orderkey")).distinct()
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count().toDouble
    val est = r.getDouble(5)
    assert(math.abs(est - exact) / exact < 0.10,
      f"est_common $est%.1f vs exact $exact%.0f drifts past the band")
  }

  test("Count-Min estimates are upper bounds, exact without collisions, partition-invariant") {
    import spark.implicits._
    import graft.operators.Sketches.CountMin
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
      .select(col("token"),
        graft.functions.TextFunctions.fingerprint(col("token")).as("f"))
    val keys = toks.groupBy("token", "f").agg(count(lit(1)).as("n_exact"))
    // upper-bound property at a colliding width
    val narrow = CountMin.estimates(CountMin.build(toks, col("f"), 64),
        keys, col("f"), 64)
      .select(col("token"), col("est"), col("n_exact"))
      .as[(String, Long, Long)].collect()
    assert(narrow.forall { case (_, est, n) => est >= n },
      "Count-Min must never undercount")
    // a wide grid separates the 31-token vocabulary: all exact
    val wide = CountMin.estimates(CountMin.build(toks, col("f"), 4096),
        keys, col("f"), 4096)
      .select(col("est"), col("n_exact")).as[(Long, Long)].collect()
    assert(wide.forall { case (est, n) => est == n },
      "width 4096 must be collision-free on the fixture vocabulary")
    // the grid is a pure aggregate: physical partitioning is invisible
    val g1 = CountMin.build(toks.repartition(1), col("f"), 64)
      .orderBy("row", "bucket").collect().toSeq
    val g32 = CountMin.build(toks.repartition(32), col("f"), 64)
      .orderBy("row", "bucket").collect().toSeq
    assert(g1 == g32)
  }

  test("below k distinct the sketch is exact") {
    import spark.implicits._
    val tiny = (0 until 1000).map(i => i % 10L).toDF("id").repartition(8)
    val r = Sketches.kmvDistinct(tiny, col("id"), k = 64).head()
    assert(r.getDouble(2) == 10.0, "fewer than k distinct hashes -> exact count")
  }

  test("numeric surface rejects a string key loudly instead of sketching NULLs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      Sketches.kmvDistinct(docs, col("text"))
    }
    assert(e.getMessage.contains("kmvDistinctText"),
      "the error must route the caller to the text surface")
  }

  test("text KMV: estimate within 10% of truth on fixture token text, partition-invariant") {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(concat(col("tok"), lit("_"), monotonically_increasing_id() % 97).as("key"))
    val truth = toks.select(countDistinct(col("key"))).head().getLong(0).toDouble
    val est = Sketches.kmvDistinctText(toks, col("key"), k = 256).head().getDouble(2)
    assert(math.abs(est - truth) / truth < 0.10, s"text KMV est $est vs truth $truth")
    val est1 = Sketches.kmvDistinctText(toks.repartition(1), col("key"), k = 256)
      .head().getDouble(2)
    assert(est1 == est, "text sketch must be partition-invariant")
  }

  test("text overlap: identical corpora give Jaccard 1, disjoint give 0") {
    import spark.implicits._
    val a = (0 until 500).map(i => s"tok_$i").toDF("t")
    val b = (500 until 900).map(i => s"tok_$i").toDF("t")
    val same = Sketches.kmvOverlapText(a, col("t"), a, col("t"), k = 64).head()
    assert(same.getDouble(4) == 1.0, "identical corpora must estimate Jaccard 1")
    val disj = Sketches.kmvOverlapText(a, col("t"), b, col("t"), k = 64).head()
    assert(disj.getDouble(4) == 0.0, "disjoint corpora must estimate Jaccard 0")
  }

  test("heavy hitters: exact set, upper-bound estimates, no false results at a collision-prone width") {
    import spark.implicits._
    // 3 heavy keys (600/300/120 occurrences) in a sea of 400 singletons
    val rows = (Seq.fill(600)("hh_a") ++ Seq.fill(300)("hh_b") ++
      Seq.fill(120)("hh_c") ++ (0 until 400).map(i => s"light_$i")).toDF("k")
      .repartition(16)
    // width 8: collisions guaranteed — candidates over-generate, the
    // exact verify must still return exactly the true heavy set
    for (w <- Seq(8, 256)) {
      val got = Sketches.CountMin.heavyHittersText(rows, col("k"), threshold = 100L, width = w)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(got.map(_._1).toSeq == Seq("hh_a", "hh_b", "hh_c"),
        s"width $w: wrong heavy set ${got.toSeq}")
      assert(got.map(_._3).toSeq == Seq(600L, 300L, 120L),
        s"width $w: verified counts wrong")
      got.foreach { case (k2, est, cnt) =>
        assert(est >= cnt, s"width $w: CMS estimate under-counts $k2 ($est < $cnt)")
      }
    }
  }

  test("bloom: no false negatives, definite news are sound, probe arms agree") {
    import spark.implicits._
    val corpus = (0 until 800).map(i => s"key_$i").toDF("k").repartition(8)
    val batch = (600 until 1400).map(i => s"key_$i").toDF("k")
    val m = 8192
    val grid = Sketches.Bloom.build(corpus, col("k"), m)
    val flags = Sketches.Bloom.maybeSeenFlags(batch, col("k"), grid, m)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // every resident key must probe maybe_seen (an unset bit would be a
    // false negative — impossible by construction)
    (600 until 800).foreach(i => assert(flags(s"key_$i"),
      s"false negative: resident key_$i flagged definitely-new"))
    // a definitely-new verdict must be sound: key really absent
    val resident = (0 until 800).map(i => s"key_$i").toSet
    flags.collect { case (k, false) => k }.foreach(k =>
      assert(!resident.contains(k), s"unsound definite-new on resident $k"))
    // and at this fill ratio most truly-new keys are recognized as new
    val newFrac = (800 until 1400).count(i => !flags(s"key_$i")) / 600.0
    assert(newFrac > 0.5, f"false-positive rate ${1 - newFrac}%.2f at ~33%% fill")
    // the literal-map point arm is the same function as the join arm
    val gmap = Sketches.Bloom.collectGrid(corpus, col("k"), m)
    val viaExpr = batch
      .select(col("k"), Sketches.Bloom.maybeSeenExpr(gmap, col("k"), m).as("ms"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(viaExpr == flags, "literal-map probe diverges from broadcast-join probe")
  }

  test("bloom: grid is partition-invariant and saturates at a toy width") {
    import spark.implicits._
    val corpus = (0 until 500).map(i => s"key_$i").toDF("k")
    def gridAt(parts: Int) =
      Sketches.Bloom.build(corpus.repartition(parts), col("k"), 4096)
        .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(gridAt(1) == gridAt(16), "bit array must not depend on partitioning")
    // m=64: 500 keys x 4 probes set essentially every bit -> everything
    // probes maybe_seen (the filter degrades to useless, never to wrong)
    val tiny = Sketches.Bloom.collectGrid(corpus, col("k"), 64)
    val probe = (9000 until 9050).map(i => s"other_$i").toDF("k")
      .select(Sketches.Bloom.maybeSeenExpr(tiny, col("k"), 64).as("ms"))
      .collect().map(_.getBoolean(0))
    assert(probe.forall(identity), "saturated filter must still never claim definite-new falsely")
  }

  test("bloom: merged grids equal the grid of the merged corpus (incremental ingest)") {
    import spark.implicits._
    val a = (0 until 300).map(i => s"key_$i").toDF("k")
    val b = (200 until 600).map(i => s"key_$i").toDF("k")
    val m = 4096
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    val merged = Sketches.Bloom.merge(
      Sketches.Bloom.build(a, col("k"), m), Sketches.Bloom.build(b, col("k"), m))
    val direct = Sketches.Bloom.build(a.union(b), col("k"), m)
    assert(norm(merged) == norm(direct),
      "incremental grid merge must equal a fresh build over the union")
  }

  test("grouped text KMV: each group's row equals an independent sketch of that group") {
    import spark.implicits._
    val df = (0 until 3000).map { i =>
      val g = s"g${i % 3}"
      (g, s"${g}_tok_${i % (300 + 100 * (i % 3))}")
    }.toDF("grp", "tok")
    val grouped = Sketches.kmvGroupedText(df, col("grp"), col("tok"), k = 32)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2), r.getDouble(3))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val part = df.filter(col("grp") === g)
      // standalone sketch of just this group's rows: (k, kth_hash, est)
      val solo = Sketches.kmvDistinctText(part, col("tok"), k = 32).head()
      val nDistinct = part.select(countDistinct(col("tok"))).head().getLong(0)
      val expected = (math.min(nDistinct, 32L).toInt, solo.getLong(1), solo.getDouble(2))
      assert(grouped(g) == expected,
        s"group $g grouped sketch ${grouped(g)} diverges from standalone $expected")
    }
  }

  // ---- Count-Sketch F2 (self-join size) ----

  test("F2: a single-key column estimates its self-join size EXACTLY (signs cancel nothing)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq.fill(1000)("hot").toDF("k")
    val est = graft.operators.Sketches.F2.estimateText(df, col("k"))
      .head().getDouble(2)
    assert(est == 1000.0 * 1000.0, s"single-key F2 must be exact: $est")
  }

  test("F2: estimate tracks the exact self-join size within 10% on fixture tokens") {
    import org.apache.spark.sql.functions._
    val tok = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
    val est = graft.operators.Sketches.F2.estimateText(tok, col("t"))
      .head().getDouble(2)
    val exact = tok.groupBy("t").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).head().getLong(0).toDouble
    val ratio = est / exact
    info(f"F2 estimate/exact: $ratio%.4f (est $est%.0f, exact $exact%.0f)")
    // measured 0.968 on the Zipf-headed fixture (stable - deterministic
    // hashes); w=256 theory band ~ +-2*sqrt(2/256) ~ 18%
    assert(ratio > 0.9 && ratio < 1.1, f"F2 estimator off: $ratio%.4f")
  }

  test("F2: result is partition-invariant (integer grid arithmetic)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0 until 500).map(i => s"k${i % 37}").toDF("k")
    val one = graft.operators.Sketches.F2.estimateText(df.repartition(1), col("k")).head().getDouble(2)
    val many = graft.operators.Sketches.F2.estimateText(df.repartition(13), col("k")).head().getDouble(2)
    assert(one == many, s"partitioning changed the estimate: $one vs $many")
  }
}
