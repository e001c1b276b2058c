package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: the interleave must be the textbook Morton code
  * (hand values, bijectivity) and z-range clustering must actually
  * buy two-dimensional locality — per-bucket spans tight in BOTH keys,
  * which a single-key sort cannot give. */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("zValue is the textbook Morton interleave") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L),
      (0L, 2L), (3L, 3L), (5L, 9L))
    def morton(a: Long, b: Long): Long =
      (0 until 21).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val got = cases.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq == cases.map { case (a, b) => morton(a, b) })
    assert(morton(1L, 0L) == 1L && morton(0L, 1L) == 2L && morton(3L, 3L) == 15L)
  }

  test("zValue is a bijection on the 32x32 grid") {
    import spark.implicits._
    val grid = for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong)
    val zs = grid.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"))).as[Long].collect()
    assert(zs.distinct.length == 1024)
    assert(zs.min == 0L && zs.max == 1023L, "32x32 must fill [0, 1024) exactly")
  }

  test("z-range clustering bounds per-bucket spans in BOTH keys") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("a"), col("l_partkey").as("b"))
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("a") - min("a")).cast("double").as("sa"),
          (max("b") - min("b")).cast("double").as("sb"))
        .agg(avg("sa"), avg("sb")).head()
      (s.getDouble(0), s.getDouble(1))
    }
    val global = li.agg((max("a") - min("a")).cast("double"),
      (max("b") - min("b")).cast("double")).head()
    val (ga, gb) = (global.getDouble(0), global.getDouble(1))
    val (za, zb) = spans(Layout.clusterByZ(li, col("a"), col("b"), buckets = 16))
    // a single-key sort gives one tight dimension and one full-span
    // dimension; z buckets must be materially tighter than full span
    // in BOTH
    assert(za < 0.7 * ga, f"orderkey span $za%.0f not tight vs global $ga%.0f")
    assert(zb < 0.7 * gb, f"partkey span $zb%.0f not tight vs global $gb%.0f")
    val sorted = li.repartitionByRange(16, col("a"))
    val (_, sb) = spans(sorted)
    assert(zb < sb, "z buckets must beat a single-key sort on the other key's span")
  }

  test("z-ordered parquet SKIPS on BOTH keys: the scan decodes a fraction of rows under either single-key predicate") {
    // the pruning the layout exists for (VERDICT r10 item #4): write
    // the clustered table, query a narrow range on EACH key, and read
    // the scan node's own output-row metric — row groups whose
    // min/max stats exclude the range never decode, so the metric IS
    // the measured skip. The single-key-sorted control shows the
    // asymmetry z-order removes: it skips on its sort key and decodes
    // ~everything on the other.
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("a"), col("l_partkey").as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zskip_")
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
    // 64 files: granularity matters — a bucket whose contiguous
    // z-interval straddles a major-bit boundary spans the FULL other
    // key (the classic z-curve jump), and at 16 buckets those
    // straddlers are a third of the layout; at 64 they are a small
    // fraction and the decoded share approaches the range's area
    Layout.clusterByZ(li, col("a"), col("b"), buckets = 64)
      .write.mode("overwrite").parquet(s"$dir/z")
    li.repartitionByRange(64, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$dir/bya")
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
    }
    val total = li.count()
    val st = li.agg(min("a"), max("a"), min("b"), max("b")).head()
    // the [1/4, 3/8) eighth: a 1/8-wide range that does NOT straddle
    // the key's top-bit boundary (a range crossing the halfway point
    // touches both top-level z-quadrants and halves the measured
    // skip — real query ranges mostly don't sit exactly astride the
    // domain midpoint)
    def quarterEighth(lo: Long, hi: Long): (Long, Long) =
      (lo + (hi - lo) / 4, lo + (hi - lo) * 3 / 8)
    val (a1, a2) = quarterEighth(st.getLong(0), st.getLong(1))
    val (b1, b2) = quarterEighth(st.getLong(2), st.getLong(3))
    val z = spark.read.parquet(s"$dir/z")
    val bya = spark.read.parquet(s"$dir/bya")
    val za = scanRows(z.filter(col("a").between(a1, a2)))
    val zb = scanRows(z.filter(col("b").between(b1, b2)))
    val sa = scanRows(bya.filter(col("a").between(a1, a2)))
    val sbRows = scanRows(bya.filter(col("b").between(b1, b2)))
    info(f"decoded rows of $total: z a-pred $za (${za * 100.0 / total}%.0f%%), " +
      f"z b-pred $zb (${zb * 100.0 / total}%.0f%%), " +
      f"sortA a-pred $sa (${sa * 100.0 / total}%.0f%%), " +
      f"sortA b-pred $sbRows (${sbRows * 100.0 / total}%.0f%%)")
    assert(za < total / 2, s"z layout failed to skip on key a: $za of $total decoded")
    assert(zb < total / 2, s"z layout failed to skip on key b: $zb of $total decoded")
    assert(sbRows > total * 9 / 10,
      "control: the single-key layout should decode ~everything on the other key " +
        s"(got $sbRows of $total) — if this fails the measurement is not measuring stats pruning")
  }

  test("bucketed co-located join runs with ZERO shuffle Exchange and matches the unbucketed result") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    Layout.writeBucketed(orders, "/tmp/graft_bucket_spec/orders",
      "spec_orders_bkt", "o_orderkey", 4)
    Layout.writeBucketed(items, "/tmp/graft_bucket_spec/lineitem",
      "spec_lineitem_bkt", "l_orderkey", 4)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path so the assertion is about bucketing,
      // not about a broadcast hiding the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("spec_orders_bkt")
        .join(spark.table("spec_lineitem_bkt"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val rows = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // FINAL adaptive plan only (AQE appends the initial plan below
      // it); the join subtree = everything under SortMergeJoin there.
      // Scans must be bucketed, and no Exchange may sit below the join
      // (the aggregation above it legitimately shuffles on its key).
      val planStr = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val joinSubtree = planStr.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin")).mkString("\n")
      assert(joinSubtree.nonEmpty, s"expected a SortMergeJoin in:\n$planStr")
      assert(joinSubtree.contains("Bucketed: true"),
        s"join must read the bucketed layout:\n$planStr")
      assert(!joinSubtree.contains("Exchange"),
        s"bucket-to-bucket join must not shuffle either side:\n$planStr")
      // result equality with the plain (unbucketed) join
      val expect = orders.join(items, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("bucketed layout PRUNES point lookups to a single bucket") {
    // depends on the tables the co-located-join test wrote; (re)write
    // defensively so the test stands alone
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    Layout.writeBucketed(orders, "/tmp/graft_bucket_spec/orders",
      "spec_orders_bkt", "o_orderkey", 4)
    // autoBucketedScan replans a bare filter as a non-bucketed scan
    // (pruning still applies, but the plan marker disappears) — pin
    // the marker on the explicitly-bucketed form
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("spec_orders_bkt").filter(col("o_orderkey") === 42L)
      assert(q.count() == 1L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 4"),
        s"point filter on the bucket key must read exactly one bucket:\n$plan")
    } finally
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
  }

  private def hrwAssign(shards: Seq[String]): Map[Long, String] = {
    import spark.implicits._
    (0L until 1000L).toDF("k")
      .select(col("k"), Layout.hrwShard(col("k"), shards).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("hrwShard: growing the shard set moves ONLY the new shard's keys") {
    val s8 = (0 until 8).map(i => f"shard-$i%02d")
    val a8 = hrwAssign(s8)
    val a9 = hrwAssign(s8 :+ "shard-08")
    val moved = a8.keys.filter(k => a8(k) != a9(k))
    assert(moved.nonEmpty, "a new shard must win some keys")
    assert(moved.forall(k => a9(k) == "shard-08"),
      "every moved key must land on the NEW shard — that is the rendezvous contract")
    // and the new shard wins roughly 1/9 of the keyspace
    assert(moved.size > 1000 / 9 / 2 && moved.size < 1000 / 9 * 2,
      s"the new shard should win ~1/9 of 1000 keys, won ${moved.size}")
  }

  test("hrwShard: removing a shard moves only ITS keys") {
    val s8 = (0 until 8).map(i => f"shard-$i%02d")
    val a8 = hrwAssign(s8)
    val a7 = hrwAssign(s8.filterNot(_ == "shard-03"))
    a8.foreach { case (k, s) =>
      if (s != "shard-03")
        assert(a7(k) == s, s"key $k must keep $s when an unrelated shard leaves")
    }
  }

  test("hrwShard: balanced and total over a small keyspace; duplicates rejected") {
    val s8 = (0 until 8).map(i => f"shard-$i%02d")
    val byShard = hrwAssign(s8).groupBy(_._2)
    assert(byShard.keySet == s8.toSet, "every shard must win some keys at n=1000")
    intercept[IllegalArgumentException] {
      Layout.hrwShard(col("k"), Seq("a", "a"))
    }
  }

  test("hrwRouteLocal (the point arm) ≡ the hrwShard column on every key") {
    val s8 = (0 until 8).map(i => f"shard-$i%02d")
    val colArm = hrwAssign(s8)
    (0L until 1000L).foreach { k =>
      val local = Layout.hrwRouteLocal(k.toString, s8)
      assert(local == colArm(k),
        s"point arm diverged on key $k: $local vs ${colArm(k)}")
    }
    // string keys route too, and duplicates are rejected
    assert(Layout.hrwRouteLocal("doc-x", s8).startsWith("shard-"))
    intercept[IllegalArgumentException] {
      Layout.hrwRouteLocal("k", Seq("a", "a"))
    }
  }

  // ---- dataset manifest ----------------------------------------------

  private def mrows(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Long)] = {
    Layout.manifest(df, col("shard"), col("id"), col("payload"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("manifest: merge(shard manifests) == manifest of the union; order-free") {
    import spark.implicits._
    val a = Seq(("s1", 1L, "alpha"), ("s1", 2L, "beta")).toDF("shard", "id", "payload")
    val b = Seq(("s2", 3L, "gamma")).toDF("shard", "id", "payload")
    val merged = Layout.mergeManifests(
      Layout.manifest(a.unionAll(b), col("shard"), col("id"), col("payload")))
      .collect().head
    val direct = Layout.manifest(a.unionAll(b).withColumn("shard", lit("all")),
      col("shard"), col("id"), col("payload")).collect().head
    assert((merged.getLong(0), merged.getLong(1), merged.getLong(2)) ==
      ((direct.getLong(1), direct.getLong(2), direct.getLong(3))))
    // row order cannot change any manifest column
    val shuffled = a.unionAll(b).orderBy(col("payload").desc)
    assert(mrows(a.unionAll(b)) == mrows(shuffled))
  }

  test("manifest: a single mangled character changes the payload fingerprint") {
    import spark.implicits._
    val base = Seq(("s", 1L, "the quick brown fox"), ("s", 2L, "other")).toDF("shard", "id", "payload")
    val mangled = Seq(("s", 1L, "the quick brown fOx"), ("s", 2L, "other")).toDF("shard", "id", "payload")
    val f1 = mrows(base)("s")
    val f2 = mrows(mangled)("s")
    assert(f1._1 == f2._1 && f1._2 == f2._2 && f1._3 != f2._3,
      s"only the fingerprint may move: $f1 vs $f2")
  }

  test("diffManifests: an empty diff IS the verification; every damage class is named") {
    import spark.implicits._
    def mf(df: org.apache.spark.sql.DataFrame) =
      Layout.manifest(df, col("shard"), col("id"), col("payload"))
    val src = Seq(
      ("s0", 1L, "a"), ("s0", 2L, "b"),
      ("s1", 3L, "c"), ("s1", 4L, "d"),
      ("s2", 5L, "e"), ("s2", 6L, "f"),
      ("s3", 7L, "g")).toDF("shard", "id", "payload")
    // identical copies: EMPTY diff
    assert(Layout.diffManifests(mf(src), mf(src)).count() == 0L)
    // damage: s0 dropped entirely, a row dropped from s1, a payload
    // byte flipped in s2, a NEW shard s4 appears; s3 stays clean
    val dst = Seq(
      ("s1", 3L, "c"),
      ("s2", 5L, "e"), ("s2", 6L, "F"),
      ("s3", 7L, "g"),
      ("s4", 8L, "h")).toDF("shard", "id", "payload")
    val got = Layout.diffManifests(mf(src), mf(dst)).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("s0" -> "missing_in_b", "s1" -> "row_count",
      "s2" -> "content", "s4" -> "missing_in_a"), got.toString)
    // id substitution at equal count is a content verdict too (the id
    // sum moves even when the payload bytes do not)
    val swapped = Seq(
      ("s0", 1L, "a"), ("s0", 9L, "b"),
      ("s1", 3L, "c"), ("s1", 4L, "d"),
      ("s2", 5L, "e"), ("s2", 6L, "f"),
      ("s3", 7L, "g")).toDF("shard", "id", "payload")
    val got2 = Layout.diffManifests(mf(src), mf(swapped)).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got2 == Map("s0" -> "content"), got2.toString)
    // an all-NULL-payload shard carries a NULL fingerprint: the
    // null-safe compare must neither crash nor report a clean shard
    val na = Seq(("n", 1L, null.asInstanceOf[String])).toDF("shard", "id", "payload")
    val nb = Seq(("n", 1L, "now present")).toDF("shard", "id", "payload")
    assert(Layout.diffManifests(mf(na), mf(na)).count() == 0L)
    val got3 = Layout.diffManifests(mf(na), mf(nb)).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got3 == Map("n" -> "content"), got3.toString)
  }

  test("crawlDelta classifies all four statuses; NULL fingerprints compare null-safely") {
    import spark.implicits._
    val a = Seq(("u1", "f1"), ("u2", "f2"), ("u3", "f3"),
      ("u4", null.asInstanceOf[String])).toDF("url", "fp")
    val b = Seq(("u1", "f1"), ("u2", "f2b"), ("u5", "f5"),
      ("u4", null.asInstanceOf[String])).toDF("url", "fp")
    val got = Layout.crawlDelta(a, b).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "u1" -> "unchanged", "u2" -> "changed", "u3" -> "vanished",
      // a NULL fp present on BOTH sides is unchanged, not changed —
      // presence is tracked by flags, never by fp-null
      "u4" -> "unchanged", "u5" -> "new"), got.toString)
    // NULL on one side only IS a content change
    val a2 = Seq(("u", "f")).toDF("url", "fp")
    val b2 = Seq(("u", null.asInstanceOf[String])).toDF("url", "fp")
    assert(Layout.crawlDelta(a2, b2).head().getString(1) == "changed")
  }
}
