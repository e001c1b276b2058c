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
}
