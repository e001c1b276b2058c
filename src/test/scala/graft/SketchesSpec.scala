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

  test("below k distinct the sketch is exact") {
    import spark.implicits._
    val tiny = (0 until 1000).map(i => i % 10L).toDF("id").repartition(8)
    val r = Sketches.kmvDistinct(tiny, col("id"), k = 64).head()
    assert(r.getDouble(2) == 10.0, "fewer than k distinct hashes -> exact count")
  }
}
