package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The residency ledger (round-18 GC fix): pinned memo builds survive
  * [[Residency.sweep]], per-execution checkpoint scratch does not,
  * plain persists are left for CacheManager plan-match reuse, and
  * [[Spread.count]]'s floor binds on small inputs while leaf bytes
  * drive it on large ones. */
class ResidencySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def liveCheckpointIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs
      .filter { case (_, r) => r.isCheckpointed }.keySet.toSet

  test("sweep drops unpinned checkpoint scratch, keeps pinned builds") {
    import spark.implicits._
    val pinnedDf = Residency.pinning(spark) {
      Seq(1, 2, 3).toDF("a").localCheckpoint()
    }
    val scratch = Seq(4, 5, 6).toDF("a").localCheckpoint()
    assert(scratch.count() == 3)
    val before = liveCheckpointIds
    assert(before.size >= 2)
    Residency.sweep(spark)
    val after = liveCheckpointIds
    assert(after.size < before.size, "scratch checkpoint must be swept")
    // the pinned frame still serves (its blocks survived the sweep)
    assert(pinnedDf.count() == 3)
  }

  test("sweep leaves plain persists alone (CacheManager reuse contract)") {
    import spark.implicits._
    val df = Seq(7, 8).toDF("a")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(df.count() == 2)
    Residency.sweep(spark)
    assert(df.storageLevel.useMemory, "un-checkpointed persist must survive")
    df.unpersist(blocking = true)
  }

  test("checkpoint release frees blocks once a successor materialized") {
    import spark.implicits._
    val prev = Seq(1L, 2L).toDF("v").localCheckpoint()
    val next = prev.select((org.apache.spark.sql.functions.col("v") + 1).as("v"))
      .localCheckpoint()
    org.apache.spark.sql.graft.CheckpointBridge.release(prev)
    // successor still fully served from its own blocks
    assert(next.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("Spread.count: floor binds on small inputs, leaf bytes scale it") {
    import spark.implicits._
    val floor = spark.sparkContext.defaultParallelism
    val small = Seq(1, 2, 3).toDF("a")
    assert(Spread.count(small) == floor)
    // spark.range stats = 8 bytes/row: 2^30 rows = 8 GiB of leaf bytes
    // -> 128 partitions at the 64 MB target (no execution happens)
    val big = spark.range(1L << 30).toDF("a")
    assert(Spread.count(big) == math.max(floor, 128))
  }
}
