package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.sources.BinaryVectorSource

/** Packed-f32 source/sink tests (ref `/root/reference/src/disk_store.rs`
  * format + `src/lib.rs:516-550` mmap store test). */
class BinarySourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("round-trip: parquet -> .bin -> read-back preserves ids and values") {
    val tmp = Files.createTempDirectory("graft_bin_rt").toString
    val orig = spark.read.parquet(s"$sfDir/embeddings.parquet")
    BinaryVectorSource.write(orig, tmp, dims = 64)
    val back = BinaryVectorSource.read(spark, tmp, dims = 64)
    assert(back.count() == 500L)
    // row count discovery from file size (ref src/lib.rs:523-531)
    val joined = back.as("b").join(orig.as("o"), col("b.vec_id") === col("o.vec_id"))
      .select(l2SqNative(col("b.embedding"), col("o.embedding")).as("d"))
      .agg(max(col("d"))).collect()(0).getDouble(0)
    assert(joined == 0.0, s"read-back vectors differ (max L2² = $joined)")
  }

  test("misaligned file size is rejected (ref disk_store.rs:22-27)") {
    val tmp = Files.createTempDirectory("graft_bin_bad")
    Files.write(Paths.get(tmp.toString, "part-00000.bin"), new Array[Byte](250)) // not % 256
    val e = intercept[IllegalArgumentException] {
      BinaryVectorSource.read(spark, tmp.toString, dims = 64)
    }
    assert(e.getMessage.contains("not a multiple"))
  }

  test("dimension mismatch rejected at write (ref src/lib.rs:62-69)") {
    val df = spark.range(3).select(col("id").as("vec_id"),
      array(lit(1.0f), lit(2.0f)).as("embedding"))
    val tmp = Files.createTempDirectory("graft_bin_dim").toString
    val e = intercept[Exception] {
      BinaryVectorSource.write(df, tmp, dims = 64)
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("dimension mismatch"))
  }
}
