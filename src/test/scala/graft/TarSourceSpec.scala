package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TarCorpusSource

/** TAR corpus source: exact UTF-8 round-trips across the 512-block
  * edge sizes and hostile contents, loud failures on unrepresentable
  * inputs and corrupted shards, and byte-deterministic archives. */
class TarSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_tar_spec_").toString

  private def roundTrip(rows: Seq[(String, String)], shards: Int = 3)
      : Set[(String, String)] = {
    import spark.implicits._
    val dir = tmp()
    TarCorpusSource.write(rows.toDF("name", "text"), dir, shards)
    TarCorpusSource.read(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("round-trip is exact across block-boundary sizes and hostile content") {
    val rows = Seq(
      "empty.txt" -> "",
      "b511.txt" -> "a" * 511,
      "b512.txt" -> "b" * 512,
      "b513.txt" -> "c" * 513,
      "b1024.txt" -> "d" * 1024,
      "hostile.txt" -> "line1\nline2\r\n\"quoted\",comma\ttab",
      // multi-byte UTF-8: payload size is BYTES, not chars
      "utf8.txt" -> "héllo wörld — ¿日本語? ®©",
      "spaces.txt" -> "  leading and trailing  ")
    assert(roundTrip(rows) == rows.toSet)
  }

  test("member names survive verbatim and shard count is honoured") {
    import spark.implicits._
    val rows = (0 until 50).map(i => (s"doc-$i.txt", s"content $i"))
    val dir = tmp()
    TarCorpusSource.write(rows.toDF("name", "text"), dir, shards = 5)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
    assert(parts.length == 5, "one archive per shard task")
    assert(roundTrip(rows, shards = 5) == rows.toSet)
  }

  test("NULL contents and oversized names fail loudly, never silently") {
    import spark.implicits._
    val dir = tmp()
    val withNull = Seq(("a.txt", "ok"), ("b.txt", null)).toDF("name", "text")
    val eNull = intercept[Exception] {
      TarCorpusSource.write(withNull, dir, shards = 1)
    }
    assert(eNull.getMessage != null)
    val longName = Seq(("x" * 101, "ok")).toDF("name", "text")
    intercept[Exception] {
      TarCorpusSource.write(longName, dir, shards = 1)
    }
  }

  test("a corrupted header fails the checksum, not a silent mis-parse") {
    import spark.implicits._
    val dir = tmp()
    TarCorpusSource.write(
      Seq(("a.txt", "hello"), ("b.txt", "world")).toDF("name", "text"),
      dir, shards = 1)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head.toPath
    val bytes = java.nio.file.Files.readAllBytes(part)
    bytes(124) = '7' // mangle the first member's size field
    java.nio.file.Files.write(part, bytes)
    // drop Hadoop's local-FS CRC sidecar so the corruption reaches the
    // TAR parser (on checksummed filesystems it is caught even earlier)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val e = intercept[Exception] {
      TarCorpusSource.read(spark, dir).collect()
    }
    assert(e.getMessage.contains("checksum") ||
      (e.getCause != null && e.getCause.getMessage.contains("checksum")),
      s"expected a checksum failure, got: $e")
  }

  test("archives are byte-deterministic (mtime 0, stable member order)") {
    import spark.implicits._
    val rows = (0 until 20).map(i => (s"d$i.txt", s"text $i"))
    val df = rows.toDF("name", "text").repartition(1).orderBy("name")
    val (d1, d2) = (tmp(), tmp())
    TarCorpusSource.write(df, d1, shards = 1)
    TarCorpusSource.write(df, d2, shards = 1)
    def partBytes(d: String) = java.nio.file.Files.readAllBytes(
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".tar")).head.toPath)
    assert(java.util.Arrays.equals(partBytes(d1), partBytes(d2)),
      "the same corpus must produce byte-identical shards")
  }
}
