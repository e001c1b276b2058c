package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextCorpusSource

/** The text-format round-trips must survive content the fixture is too
  * polite to contain: embedded quotes, commas, newlines, backslashes,
  * JSON-special characters, and non-ASCII — the characters that
  * corrupt a naive codec silently. */
class TextSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_testsrc_$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def hostile = {
    import spark.implicits._
    Seq(
      (1L, """she said "hi", then left""", "en"),
      (2L, "line one\nline two\r\nline three", "en"),
      (3L, """back\slash and "quoted, comma"""", "en"),
      (4L, "çhars ünïcode — 中文 текст", "zh"),
      (5L, "{\"looks\": \"like json\"}", "en"),
      (6L, "trailing space ", "en"),
      (7L, "", "en")
    ).toDF("doc_id", "text", "lang")
  }

  private def roundTrip(write: (org.apache.spark.sql.DataFrame, String) => Unit,
      read: (SparkSession, String, org.apache.spark.sql.types.StructType) => org.apache.spark.sql.DataFrame,
      dir: String): Map[Long, (String, String)] = {
    val df = hostile
    write(df, dir)
    read(spark, dir, df.schema)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
  }

  test("JSONL round-trips hostile text byte-for-byte") {
    val want = hostile.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val got = roundTrip(TextCorpusSource.writeJsonl, TextCorpusSource.readJsonl, tmp("jsonl"))
    assert(got == want, s"JSONL mangled content:\n$got\nvs\n$want")
  }

  test("CSV (RFC 4180 quote-doubling) round-trips hostile text, embedded newlines included") {
    val want = hostile.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val got = roundTrip(TextCorpusSource.writeCsv, TextCorpusSource.readCsv, tmp("csv"))
    assert(got == want, s"CSV mangled content:\n$got\nvs\n$want")
  }

  test("CSV output is standards-readable: quotes escape by doubling, not backslash") {
    import scala.jdk.CollectionConverters._
    val dir = tmp("csvraw")
    TextCorpusSource.writeCsv(hostile.filter("doc_id = 1").coalesce(1), dir)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".csv")).toSeq.head
    val raw = new String(java.nio.file.Files.readAllBytes(part),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(raw.contains("\"\"hi\"\""),
      s"RFC 4180 consumers expect doubled quotes, got:\n$raw")
    assert(!raw.contains("\\\""), s"backslash-escaped quotes are not RFC 4180:\n$raw")
  }
}
