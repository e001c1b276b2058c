package graft

import java.io.{BufferedInputStream, DataInputStream, EOFException}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 A/B harness for the q_warc_source bench flag (r16: 0.55 →
  * 1.02 s on the refactored reader): times the r15 WET read path (the
  * pre-mixed-bundle recordIterator, inlined below verbatim) against
  * the current one over the SAME fixture in the SAME JVM, interleaved
  * reps. Run: `sbt "Test/runMain graft.WarcAbBench"`. Numbers land in
  * BASELINE.md; this harness is the method record. */
object WarcAbBench {

  // ---- the r15 reader, verbatim (commit 14bc1f4) ----
  private def recordIteratorR15(path: String, in: DataInputStream)
      : Iterator[(String, String, Array[Byte])] = {
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"$path: $what")
    def readLine(atBoundary: Boolean): String = {
      val first = in.read()
      if (first < 0) {
        if (atBoundary) return null
        fail("truncated shard (EOF inside a record header)")
      }
      val buf = new java.io.ByteArrayOutputStream(64)
      var b = first
      while (b != '\n') {
        buf.write(b)
        if (buf.size > 32768) fail("header line past 32768 bytes")
        b = in.read()
        if (b < 0) fail("truncated shard (EOF inside a header line)")
      }
      val s = buf.toString(StandardCharsets.UTF_8.name())
      if (!s.endsWith("\r")) fail("malformed header line (LF without CR)")
      s.dropRight(1)
    }
    new Iterator[(String, String, Array[Byte])] {
      private var queued: (String, String, Array[Byte]) = null
      private var done = false
      private def advance(): Unit = {
        if (done || queued != null) return
        val version = readLine(atBoundary = true)
        if (version == null) { done = true; return }
        if (version != "WARC/1.0")
          fail(s"expected a WARC/1.0 version line, got '$version'")
        var contentLength = -1L
        var uri: String = null
        var warcType = ""
        var line = readLine(atBoundary = false)
        while (line.nonEmpty) {
          val i = line.indexOf(':')
          if (i <= 0) fail(s"malformed WARC header '$line'")
          val (k, v) = (line.substring(0, i).trim, line.substring(i + 1).trim)
          if (k.equalsIgnoreCase("Content-Length")) {
            contentLength =
              try java.lang.Long.parseLong(v)
              catch { case _: NumberFormatException =>
                fail(s"non-numeric Content-Length '$v'") }
          } else if (k.equalsIgnoreCase("WARC-Target-URI")) uri = v
          else if (k.equalsIgnoreCase("WARC-Type")) warcType = v
          line = readLine(atBoundary = false)
        }
        if (contentLength < 0) fail("record missing Content-Length")
        if (uri == null) fail("record missing WARC-Target-URI")
        val payload = new Array[Byte](contentLength.toInt)
        try in.readFully(payload)
        catch { case _: EOFException =>
          fail(s"truncated record '$uri'") }
        val term = new Array[Byte](4)
        try in.readFully(term)
        catch { case _: EOFException => fail(s"record '$uri' missing terminator") }
        if (!(term(0) == '\r' && term(1) == '\n' && term(2) == '\r' && term(3) == '\n'))
          fail(s"record '$uri' not followed by CRLF CRLF")
        queued = (uri, warcType, payload)
      }
      override def hasNext: Boolean = { advance(); queued != null }
      override def next(): (String, String, Array[Byte]) = {
        advance()
        if (queued == null) throw new NoSuchElementException
        val r = queued; queued = null; r
      }
    }
  }

  private def readR15(spark: SparkSession, dir: String) = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(s"$dir/*.warc.gz")
      .flatMap { case (path, stream) =>
        val in = new DataInputStream(new BufferedInputStream(
          new GZIPInputStream(new BufferedInputStream(stream.open()))))
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case scala.util.control.NonFatal(_) => () }))
        recordIteratorR15(path.toString, in)
          .map { case (uri, _, payload) =>
            (uri, new String(payload, StandardCharsets.UTF_8)) }
      }
      .toDF("record_uri", "text")
  }

  private def census(df: org.apache.spark.sql.DataFrame): Unit = {
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(split(col("record_uri"), "\\.").getItem(0).cast("long")).as("sum_ids"),
      sum(length(col("text")).cast("long")).as("sum_chars"),
      sum(conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
        .cast("long") % lit(2147483648L)).as("text_fp")).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select(concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
        col("text"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_warcab_").toString
    graft.sources.WarcCorpusSource.write(d, tmp, shards = 8)
    // warm both paths once
    census(graft.sources.WarcCorpusSource.read(spark, tmp))
    census(readR15(spark, tmp))
    val reps = 10
    val newT = new Array[Double](reps)
    val oldT = new Array[Double](reps)
    for (i <- 0 until reps) {
      var t0 = System.nanoTime()
      census(graft.sources.WarcCorpusSource.read(spark, tmp))
      newT(i) = (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      census(readR15(spark, tmp))
      oldT(i) = (System.nanoTime() - t0) / 1e6
    }
    // the full gate body (write + read + census), alternating
    val newG = new Array[Double](5)
    val oldW = new Array[Double](5)
    for (i <- 0 until 5) {
      var t0 = System.nanoTime()
      graft.sources.WarcCorpusSource.write(d, tmp, shards = 8)
      census(graft.sources.WarcCorpusSource.read(spark, tmp))
      newG(i) = (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      graft.sources.WarcCorpusSource.write(d, tmp, shards = 8)
      oldW(i) = (System.nanoTime() - t0) / 1e6
    }
    def stats(a: Array[Double]) =
      f"min ${a.min}%.0f / med ${a.sorted.apply(a.length / 2)}%.0f / max ${a.max}%.0f ms"
    println(s"READ  r17 (skip-capable): ${stats(newT)}")
    println(s"READ  r15 (pre-refactor): ${stats(oldT)}")
    println(s"GATE  r17 write+read:     ${stats(newG)}")
    println(s"WRITE r17 only:           ${stats(oldW)}")
    spark.stop()
  }
}
