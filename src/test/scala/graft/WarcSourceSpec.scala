package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WarcCorpusSource

/** WARC/WET corpus source: exact UTF-8 round-trips under hostile
  * payloads (including embedded fake WARC records — the length-framed
  * parser must never scan payloads for boundaries), loud failures on
  * malformed/truncated records and unrepresentable inputs, gzip
  * member-per-record layout, and byte-deterministic shards. */
class WarcSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_warc_spec_").toString

  private def roundTrip(rows: Seq[(String, String)], shards: Int = 3)
      : Set[(String, String)] = {
    import spark.implicits._
    val dir = tmp()
    WarcCorpusSource.write(rows.toDF("name", "text"), dir, shards)
    WarcCorpusSource.read(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  private def errText(e: Throwable): String =
    Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")

  test("round-trip is exact under hostile payloads, including embedded WARC framing") {
    val fakeRecord = "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: 999999\r\n\r\nnot a real payload\r\n\r\n"
    val rows = Seq(
      "empty.txt" -> "",
      "plain.txt" -> "hello world",
      // a payload that IS a syntactically complete WARC record: the
      // reader is Content-Length-framed, so this must pass through
      "hostile_warc.txt" -> fakeRecord,
      "crlf.txt" -> "line1\r\nline2\nline3\r\n\r\n",
      "utf8.txt" -> "héllo wörld — ¿日本語? ®©",
      "long.txt" -> ("x" * 10000 + "\r\n") * 30)
    assert(roundTrip(rows) == rows.toSet)
  }

  test("shard count is honoured; each shard is a multi-member gzip stream") {
    import spark.implicits._
    val rows = (0 until 40).map(i => (s"doc-$i.txt", s"content $i"))
    val dir = tmp()
    WarcCorpusSource.write(rows.toDF("name", "text"), dir, shards = 4)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(parts.length == 4, "one .warc.gz per shard task")
    // member-per-record: a 10-record shard has 10 gzip magic headers
    val bytes = java.nio.file.Files.readAllBytes(parts.head.toPath)
    val magics = bytes.sliding(2).count(a =>
      (a(0) & 0xff) == 0x1f && (a(1) & 0xff) == 0x8b)
    assert(magics >= 2, s"expected one gzip member per record, saw $magics magic pairs")
    assert(roundTrip(rows, shards = 4) == rows.toSet)
  }

  test("NULLs and control characters in names fail loudly") {
    import spark.implicits._
    intercept[Exception] {
      WarcCorpusSource.write(
        Seq(("a.txt", "ok"), ("b.txt", null)).toDF("name", "text"), tmp(), 1)
    }
    val e = intercept[Exception] {
      WarcCorpusSource.write(
        Seq(("evil\r\nWARC-Type: forged", "ok")).toDF("name", "text"), tmp(), 1)
    }
    assert(errText(e).contains("control") || errText(e).nonEmpty)
  }

  test("a non-WARC stream fails the version check, not a silent mis-parse") {
    val dir = tmp()
    val f = java.nio.file.Paths.get(dir, "part-00000.warc.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    out.write("HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n".getBytes("UTF-8"))
    out.close()
    val e = intercept[Exception] { WarcCorpusSource.read(spark, dir).collect() }
    assert(errText(e).contains("WARC/1.0"), s"expected the version-line error: $e")
  }

  test("a record missing Content-Length fails loudly") {
    val dir = tmp()
    val f = java.nio.file.Paths.get(dir, "part-00000.warc.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    out.write(("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: a.txt\r\n\r\nhi\r\n\r\n").getBytes("UTF-8"))
    out.close()
    val e = intercept[Exception] { WarcCorpusSource.read(spark, dir).collect() }
    assert(errText(e).contains("Content-Length"), s"expected the missing-header error: $e")
  }

  test("truncation mid-payload fails loudly with the declared length") {
    val dir = tmp()
    val f = java.nio.file.Paths.get(dir, "part-00000.warc.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    out.write(("WARC/1.0\r\nWARC-Target-URI: a.txt\r\n" +
      "Content-Length: 5000\r\n\r\nonly a little").getBytes("UTF-8"))
    out.close()
    val e = intercept[Exception] { WarcCorpusSource.read(spark, dir).collect() }
    assert(errText(e).contains("truncated"), s"expected the truncation error: $e")
  }

  test("a payload/Content-Length disagreement trips the terminator check") {
    val dir = tmp()
    val f = java.nio.file.Paths.get(dir, "part-00000.warc.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    // declares 2 but carries 4 before the terminator: after reading 2
    // bytes the parser must find junk where CRLF CRLF belongs
    out.write(("WARC/1.0\r\nWARC-Target-URI: a.txt\r\n" +
      "Content-Length: 2\r\n\r\nhiXX\r\n\r\n").getBytes("UTF-8"))
    out.close()
    val e = intercept[Exception] { WarcCorpusSource.read(spark, dir).collect() }
    assert(errText(e).contains("CRLF"), s"expected the terminator error: $e")
  }

  // ---- response records (raw-crawl grammar) -------------------------

  private def responseTrip(rows: Seq[(String, String, Int)], shards: Int = 3)
      : Set[(String, Int, String)] = {
    import spark.implicits._
    val dir = tmp()
    WarcCorpusSource.writeResponses(rows.toDF("name", "text", "status"), dir, shards)
    WarcCorpusSource.readResponses(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
  }

  test("response round-trip: statuses and hostile bodies survive exactly") {
    val rows = Seq(
      ("ok.html", "<html>fine</html>", 200),
      ("gone.html", "", 404),
      // a body containing the head/body separator AND a fake status
      // line: the split is RFC framing (FIRST blank line) inside the
      // length-framed payload, so none of this is touched
      ("hostile_http.html", "HTTP/1.1 500 Fake\r\nX: y\r\n\r\nnot headers", 200),
      // a body that IS a complete WARC record: outer framing is
      // length-based, never a scan
      ("hostile_warc.html",
        "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9\r\n\r\nfake body\r\n\r\n", 503),
      ("utf8.html", "héllo wörld — ¿日本語?", 301))
    assert(responseTrip(rows) ==
      rows.map { case (n, t, s) => (n, s, t) }.toSet)
  }

  test("charset round-trip: declared latin-1 and windows-1252 decode by header, not assumption") {
    import spark.implicits._
    val rows = Seq(("a.html", "café nº 5 — ok", 200))
    // latin-1: é/º are single high bytes — invalid as UTF-8, so a
    // UTF-8-assuming reader could not produce this round-trip
    val d1 = tmp()
    WarcCorpusSource.writeResponses(
      Seq(("a.html", "café nº 5", 200)).toDF("name", "text", "status"),
      d1, shards = 1, charset = "iso-8859-1")
    assert(WarcCorpusSource.readResponses(spark, d1)
      .collect().map(_.getString(2)).toSeq == Seq("café nº 5"))
    // windows-1252: the em dash and curly quotes latin-1 lacks
    val d2 = tmp()
    WarcCorpusSource.writeResponses(
      Seq(("b.html", "“curly” — dash", 200)).toDF("name", "text", "status"),
      d2, shards = 1, charset = "windows-1252")
    assert(WarcCorpusSource.readResponses(spark, d2)
      .collect().map(_.getString(2)).toSeq == Seq("“curly” — dash"))
    rows.length // suppress unused warning
  }

  test("charset loudness: unknown charsets, undecodable bodies, unencodable docs all reject") {
    import spark.implicits._
    // write-side: unknown charset name
    val e1 = intercept[IllegalArgumentException] {
      WarcCorpusSource.writeResponses(
        Seq(("a.html", "x", 200)).toDF("name", "text", "status"),
        tmp(), shards = 1, charset = "koi8-r")
    }
    assert(errText(e1).contains("unsupported charset"), errText(e1))
    // write-side: a doc outside the declared charset must reject, not '?'
    val e2 = intercept[Exception] {
      WarcCorpusSource.writeResponses(
        Seq(("a.html", "日本語", 200)).toDF("name", "text", "status"),
        tmp(), shards = 1, charset = "iso-8859-1")
    }
    assert(errText(e2).contains("does not encode as"), errText(e2))
    // read-side: a body whose bytes disagree with the DECLARED charset
    // fails the strict decode (hand-framed: latin-1 bytes, utf-8 claim)
    val dir = tmp()
    val body = "café".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++ body
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: x.html\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
      http ++ "\r\n\r\n".getBytes("US-ASCII")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(
        java.nio.file.Paths.get(dir, "part-00000.warc.gz")))
    out.write(rec); out.close()
    val e3 = intercept[Exception] {
      WarcCorpusSource.readResponses(spark, dir).collect()
    }
    assert(errText(e3).contains("does not decode as"), errText(e3))
    // read-side: a declared charset outside the pinned table is loud
    val dir2 = tmp()
    val body2 = "ok".getBytes("US-ASCII")
    val http2 = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=shift_jis\r\n" +
      s"Content-Length: ${body2.length}\r\n\r\n").getBytes("US-ASCII") ++ body2
    val rec2 = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: y.html\r\n" +
      s"Content-Length: ${http2.length}\r\n\r\n").getBytes("US-ASCII") ++
      http2 ++ "\r\n\r\n".getBytes("US-ASCII")
    val out2 = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(
        java.nio.file.Paths.get(dir2, "part-00000.warc.gz")))
    out2.write(rec2); out2.close()
    val e4 = intercept[Exception] {
      WarcCorpusSource.readResponses(spark, dir2).collect()
    }
    assert(errText(e4).contains("unsupported charset"), errText(e4))
  }

  test("a lying inner HTTP Content-Length fails loudly (inner truncation class)") {
    val dir = tmp()
    val f = java.nio.file.Paths.get(dir, "part-00000.warc.gz")
    val http = "HTTP/1.1 200 OK\r\nContent-Length: 999\r\n\r\nshort body"
    val rec = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: a.html\r\n" +
      s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n$http\r\n\r\n"
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    out.write(rec.getBytes("UTF-8"))
    out.close()
    val e = intercept[Exception] {
      WarcCorpusSource.readResponses(spark, dir).collect()
    }
    assert(errText(e).contains("disagrees"), s"expected the inner-length error: $e")
  }

  test("a response payload with no head/body separator fails loudly") {
    val dir = tmp()
    val f = java.nio.file.Paths.get(dir, "part-00000.warc.gz")
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html" // no CRLF CRLF
    val rec = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: a.html\r\n" +
      s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n$http\r\n\r\n"
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    out.write(rec.getBytes("UTF-8"))
    out.close()
    val e = intercept[Exception] {
      WarcCorpusSource.readResponses(spark, dir).collect()
    }
    assert(errText(e).contains("separator"), s"expected the separator error: $e")
  }

  test("record-type mismatches fail loudly in BOTH directions") {
    import spark.implicits._
    val wet = tmp()
    WarcCorpusSource.write(Seq(("a.txt", "text")).toDF("name", "text"), wet, 1)
    val e1 = intercept[Exception] {
      WarcCorpusSource.readResponses(spark, wet).collect()
    }
    assert(errText(e1).contains("WARC-Type"), s"expected the type error: $e1")
    val raw = tmp()
    WarcCorpusSource.writeResponses(
      Seq(("a.html", "body", 200)).toDF("name", "text", "status"), raw, 1)
    val e2 = intercept[Exception] {
      WarcCorpusSource.read(spark, raw).collect()
    }
    assert(errText(e2).contains("readResponses"), s"expected the type error: $e2")
  }

  test("mixed capture bundles: skipNonResponse reads exactly the responses; strict mode stays loud") {
    import spark.implicits._
    val rows = Seq(
      ("ok.html", "<html>fine</html>", 200),
      // hostile BODY in the response record too — both framing layers
      // under test at once
      ("hostile.html", "HTTP/1.1 500 Fake\r\nX: y\r\n\r\nWARC/1.0 not a record", 200),
      ("gone.html", "", 404))
    val dir = tmp()
    WarcCorpusSource.writeCaptures(rows.toDF("name", "text", "status"), dir, 2)
    val got = WarcCorpusSource.readResponses(spark, dir, skipNonResponse = true)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got == rows.map { case (n, t, s) => (n, s, t) }.toSet,
      s"mixed-bundle read drifted: $got")
    // strict mode keeps the pre-filtered contract loud
    val e = intercept[Exception] {
      WarcCorpusSource.readResponses(spark, dir).collect()
    }
    assert(errText(e).contains("WARC-Type"), s"expected the type error: $e")
  }

  test("a hostile metadata payload between responses is skipped framing-only") {
    val dir = tmp()
    val f = java.nio.file.Paths.get(dir, "part-00000.warc.gz")
    def rec(typ: String, uri: String, payload: String) =
      s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n$payload\r\n\r\n"
    val httpA = "HTTP/1.1 200 OK\r\n\r\nbody A"
    val httpB = "HTTP/1.1 404 Not Found\r\n\r\n"
    // the metadata payload is a COMPLETE fake WARC record: a reader
    // that scanned payloads for boundaries would parse the fake record
    // (or desync on its fake Content-Length) instead of record B
    val hostileMeta =
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: fake.html\r\n" +
        "Content-Length: 999999\r\n\r\n"
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    out.write((rec("response", "a.html", httpA) +
      rec("metadata", "a.html", hostileMeta) +
      rec("request", "b.html", "GET /b.html HTTP/1.1\r\n\r\n") +
      rec("response", "b.html", httpB)).getBytes("UTF-8"))
    out.close()
    val got = WarcCorpusSource.readResponses(spark, dir, skipNonResponse = true)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set(("a.html", 200, "body A"), ("b.html", 404, "")),
      s"hostile metadata desynced the framing-only skip: $got")
  }

  test("statuses outside 100-599 are rejected at write time") {
    import spark.implicits._
    val e = intercept[Exception] {
      WarcCorpusSource.writeResponses(
        Seq(("a.html", "body", 1200)).toDF("name", "text", "status"), tmp(), 1)
    }
    assert(errText(e).contains("100-599"), s"expected the status-range error: $e")
  }

  test("response shards are byte-deterministic") {
    import spark.implicits._
    val rows = (0 until 12).map(i => (s"d$i.html", s"body $i", if (i % 3 == 0) 404 else 200))
    val df = rows.toDF("name", "text", "status").repartition(1).orderBy("name")
    val (d1, d2) = (tmp(), tmp())
    WarcCorpusSource.writeResponses(df, d1, shards = 1)
    WarcCorpusSource.writeResponses(df, d2, shards = 1)
    def partBytes(d: String) = java.nio.file.Files.readAllBytes(
      new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).head.toPath)
    assert(java.util.Arrays.equals(partBytes(d1), partBytes(d2)),
      "the same corpus must produce byte-identical response shards")
  }

  test("shards are byte-deterministic (fixed date, name-derived ids, gzip mtime 0)") {
    import spark.implicits._
    val rows = (0 until 20).map(i => (s"d$i.txt", s"text $i"))
    val df = rows.toDF("name", "text").repartition(1).orderBy("name")
    val (d1, d2) = (tmp(), tmp())
    WarcCorpusSource.write(df, d1, shards = 1)
    WarcCorpusSource.write(df, d2, shards = 1)
    def partBytes(d: String) = java.nio.file.Files.readAllBytes(
      new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).head.toPath)
    assert(java.util.Arrays.equals(partBytes(d1), partBytes(d2)),
      "the same corpus must produce byte-identical shards")
  }
}
