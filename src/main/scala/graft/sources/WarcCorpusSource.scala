package graft.sources

import java.io.{BufferedInputStream, DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC corpus reader/writer (ISO 28500 / the WARC 1.0 record
  * grammar — the Common-Crawl interchange format, the FIRST thing a
  * 100 TB pretraining user reads; extension — the reference has no
  * corpus-format surface). Two record grammars are covered, matching
  * the two shapes Common Crawl actually ships:
  *
  *  - WET-style extracted text (`WARC-Type: conversion`, plain-text
  *    payload) via [[write]]/[[read]];
  *  - raw crawl captures (`WARC-Type: response`, payload =
  *    `application/http; msgtype=response`: an HTTP status line +
  *    header block + body, all inside the record's declared
  *    `Content-Length`) via [[writeResponses]]/[[readResponses]] —
  *    including the MIXED bundles real crawls ship, where `request`
  *    and `metadata` records interleave with the responses
  *    ([[writeCaptures]]; `readResponses(skipNonResponse = true)`
  *    skips them framing-only).
  *
  * Both use the production framing — version line, CRLF header block
  * with a declared `Content-Length`, payload, double-CRLF terminator —
  * and the production COMPRESSION layout, one gzip MEMBER per record
  * concatenated into the shard, which is what lets tooling skip
  * records without inflating payloads.
  *
  * Spark rendering (the [[TarCorpusSource]] contract): the SHARD is
  * the parallel unit — the writer emits one `.warc.gz` part per task
  * (broadcast driver Hadoop conf, temp-then-rename commit) and the
  * reader fans one task per shard, streaming records INCREMENTALLY
  * (one payload in task memory at a time, loud [[MaxPayloadBytes]]
  * bound). A 100 TB WARC corpus is tens of thousands of shards,
  * never one archive. Malformed input fails loudly at the exact
  * offset class that broke: a wrong version line, a missing or
  * non-numeric `Content-Length`, a missing record terminator,
  * truncation mid-payload, a record of the WRONG type for the reader,
  * or (responses) a payload with no HTTP head/body separator or a
  * lying HTTP `Content-Length` each raise a named contract error —
  * never a silently short or mangled document. Archives are
  * byte-deterministic (fixed `WARC-Date`, name-derived record ids,
  * gzip MTIME 0), so shard-level caching/dedup can key on content
  * hashes.
  *
  * Record boundaries are length-framed on read (the payload is NEVER
  * scanned for record boundaries), so hostile payloads containing
  * literal `WARC/1.0` blocks round-trip exactly. The HTTP head/body
  * split inside a response payload is likewise framing, not scanning:
  * RFC 9112 ends the header section at the FIRST blank line, so a
  * body containing `\r\n\r\n` (or a fake status line) is untouched —
  * the split happens inside bytes already bounded by the record's
  * declared length.
  */
object WarcCorpusSource {

  /** Single-record payload bound for the readers — the
    * [[TarCorpusSource.MaxMemberBytes]] posture: a record is a
    * DOCUMENT; anything near the 2 GiB String ceiling is a data bug
    * refused loudly instead of an opaque OOM. */
  val MaxPayloadBytes: Long = 1L << 30

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)
  private val FixedDate = "2024-01-01T00:00:00Z"
  private val MaxHeaderLine = 16384

  private val ConversionType = "conversion"
  private val ResponseType = "response"
  private val RequestType = "request"
  private val MetadataType = "metadata"

  /** One WARC record's uncompressed bytes — shared by both grammars
    * (the payload is opaque here; responses pass their full HTTP
    * message as the payload). */
  private def record(name: String, warcType: String, contentType: String,
      payload: Array[Byte]): Array[Byte] = {
    val head =
      s"""WARC/1.0\r
         |WARC-Type: $warcType\r
         |WARC-Record-ID: <urn:graft:$name>\r
         |WARC-Target-URI: $name\r
         |WARC-Date: $FixedDate\r
         |Content-Type: $contentType\r
         |Content-Length: ${payload.length}\r
         |\r
         |""".stripMargin.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    System.arraycopy(Crlf, 0, out, head.length + payload.length, 2)
    System.arraycopy(Crlf, 0, out, head.length + payload.length + 2, 2)
    out
  }

  /** NULL / header-forgery guard shared by both writers. */
  private def validName(nameCol: String, textCol: String): Column =
    when(col(nameCol).isNull || col(textCol).isNull,
      raise_error(lit("WARC cannot represent NULL names/contents — " +
        "filter or encode before WarcCorpusSource.write")))
      .when(col(nameCol).rlike("[\\x00-\\x1f]"),
        raise_error(concat(lit("WARC record names must not carry control "),
          lit("characters (header-forgery guard): "), col(nameCol))))
      .otherwise(col(nameCol).cast("string"))

  /** Write pre-built `(name, warcType, contentType, recordPayload)`
    * rows as `shards` gzip-member-per-record `.warc.gz` part files
    * under `dir` (overwrites) — the shard machinery every writer
    * shares; per-row record types are what let [[writeCaptures]]
    * interleave request/response/metadata records in one bundle. */
  private def writeShards(spark: SparkSession, prepared: DataFrame,
      dir: String, shards: Int): Unit = {
    import spark.implicits._
    val sc = spark.sparkContext
    val fs = FileSystem.get(new java.net.URI(dir), sc.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    fs.mkdirs(new Path(dir))
    val bcConf = sc.broadcast(new SerializableHadoopConf(sc.hadoopConfiguration))
    prepared
      .as[(String, String, String, Array[Byte])]
      // compress EVERY record to its sealed gzip member on the full
      // core count BEFORE the shard shuffle: members are independent
      // by layout, so the deflate CPU (the dominant write cost —
      // 1.32 s of q_crawl_corpus's 4.6 s at sf0.1 when it ran inside
      // the `shards`-way writer tasks) parallelizes corpus-wide, the
      // writers just concatenate bytes, and the shard exchange now
      // carries compressed payloads (~3x fewer bytes). Per-member
      // bytes are identical to the old in-writer compression (same
      // deflate level, same zeroed-MTIME header), so shard content
      // fingerprints are as deterministic as before
      .repartition(graft.Spread.count(prepared))
      .map { case (name, warcType, contentType, payload) =>
        val buf = new java.io.ByteArrayOutputStream(payload.length / 2 + 256)
        val member = new GZIPOutputStream(buf)
        member.write(record(name, warcType, contentType, payload))
        // close(), not just finish(): releases the native Deflater
        // eagerly (the byte-array sink makes the close free)
        member.close()
        buf.toByteArray
      }
      .repartition(shards)
      .rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val pfs = FileSystem.get(new java.net.URI(dir), bcConf.value.conf)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new Path(dir, f"part-$pid%05d.warc.gz.$attempt%d.tmp")
        val fin = new Path(dir, f"part-$pid%05d.warc.gz")
        val out = new DataOutputStream(pfs.create(tmp, true))
        var n = 0L
        it.foreach { member =>
          out.write(member)
          n += 1
        }
        out.close()
        if (!pfs.rename(tmp, fin)) {
          pfs.delete(tmp, false)
          require(pfs.exists(fin), s"WARC shard commit failed: $fin")
        }
        Iterator.single(n)
      }
      .count() // force the write
  }

  /** Write `(nameCol, textCol)` rows as `shards` gzip-member-per-record
    * WET-style `.warc.gz` part files under `dir` (overwrites). NULLs
    * are unrepresentable and rejected loudly (the tar convention), as
    * are names carrying control characters — a CR/LF in a name would
    * forge header lines. */
  def write(df: DataFrame, dir: String, shards: Int,
      nameCol: String = "name", textCol: String = "text"): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val prepared = df.select(
      validName(nameCol, textCol).as("n"),
      lit(ConversionType).as("t"), lit("text/plain").as("c"),
      encode(col(textCol).cast("string"), "UTF-8").as("p"))
    writeShards(df.sparkSession, prepared, dir, shards)
  }

  /** The deterministic reason phrase for a status line — the common
    * registry entries, a fixed fallback elsewhere (reason phrases are
    * advisory per RFC 9112 §4; parsers must key on the code). */
  private def reasonFor(code: Int): String = code match {
    case 200 => "OK"
    case 301 => "Moved Permanently"
    case 304 => "Not Modified"
    case 403 => "Forbidden"
    case 404 => "Not Found"
    case 500 => "Internal Server Error"
    case 503 => "Service Unavailable"
    case _ => "Status"
  }

  /** Write `(nameCol, textCol, statusCol)` rows as raw-crawl
    * `WARC-Type: response` records: each record's payload is a full
    * HTTP message — `HTTP/1.1 <status> <reason>`, a `Content-Type` +
    * `Content-Length` header block, CRLF CRLF, then the body — inside
    * the record's own declared length (the Common-Crawl raw-WARC
    * layout). Statuses outside 100-599 are rejected loudly (a forged
    * status line is a header-forgery class, like CR/LF in names). */
  /** The PINNED charset table — the encodings a crawl pipeline
    * actually meets and this source round-trips. Anything else fails
    * LOUDLY on both sides: an unknown (or absent-but-non-UTF-8)
    * charset silently decoded as UTF-8 is the mojibake class that
    * poisons a training corpus invisibly. Canonical-name aliases
    * included; lookup is case-insensitive. */
  private val Charsets: Map[String, java.nio.charset.Charset] = Map(
    "utf-8" -> StandardCharsets.UTF_8,
    "utf8" -> StandardCharsets.UTF_8,
    "us-ascii" -> StandardCharsets.US_ASCII,
    "ascii" -> StandardCharsets.US_ASCII,
    "iso-8859-1" -> StandardCharsets.ISO_8859_1,
    "latin-1" -> StandardCharsets.ISO_8859_1,
    "latin1" -> StandardCharsets.ISO_8859_1,
    "windows-1252" -> java.nio.charset.Charset.forName("windows-1252"),
    "cp1252" -> java.nio.charset.Charset.forName("windows-1252"))

  /** Compiled once per JVM — a per-record compile is a measurable tax
    * on million-record shards. */
  private val CharsetRe = java.util.regex.Pattern
    .compile("(?i)charset\\s*=\\s*\"?([^\";\\s]+)\"?")

  private def charsetFor(name: String, fail: String => Nothing)
      : java.nio.charset.Charset =
    Charsets.getOrElse(name.toLowerCase,
      fail(s"unsupported charset '$name' (supported: " +
        s"${Charsets.keys.toSeq.sorted.mkString(", ")}) — transcode the " +
        "corpus or extend the pinned table; silently mis-decoding is " +
        "the one wrong answer"))

  /** STRICT decode — malformed or unmappable bytes fail loudly
    * instead of silently becoming U+FFFD (a replacement char in a
    * training document is corruption the pipeline would never see). */
  private def decodeStrict(payload: Array[Byte], off: Int, len: Int,
      cs: java.nio.charset.Charset, fail: String => Nothing): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(payload, off, len)).toString
    catch {
      case e: java.nio.charset.CharacterCodingException =>
        fail(s"body does not decode as ${cs.name()} ($e) — the declared " +
          "charset and the bytes disagree")
    }
  }

  /** STRICT encode — a document carrying chars outside the declared
    * charset must reject, not silently become '?'. */
  private def encodeStrict(text: String, cs: java.nio.charset.Charset): Array[Byte] = {
    val enc = cs.newEncoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val bb = enc.encode(java.nio.CharBuffer.wrap(text))
      val out = new Array[Byte](bb.remaining())
      bb.get(out)
      out
    } catch {
      case e: java.nio.charset.CharacterCodingException =>
        throw new IllegalArgumentException(
          s"document does not encode as ${cs.name()} ($e) — write with a " +
            "charset that covers the corpus (utf-8 always does)")
    }
  }

  /** The HTTP response message for one `(name, text, status)` row —
    * shared by [[writeResponses]] and [[writeCaptures]]. The body
    * encodes in `cs` and the Content-Type header declares it (the
    * contract [[readResponses]] decodes by). */
  private def httpResponsePayload(text: String, status: Int,
      cs: java.nio.charset.Charset): Array[Byte] = {
    val body = encodeStrict(text, cs)
    val head = (s"HTTP/1.1 $status ${reasonFor(status)}\r\n" +
      s"Content-Type: text/html; charset=${cs.name().toLowerCase}\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII)
    val payload = new Array[Byte](head.length + body.length)
    System.arraycopy(head, 0, payload, 0, head.length)
    System.arraycopy(body, 0, payload, head.length, body.length)
    payload
  }

  /** The validated `(name, text, status)` projection both raw-crawl
    * writers share. */
  private def responseRows(df: DataFrame, nameCol: String, textCol: String,
      statusCol: String): DataFrame =
    df.select(
      validName(nameCol, textCol).as("n"),
      col(textCol).cast("string").as("t"),
      when(col(statusCol).isNull || col(statusCol) < 100 || col(statusCol) > 599,
        raise_error(concat(lit("HTTP status must be 100-599, got "),
          col(statusCol).cast("string"))))
        .otherwise(col(statusCol).cast("int")).as("s"))

  def writeResponses(df: DataFrame, dir: String, shards: Int,
      nameCol: String = "name", textCol: String = "text",
      statusCol: String = "status", charset: String = "utf-8"): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    // resolve once for the loud unknown-name check, but ship only the
    // canonical NAME into the task closure (Charset is not Serializable)
    val csName = charsetFor(charset,
      m => throw new IllegalArgumentException(s"writeResponses: $m")).name()
    val spark = df.sparkSession
    import spark.implicits._
    val rows = responseRows(df, nameCol, textCol, statusCol)
      .as[(String, String, Int)]
      .map { case (name, text, status) =>
        (name, ResponseType, "application/http; msgtype=response",
          httpResponsePayload(text, status,
            java.nio.charset.Charset.forName(csName)))
      }
      .toDF("n", "t", "c", "p")
    writeShards(spark, rows, dir, shards)
  }

  /** Write `(nameCol, textCol, statusCol)` rows as FULL crawl captures
    * — the record-type mix a real Common-Crawl raw `.warc.gz` bundle
    * interleaves: per document a `request` record (the outbound HTTP
    * message), the `response` record (identical bytes to
    * [[writeResponses]]'s), and a `metadata` record
    * (`application/warc-fields`). The metadata payload DELIBERATELY
    * contains a fake `WARC/1.0` version line and a fake
    * `Content-Length` field: a reader that scanned payloads for record
    * boundaries (instead of trusting the declared length framing)
    * would desync here — [[readResponses]] with
    * `skipNonResponse = true` must skip these records framing-only. */
  def writeCaptures(df: DataFrame, dir: String, shards: Int,
      nameCol: String = "name", textCol: String = "text",
      statusCol: String = "status"): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = responseRows(df, nameCol, textCol, statusCol)
      .as[(String, String, Int)]
      .flatMap { case (name, text, status) =>
        val request = (s"GET /$name HTTP/1.1\r\n" +
          "Host: example.invalid\r\nUser-Agent: graft\r\n\r\n")
          .getBytes(StandardCharsets.US_ASCII)
        // hostile on purpose: payload bytes that LOOK like a record
        // boundary and a record header — framing-only readers are
        // untouched, scanning readers desync loudly in the spec
        val metadata = (s"fetchTimeMs: ${text.length}\r\n" +
          "note: WARC/1.0\r\n" +
          "note2: Content-Length: 999999\r\n\r\n")
          .getBytes(StandardCharsets.UTF_8)
        Seq(
          (name, RequestType, "application/http; msgtype=request", request),
          (name, ResponseType, "application/http; msgtype=response",
            httpResponsePayload(text, status, StandardCharsets.UTF_8)),
          (name, MetadataType, "application/warc-fields", metadata))
      }
      .toDF("n", "t", "c", "p")
    writeShards(spark, rows, dir, shards)
  }

  /** The shared record-grammar parser: stream one shard's records as
    * `(uri, warcType, payload)` — incremental (one payload in memory),
    * length-framed, loud on every malformation class. A record with
    * no `WARC-Type` header parses with an empty type (legacy shards;
    * the readers treat it as their own type rather than rejecting,
    * matching the pre-response reader's behavior).
    *
    * `skipType`: record types to SKIP framing-only — the header block
    * still parses (it is how the skip decision is made) and the
    * terminator is still verified (framing integrity), but the payload
    * bytes are SKIPPED, never materialized or scanned, so a hostile
    * payload in a skipped record (a fake `WARC/1.0` line, a fake
    * Content-Length) cannot desync the stream and costs no memory. */
  private def recordIterator(path: String, in: DataInputStream,
      skipType: String => Boolean = _ => false)
      : Iterator[(String, String, Array[Byte])] = {

    def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"$path: $what")

    // CRLF-terminated ASCII header line; -1 on clean EOF at a
    // record boundary (null sentinel), loud anywhere else
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
        if (buf.size > MaxHeaderLine) fail(s"header line past $MaxHeaderLine bytes")
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
        while (!done && queued == null) {
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
          if (contentLength > MaxPayloadBytes)
            fail(s"record '$uri' declares $contentLength bytes — past the " +
              s"$MaxPayloadBytes single-record bound (records are documents; " +
              "shard the corpus, don't archive blobs)")
          val skipped = skipType(warcType)
          var payload: Array[Byte] = null
          if (skipped) {
            // framing-only skip: advance past the declared length
            // without materializing (or ever scanning) the payload
            try in.skipNBytes(contentLength)
            catch { case _: EOFException =>
              fail(s"truncated record '$uri' (declared $contentLength bytes past EOF)") }
          } else {
            payload = new Array[Byte](contentLength.toInt)
            try in.readFully(payload)
            catch { case _: EOFException =>
              fail(s"truncated record '$uri' (declared $contentLength bytes past EOF)") }
          }
          val term = new Array[Byte](4)
          try in.readFully(term)
          catch { case _: EOFException =>
            fail(s"record '$uri' missing its CRLF CRLF terminator (EOF)") }
          if (!(term(0) == '\r' && term(1) == '\n' && term(2) == '\r' && term(3) == '\n'))
            fail(s"record '$uri' not followed by CRLF CRLF — Content-Length " +
              "and payload disagree")
          if (!skipped) queued = (uri, warcType, payload)
        }
      }

      override def hasNext: Boolean = { advance(); queued != null }
      override def next(): (String, String, Array[Byte]) = {
        advance()
        if (queued == null) throw new NoSuchElementException("WARC iterator drained")
        val r = queued; queued = null; r
      }
    }
  }

  /** One task per shard over the multi-member gzip stream (which
    * GZIPInputStream reads transparently — the record parser sees one
    * continuous WARC stream), records streamed incrementally. */
  private def shardRecords(spark: SparkSession, dir: String,
      skipType: String => Boolean = _ => false)
      : org.apache.spark.rdd.RDD[(String, String, String, Array[Byte])] =
    spark.sparkContext.binaryFiles(s"$dir/*.warc.gz")
      .flatMap { case (path, stream) =>
        val in = new DataInputStream(new BufferedInputStream(
          new GZIPInputStream(new BufferedInputStream(stream.open()))))
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case scala.util.control.NonFatal(_) => () }))
        recordIterator(path.toString, in, skipType)
          .map { case (uri, typ, payload) => (path.toString, uri, typ, payload) }
      }

  /** Open a directory of WET-style `.warc.gz` shards as
    * `(record_uri, text)` — payloads decoded as UTF-8. A `response`
    * record in the stream is a contract error (its payload is an HTTP
    * message, not text — decoding it here would silently prepend HTTP
    * headers to the document): [[readResponses]] is the reader for
    * raw-crawl shards. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    shardRecords(spark, dir)
      .map { case (path, uri, typ, payload) =>
        def fail(what: String): Nothing =
          throw new IllegalArgumentException(s"$path: record '$uri' $what")
        if (typ.nonEmpty && typ != ConversionType)
          fail(s"is WARC-Type: $typ — WarcCorpusSource.read reads conversion " +
            "(WET) records; use readResponses for raw-crawl response shards")
        // WET conversion payloads are UTF-8 by contract; STRICT decode
        // (malformed bytes fail loudly, never U+FFFD into the corpus)
        (uri, decodeStrict(payload, 0, payload.length, StandardCharsets.UTF_8, fail))
      }
      .toDF("record_uri", "text")
  }

  /** Open a directory of raw-crawl `.warc.gz` shards (`WARC-Type:
    * response` records) as `(record_uri, status, text)`: each payload
    * is split into its HTTP head and body per RFC 9112 framing — the
    * header section ends at the FIRST blank line, inside bytes already
    * bounded by the record's declared Content-Length, so a hostile
    * body containing `\r\n\r\n`, a fake status line, or a fake WARC
    * record is untouched. The status code parses from the status
    * line; a declared HTTP `Content-Length` must equal the actual
    * body length (a lying inner length is the truncation class the
    * outer framing can't see). Body decodes as UTF-8.
    *
    * `skipNonResponse = true` reads the MIXED bundles real crawls ship
    * ([[writeCaptures]]' layout): interleaved `request` and `metadata`
    * records are skipped FRAMING-ONLY — their headers parse (that is
    * the skip decision), their payloads are length-skipped without
    * ever being materialized or scanned, so a hostile metadata payload
    * (fake `WARC/1.0` line, fake Content-Length) cannot desync the
    * stream. Any OTHER foreign type (a WET `conversion` record in a
    * raw-crawl bundle) still fails loudly — that is a mixed-up corpus,
    * not a normal capture bundle. Default `false` keeps the strict
    * pre-filtered contract. */
  def readResponses(spark: SparkSession, dir: String,
      skipNonResponse: Boolean = false): DataFrame = {
    import spark.implicits._
    val skip: String => Boolean =
      if (skipNonResponse) t => t == RequestType || t == MetadataType
      else _ => false
    shardRecords(spark, dir, skip)
      .map { case (path, uri, typ, payload) =>
        def fail(what: String): Nothing =
          throw new IllegalArgumentException(s"$path: record '$uri' $what")
        if (typ.nonEmpty && typ != ResponseType)
          fail(s"is WARC-Type: $typ — readResponses reads response records " +
            "(skipNonResponse = true additionally skips request/metadata " +
            "capture records); use read for conversion (WET) shards")
        // head/body separator: first CRLF CRLF in the length-framed payload
        var sep = -1
        var i = 0
        while (sep < 0 && i + 3 < payload.length) {
          if (payload(i) == '\r' && payload(i + 1) == '\n' &&
              payload(i + 2) == '\r' && payload(i + 3) == '\n') sep = i
          i += 1
        }
        if (sep < 0) fail("has no HTTP head/body separator (CRLF CRLF)")
        // HTTP headers are ISO-8859-1 per RFC 9112 §5.1
        val head = new String(payload, 0, sep, StandardCharsets.ISO_8859_1)
        val lines = head.split("\r\n", -1)
        val statusLine = lines(0)
        if (!statusLine.startsWith("HTTP/"))
          fail(s"payload does not start with an HTTP status line: '$statusLine'")
        val parts = statusLine.split(" ", 3)
        if (parts.length < 2) fail(s"malformed HTTP status line: '$statusLine'")
        val status =
          try Integer.parseInt(parts(1))
          catch { case _: NumberFormatException =>
            fail(s"non-numeric HTTP status '${parts(1)}'") }
        if (status < 100 || status > 599) fail(s"HTTP status $status out of range")
        val bodyLen = payload.length - (sep + 4)
        var contentType: String = null
        lines.iterator.drop(1).foreach { h =>
          val ci = h.indexOf(':')
          if (ci <= 0) fail(s"malformed HTTP header '$h'")
          val key = h.substring(0, ci).trim
          if (key.equalsIgnoreCase("Content-Length")) {
            val declared =
              try java.lang.Long.parseLong(h.substring(ci + 1).trim)
              catch { case _: NumberFormatException =>
                fail(s"non-numeric HTTP Content-Length '${h.substring(ci + 1).trim}'") }
            if (declared != bodyLen)
              fail(s"HTTP Content-Length $declared disagrees with the " +
                s"actual $bodyLen-byte body (inner truncation/padding)")
          } else if (key.equalsIgnoreCase("Content-Type")) {
            contentType = h.substring(ci + 1).trim
          }
        }
        // charset: the Content-Type's declared one through the pinned
        // table (absent → utf-8); decode is STRICT — a body whose
        // bytes disagree with the declared charset fails loudly
        // instead of shipping replacement chars into the corpus
        val csName = Option(contentType)
          .map { ct =>
            val m = CharsetRe.matcher(ct)
            if (m.find()) m.group(1) else "utf-8"
          }
          .getOrElse("utf-8")
        val cs = charsetFor(csName, fail)
        (uri, status, decodeStrict(payload, sep + 4, bodyLen, cs, fail))
      }
      .toDF("record_uri", "status", "text")
  }
}
