package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: opaque binary payloads + typed metadata,
  * processed in partition-batched typed pipelines (extension — the
  * reference embeds text externally via `semantic_search.py:20-25` and
  * never touches binary media).
  *
  * Design for 100 TB of media: the binary column stays opaque to
  * Catalyst (no per-byte expressions); decode/feature-extraction runs
  * inside `mapPartitions` so one task amortizes codec setup over a
  * whole batch — the JVM equivalent of a `mapInPandas` batch UDF.
  *
  * The image path is a REAL binary-format decode: media rows carry P6
  * PPM bytes (binary magic + ASCII header + raw RGB pixel plane) and
  * [[decodePpm]] parses the header and computes per-channel pixel
  * statistics — the same parse-validate-extract shape a JPEG decoder
  * stage has, feasible inside this sandbox (no image libs) because PPM
  * is self-describing. Codec-less modalities fall back to
  * [[byteHistogram]], a clearly-labeled stand-in.
  */
object Multimodal {

  /** Canonical media-row schema. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("n_bytes", LongType))))))

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      features: Array[Double])

  val PpmModality = "image/x-portable-pixmap"

  /** Fixture images are 4×4 RGB (48 pixel bytes). */
  val PpmW = 4
  val PpmH = 4
  private val PpmHeader = s"P6\n$PpmW $PpmH\n255\n"

  /** Parse + validate a P6 header: magic, whitespace-separated
    * width/height/maxval, the single header-terminating whitespace
    * byte, and the pixel-plane length. Returns (width, height,
    * plane offset). Malformed input throws — a decoder that silently
    * swallows corrupt media poisons the corpus downstream. */
  private def parsePpmHeader(content: Array[Byte]): (Int, Int, Int) = {
    var pos = 0
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def token(): String = {
      while (pos < content.length && isWs(content(pos))) pos += 1
      val st = pos
      while (pos < content.length && !isWs(content(pos))) pos += 1
      new String(content, st, pos - st, "US-ASCII")
    }
    val magic = token()
    require(magic == "P6", s"not a binary PPM: magic '$magic'")
    val w = token().toInt
    val h = token().toInt
    val maxv = token().toInt
    require(w > 0 && h > 0, s"non-positive dimensions ${w}x$h")
    require(maxv == 255, s"unsupported maxval $maxv")
    // exactly ONE whitespace byte separates header from pixels; check it
    // IS whitespace rather than skipping blind (a '#' here would mean a
    // comment — this decoder accepts the comment-free P6 subset only,
    // and must reject, not misparse, anything else)
    require(pos < content.length && isWs(content(pos)),
      "header must end in a single whitespace byte (P6 comments unsupported)")
    pos += 1
    // long arithmetic: a hostile header like 65536x65536 overflows the
    // Int plane size to 0 and would validate against an empty payload
    require((content.length - pos).toLong == w.toLong * h * 3L,
      s"pixel plane is ${content.length - pos} bytes, want ${w.toLong * h * 3L}")
    (w, h, pos)
  }

  /** Decode a binary P6 PPM: parse + validate the header and emit
    * `[width, height, meanR, meanG, meanB]` (channel means over the
    * raw pixel bytes). */
  def decodePpm(content: Array[Byte]): Array[Double] = {
    val (w, h, pos) = parsePpmHeader(content)
    var r = 0L; var g = 0L; var b = 0L
    var i = pos
    while (i < content.length) {
      r += content(i) & 0xff
      g += content(i + 1) & 0xff
      b += content(i + 2) & 0xff
      i += 3
    }
    val n = (w * h).toDouble
    Array(w.toDouble, h.toDouble, r / n, g / n, b / n)
  }

  /** Channel-aware chunk features for a known P6 payload: per-channel
    * means over the pixel bytes the chunk `[start, start+len)` covers
    * (header bytes contribute nothing; a channel absent from the chunk
    * reports 0.0). The channel of a pixel byte derives from its offset
    * in the pixel plane — this is what lets a "frame" of a decodable
    * format report real pixel statistics where an opaque modality can
    * only report a byte histogram. */
  def ppmChunkFeatures(content: Array[Byte], start: Int, len: Int): Array[Double] = {
    val (_, _, off) = parsePpmHeader(content)
    val sums = new Array[Long](3)
    val counts = new Array[Long](3)
    var g = math.max(start, off)
    val end = math.min(start + len, content.length)
    while (g < end) {
      val ch = (g - off) % 3
      sums(ch) += content(g) & 0xff
      counts(ch) += 1
      g += 1
    }
    Array.tabulate(3)(c => if (counts(c) == 0) 0.0 else sums(c).toDouble / counts(c))
  }

  val WavModality = "audio/x-wav"

  /** Fixture audio: mono 16-bit PCM at 8 kHz, 48 samples. */
  val WavRate = 8000
  val WavSamples = 48

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Canonical RIFF/WAVE header for the fixture shape: RIFF size,
    * "fmt " chunk (PCM, mono, 8 kHz, 16-bit), "data" chunk size. */
  private val WavHeader: Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le32(36 + WavSamples * 2) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(WavRate) ++ le32(WavRate * 2) ++
      le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(WavSamples * 2)

  /** Little-endian unsigned read of `n` bytes at `off`. */
  private def leInt(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Decode a RIFF/WAVE payload — the second REAL binary-format decode
    * (same parse-validate-extract rigor as [[decodePpm]]): validate the
    * RIFF magic and declared size, WALK the chunk list (RIFF chunks pad
    * to even length; unknown chunks skip), require a PCM 16-bit "fmt "
    * chunk and a frame-aligned "data" chunk, then emit
    * `[sampleRate, channels, framesPerChannel, meanCh0, …]` (per-channel
    * means over the signed little-endian int16 samples). Malformed
    * input throws — a decoder that silently swallows corrupt media
    * poisons the corpus downstream. */
  def decodeWav(content: Array[Byte]): Array[Double] = {
    require(content.length >= 44, s"truncated RIFF header (${content.length} bytes)")
    require(new String(content, 0, 4, "US-ASCII") == "RIFF", "not a RIFF payload")
    require(new String(content, 8, 4, "US-ASCII") == "WAVE", "not a WAVE form")
    require(leInt(content, 4, 4) == content.length - 8L,
      s"RIFF size ${leInt(content, 4, 4)} != payload ${content.length - 8}")
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= content.length) {
      val id = new String(content, pos, 4, "US-ASCII")
      val sz = leInt(content, pos + 4, 4)
      require(pos + 8 + sz <= content.length, s"chunk '$id' overruns the payload")
      if (id == "fmt ") {
        require(sz >= 16, s"fmt chunk too short ($sz bytes)")
        fmt = Some((leInt(content, pos + 8, 2).toInt, leInt(content, pos + 10, 2).toInt,
          leInt(content, pos + 12, 4).toInt, leInt(content, pos + 22, 2).toInt))
      } else if (id == "data") data = Some((pos + 8, sz.toInt))
      pos += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even length
    }
    val (audioFormat, channels, rate, bits) =
      fmt.getOrElse(throw new IllegalArgumentException("no fmt chunk"))
    require(audioFormat == 1, s"unsupported audio format $audioFormat (PCM only)")
    require(channels >= 1, s"non-positive channel count $channels")
    require(bits == 16, s"unsupported bit depth $bits (PCM16 only)")
    val (off, len) = data.getOrElse(throw new IllegalArgumentException("no data chunk"))
    require(len % (2 * channels) == 0,
      s"data chunk ($len bytes) not aligned to ${2 * channels}-byte frames")
    val frames = len / (2 * channels)
    val sums = new Array[Long](channels)
    var i = 0
    while (i < len) {
      // signed little-endian int16
      val v = ((content(off + i) & 0xff) | (content(off + i + 1) << 8)).toShort
      sums((i / 2) % channels) += v
      i += 2
    }
    Array(rate.toDouble, channels.toDouble, frames.toDouble) ++
      sums.map(s => if (frames == 0) 0.0 else s.toDouble / frames)
  }

  /** Build an AUDIO media table from the documents fixture: each doc
    * renders to a REAL mono PCM16 WAV — canonical 44-byte RIFF header
    * plus 48 little-endian samples whose values are the doc's first 48
    * printable character codes ('.'-padded), generated by interleaving
    * the characters with NUL bytes. The sample expression is mirrored
    * by the q_multimodal_audio oracle, which recomputes the mean
    * amplitude from the same generating characters. */
  def audioFromDocs(docs: DataFrame): DataFrame = {
    val px = rpad(substring(regexp_replace(col("text"), "[^ -~]", "."), 1, WavSamples),
      WavSamples, ".")
    // each printable char c becomes the int16 LE sample (c, 0x00)
    val samples = encode(regexp_replace(px, "(.)", "$1\u0000"), "UTF-8")
    val content = concat(lit(WavHeader), samples)
    docs.select(
      col("doc_id").as("media_id"),
      lit(WavModality).as("modality"),
      content.as("content"),
      struct(col("source"), length(content).cast("long").as("n_bytes")).as("meta"))
  }

  /** Modality label surfaced for rows no codec covers: the feature
    * rows SAY they are opaque, so the histogram stand-in can never
    * masquerade downstream as a real decode. */
  val OpaqueModality = "opaque"

  /** STUB for codec-less modalities: a deterministic 16-bin byte
    * histogram, L1-normalized — a stand-in feature vector with the
    * same shape/contract a real audio/video codec would emit (none are
    * available in this sandbox). Rows taking this arm surface as
    * [[OpaqueModality]] in [[extractFeatures]] output. */
  def byteHistogram(content: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xff) >> 4) += 1.0
      i += 1
    }
    val n = math.max(1, content.length).toDouble
    hist.map(_ / n)
  }

  /** Build a media table from the documents fixture: each doc renders
    * to a REAL P6 PPM — header + 48 raw RGB bytes taken from the doc's
    * first 48 printable characters ('.'-padded), so the binary column
    * is genuinely self-describing media, not ASCII-as-bytes. The pixel
    * expression is mirrored by the q_multimodal oracle, which
    * recomputes the channel stats from the same generating expression. */
  def mediaFromDocs(docs: DataFrame): DataFrame = {
    val px = rpad(substring(regexp_replace(col("text"), "[^ -~]", "."), 1, 48),
      48, ".")
    val content = concat(encode(lit(PpmHeader), "UTF-8"), encode(px, "UTF-8"))
    docs.select(
      col("doc_id").as("media_id"),
      lit(PpmModality).as("modality"),
      content.as("content"),
      struct(col("source"), length(content).cast("long").as("n_bytes")).as("meta"))
  }

  /** Batched feature extraction: one decoder instantiation per
    * partition, streamed row batches — the mapInPandas shape on the
    * JVM. Dispatches on modality: PPM and WAV rows take the real
    * decode paths; a modality no codec covers falls back to the
    * [[byteHistogram]] stand-in AND surfaces as [[OpaqueModality]] in
    * the output — callers can always tell decoded features from
    * stand-in features by the modality column alone. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("modality"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        // per-partition decoder setup would happen here (codec init)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          val modality = r.getAs[String]("modality")
          val (outModality, features) =
            if (modality == PpmModality) (modality, decodePpm(bytes))
            else if (modality == WavModality) (modality, decodeWav(bytes))
            else (OpaqueModality, byteHistogram(bytes))
          MediaFeatures(r.getAs[Long]("media_id"), outModality,
            bytes.length.toLong, features)
        }
      }
  }

  /** Nearest-neighbor downsample of a P6 PPM by an integer factor:
    * output pixel (x, y) is source pixel (x·f, y·f); dimensions round
    * up so no factor can produce an empty image. Emits a VALID P6
    * payload (fresh header + packed plane) — the resized bytes
    * round-trip [[parsePpmHeader]]/[[decodePpm]], so a resize stage
    * composes with every downstream decode stage. Factor 1 re-emits
    * the image unchanged. */
  def resizePpm(content: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val (w, h, off) = parsePpmHeader(content)
    val w2 = (w + factor - 1) / factor
    val h2 = (h + factor - 1) / factor
    val header = s"P6\n$w2 $h2\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w2 * h2 * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var p = header.length
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = off + ((y * factor) * w + (x * factor)) * 3
        out(p) = content(src)
        out(p + 1) = content(src + 1)
        out(p + 2) = content(src + 2)
        p += 3
        x += 1
      }
      y += 1
    }
    out
  }

  /** Grayscale a P6 PPM in place: integer ITU-R BT.601 luma
    * y = (299·r + 587·g + 114·b) / 1000 (integer division — exact,
    * replayable; the float-free form of the standard weights), written
    * back as r = g = b = y so the output is again a VALID P6 that
    * round-trips [[parsePpmHeader]]/[[decodePpm]] — the channel-drop
    * preprocessing stage of an image pipeline, composing with resize
    * and every downstream decode. */
  def grayscalePpm(content: Array[Byte]): Array[Byte] = {
    val (w, h, off) = parsePpmHeader(content)
    val out = content.clone()
    var p = off
    val end = off + w * h * 3
    while (p < end) {
      val r = content(p) & 0xff
      val g = content(p + 1) & 0xff
      val b = content(p + 2) & 0xff
      val y = ((299 * r + 587 * g + 114 * b) / 1000).toByte
      out(p) = y; out(p + 1) = y; out(p + 2) = y
      p += 3
    }
    out
  }

  /** Media-table grayscale stage: PPM rows convert via
    * [[grayscalePpm]], other modalities pass through — the
    * [[resizeMedia]] shape (mapPartitions batching, map-only, no
    * shuffle at any scale). */
  def grayscaleMedia(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, modality, bytes) =>
        val out = if (modality == PpmModality) grayscalePpm(bytes) else bytes
        (id, modality, out)
      })
      .toDF("media_id", "modality", "content")
  }

  /** Media-table resize stage: PPM rows downsample by `factor`
    * ([[resizePpm]] — real pixel decimation through the real codec),
    * other modalities pass through untouched. Batched in
    * mapPartitions like [[extractFeatures]] (codec setup amortizes per
    * task); map-only — no shuffle at any scale. */
  def resizeMedia(media: DataFrame, factor: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, modality, bytes) =>
        val out = if (modality == PpmModality) resizePpm(bytes, factor) else bytes
        (id, modality, out)
      })
      .toDF("media_id", "modality", "content")
  }

  /** Frame sampling: every k-th fixed-size chunk of the payload (a
    * video pipeline would emit decoded frames; the chunking/explode
    * plumbing is the scale-relevant part). Features dispatch on
    * modality like [[extractFeatures]]: chunks of a PPM payload emit
    * real per-channel pixel means ([[ppmChunkFeatures]] — the payload
    * IS self-describing, so the chunk can be located in the pixel
    * plane); opaque modalities fall back to the labeled
    * [[byteHistogram]] stand-in. */
  def sampleFrames(media: DataFrame, chunkBytes: Int, everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .flatMap { case (id, modality, bytes) =>
        bytes.grouped(chunkBytes).zipWithIndex
          .filter(_._2 % everyK == 0)
          .map { case (chunk, idx) =>
            val features =
              if (modality == PpmModality)
                ppmChunkFeatures(bytes, idx * chunkBytes, chunk.length)
              else byteHistogram(chunk)
            (id, idx, chunk.length, features)
          }
      }
      .toDF("media_id", "frame_idx", "frame_bytes", "frame_features")
  }

  /** Difference-hash (dHash) perceptual fingerprint of a P6 PPM — the
    * image-side near-duplicate key (the pHash/aHash/dHash family every
    * image-dedup pipeline starts from; dHash is the
    * gradient-direction variant: robust to uniform brightness/contrast
    * shifts because only the SIGN of each horizontal luma step
    * survives). Bit k = y·(w−1)+x is set iff
    * luma(x, y) > luma(x+1, y), luma by the integer BT.601 form
    * shared with [[grayscalePpm]] — float-free, so the fingerprint is
    * exactly replayable in SQL from the fixture's text-derived pixel
    * plane. Classic dHash resizes to 9×8 first ([[resizePpm]]
    * composes for that); the hash itself works on any geometry with
    * (w−1)·h ≤ 64 bits. */
  def dHashPpm(content: Array[Byte]): Long = {
    val (w, h, off) = parsePpmHeader(content)
    require(w >= 2, s"dHash needs horizontal neighbors, got width $w")
    require((w - 1) * h <= 64, s"dHash bits (w-1)*h must fit 64, got ${(w - 1) * h}")
    def luma(x: Int, y: Int): Int = {
      val p = off + (y * w + x) * 3
      (299 * (content(p) & 0xff) + 587 * (content(p + 1) & 0xff) +
        114 * (content(p + 2) & 0xff)) / 1000
    }
    var hash = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w - 1) {
        if (luma(x, y) > luma(x + 1, y)) hash |= 1L << (y * (w - 1) + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Media-table dHash stage: PPM rows fingerprint via [[dHashPpm]]
    * (map-only, one decoder pass per partition — the
    * [[extractFeatures]] shape); non-PPM modalities are excluded
    * (a perceptual image hash of audio bytes would be noise wearing
    * a number). Returns `(media_id, dhash)`. */
  def dHashMedia(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === lit(PpmModality))
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) => (id, dHashPpm(c)) })
      .toDF("media_id", "dhash")
  }

  /** Near-duplicate census over a SMALL-domain perceptual hash: pair
    * counts by Hamming distance ≤ `maxHamming`. The scale shape that
    * fits a ≤16-bit fingerprint (where banded blocking degenerates —
    * a 4-bit band has 16 buckets, so band joins go quadratic in the
    * corpus): ONE map-side-combined (hash → count) census reduces the
    * corpus to its DOMAIN (≤ 2^bits rows, constant in corpus size),
    * then the all-pairs comparison runs on the domain² grid — 8M
    * integer popcounts at 12 bits, independent of whether the corpus
    * is 60 k or 60 B images. Same-hash pairs enter as C(cnt, 2) at
    * distance 0; cross-hash pairs as cnt_a·cnt_b (products in
    * DECIMAL(38,0) — two 10⁹-image buckets overflow int64). Exact
    * integer end-to-end. For ≥32-bit hashes use the banded
    * [[graft.operators.MinHash.simHashPairs]] shape instead. */
  def dHashCensus(hashes: DataFrame, maxHamming: Int, bits: Int,
      hashCol: String = "dhash"): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    require(bits >= 1 && bits <= 16,
      s"domain-census shape is for <=16-bit hashes (got $bits); band instead")
    val c = hashes
      .select(col(hashCol).cast("long").as("h"))
      .withColumn("__chk", when(col("h") < 0L || col("h") >= (1L << bits),
        raise_error(concat(lit(s"dHashCensus: hash outside the declared $bits-bit domain: "),
          col("h").cast("string")))).otherwise(lit(0)))
      .groupBy("h").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // two self-join consumers
    // per-pair products stay DECIMAL(38,0) THROUGH the sum (two 10⁹-
    // image buckets overflow int64, and a non-ANSI decimal→long cast
    // per row would wrap/null silently); only the final per-distance
    // total casts down, where overflow would need >9.2e18 total pairs
    val same = c.select(lit(0).cast("int").as("hamming"),
      expr("CAST((CAST(cnt AS DECIMAL(38,0)) * (cnt - 1)) DIV 2 AS DECIMAL(38,0))").as("pairs"))
    val cross = c.as("x").join(c.as("y"), col("x.h") < col("y.h"))
      .select(bit_count(col("x.h").bitwiseXOR(col("y.h"))).cast("int").as("hamming"),
        expr("CAST(CAST(x.cnt AS DECIMAL(38,0)) * y.cnt AS DECIMAL(38,0))").as("pairs"))
      .filter(col("hamming") <= maxHamming)
    same.unionAll(cross.filter(col("hamming") >= 1))
      .groupBy("hamming").agg(sum(col("pairs")).cast("bigint").as("n_pairs"))
      .filter(col("hamming") <= maxHamming)
  }
}
