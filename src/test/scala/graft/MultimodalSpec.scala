package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.operators.MinHash

/** Multimodal tests (real PPM decode + schema/batching plumbing) +
  * SimHash locality sanity. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("media table carries binary content + typed metadata") {
    val media = Multimodal.mediaFromDocs(spark.read.parquet(s"$sfDir/documents.parquet"))
    val r = media.select(col("media_id"), length(col("content")).as("len"), col("meta.n_bytes"))
      .filter(col("media_id") === 0L).collect()(0)
    assert(r.getInt(1).toLong == r.getLong(2), "binary length must equal metadata n_bytes (ASCII)")
  }

  test("feature extraction: real PPM header parse + channel means") {
    val media = Multimodal.mediaFromDocs(spark.read.parquet(s"$sfDir/documents.parquet"))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 500)
    feats.take(20).foreach { f =>
      assert(f.n_bytes == 59, "11-byte P6 header + 48 pixel bytes")
      assert(f.features.length == 5)
      assert(f.features(0) == 4.0 && f.features(1) == 4.0, "header dims round-trip")
      // pixels are printable ASCII, so channel means live in [32, 126]
      f.features.drop(2).foreach(m => assert(m >= 32.0 && m <= 126.0))
    }
  }

  test("PPM decode rejects malformed media instead of swallowing it") {
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P5\n4 4\n255\nxxxx".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P6\n4 4\n255\nshort".getBytes("US-ASCII"))
    }
    // hostile headers: 65536x65536 overflows the Int plane size to 0;
    // -4 x -4 multiplies back to +48 — both must throw, not decode
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P6\n65536 65536\n255\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(
        ("P6\n-4 -4\n255\n" + "x" * 48).getBytes("US-ASCII"))
    }
  }

  test("PPM decode: exact channel means on a known image") {
    val pixels = Array.tabulate(48)(i => (i % 3 match {
      case 0 => 10 + i / 3 // R: 10..25, mean 17.5
      case 1 => 100        // G
      case 2 => 200        // B
    }).toByte)
    val ppm = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ pixels
    val f = Multimodal.decodePpm(ppm)
    assert(f.toSeq == Seq(4.0, 4.0, 17.5, 100.0, 200.0))
  }

  test("PPM chunk features: exact channel means over the covered pixel window") {
    // R=10..25 ascending, G=100, B=200 (as in the decode test); plane
    // offset is 11, so chunk [0,16) covers pixel bytes 11..15 =
    // R(10), G(100), B(200), R(11), G(100)
    val pixels = Array.tabulate(48)(i => (i % 3 match {
      case 0 => 10 + i / 3
      case 1 => 100
      case 2 => 200
    }).toByte)
    val ppm = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ pixels
    assert(Multimodal.ppmChunkFeatures(ppm, 0, 16).toSeq == Seq(10.5, 100.0, 200.0))
    // a header-only window reports all-absent channels as 0.0
    assert(Multimodal.ppmChunkFeatures(ppm, 0, 8).toSeq == Seq(0.0, 0.0, 0.0))
    // full-payload window reproduces the decode's channel means
    assert(Multimodal.ppmChunkFeatures(ppm, 0, ppm.length).toSeq ==
      Multimodal.decodePpm(ppm).drop(2).toSeq)
  }

  test("PPM resize: exact nearest-neighbor decimation, identity at factor 1, re-parsable output") {
    // 4x4 image whose pixel (x, y) has bytes (y*4+x, 100+y*4+x, 200)
    val plane = (0 until 16).flatMap(o => Seq(o.toByte, (100 + o).toByte, 200.toByte))
    val img = ("P6\n4 4\n255\n".getBytes("US-ASCII") ++ plane).toArray
    val half = Multimodal.resizePpm(img, 2)
    val feats = Multimodal.decodePpm(half)
    assert(feats(0) == 2.0 && feats(1) == 2.0, "resized header must say 2x2")
    // surviving pixels: ordinals 0, 2, 8, 10 -> mean R = (0+2+8+10)/4
    assert(feats(2) == 5.0 && feats(3) == 105.0 && feats(4) == 200.0)
    assert(Multimodal.resizePpm(img, 1).toSeq == img.toSeq,
      "factor 1 must re-emit the image byte-identically")
    // odd dimensions round up: 5x3 at factor 2 -> 3x2
    val odd = ("P6\n5 3\n255\n".getBytes("US-ASCII") ++
      Array.fill(5 * 3 * 3)(7.toByte)).toArray
    val oddHalf = Multimodal.decodePpm(Multimodal.resizePpm(odd, 2))
    assert(oddHalf(0) == 3.0 && oddHalf(1) == 2.0)
    intercept[IllegalArgumentException] {
      Multimodal.resizePpm("P6\n4 4\n255\nshort".getBytes("US-ASCII"), 2)
    }
  }

  test("PPM grayscale: exact integer luma, equal channels, idempotent, " +
      "re-parsable, composes with resize") {
    // pixel (x, y) has bytes (o, 100+o, 200) like the resize fixture
    val plane = (0 until 16).flatMap(o => Seq(o.toByte, (100 + o).toByte, 200.toByte))
    val img = ("P6\n4 4\n255\n".getBytes("US-ASCII") ++ plane).toArray
    val gray = Multimodal.grayscalePpm(img)
    val feats = Multimodal.decodePpm(gray)
    assert(feats(0) == 4.0 && feats(1) == 4.0, "dimensions unchanged")
    // luma of ordinal o: (299*o + 587*(100+o) + 114*200) / 1000
    val lumas = (0 until 16).map(o => (299 * o + 587 * (100 + o) + 114 * 200) / 1000)
    val expect = lumas.sum.toDouble / 16.0
    assert(feats(2) == expect && feats(3) == expect && feats(4) == expect,
      s"all three channel means must equal the mean luma $expect: ${feats.toSeq}")
    // idempotent up to the integer division's fixpoint behaviour:
    // a gray pixel (y,y,y) maps to (299y+587y+114y)/1000 = y exactly
    assert(Multimodal.grayscalePpm(gray).toSeq == gray.toSeq,
      "grayscaling a gray image must be the identity")
    // composes with resize: still a valid P6 after both stages
    val both = Multimodal.decodePpm(Multimodal.resizePpm(gray, 2))
    assert(both(0) == 2.0 && both(2) == both(3) && both(3) == both(4))
  }

  test("resizeMedia passes non-PPM modalities through untouched") {
    import spark.implicits._
    val wav = Multimodal.audioFromDocs(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(3))
    val before = wav.select("media_id", "content")
      .as[(Long, Array[Byte])].collect().map { case (i, b) => (i, b.toSeq) }.toMap
    val after = Multimodal.resizeMedia(wav, 2)
      .select("media_id", "content")
      .as[(Long, Array[Byte])].collect().map { case (i, b) => (i, b.toSeq) }.toMap
    assert(after == before, "a resize stage must never rewrite opaque/audio payloads")
  }

  test("frame sampling emits every k-th chunk with features") {
    val media = Multimodal.mediaFromDocs(
      spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 5))
    val frames = Multimodal.sampleFrames(media, chunkBytes = 64, everyK = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getInt(1) % 2 == 0), "only every 2nd frame index sampled")
  }

  test("WAV decode: exact per-channel means, chunk walking, and malformed rejection") {
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def wav(channels: Int, samples: Seq[Int], extraChunk: Boolean = false): Array[Byte] = {
      val data = samples.flatMap(le16(_)).toArray
      val junk = if (extraChunk) "LIST".getBytes("US-ASCII") ++ le32(3) ++
        Array[Byte](1, 2, 3, 0) else Array.emptyByteArray // padded to even
      val body = "WAVE".getBytes("US-ASCII") ++
        junk ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
        le32(8000) ++ le32(8000 * 2 * channels) ++ le16(2 * channels) ++ le16(16) ++
        "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    // mono: mean over signed int16 samples (incl. a negative one)
    val mono = Multimodal.decodeWav(wav(1, Seq(100, 200, -300, 400)))
    assert(mono.toSeq == Seq(8000.0, 1.0, 4.0, 100.0))
    // stereo interleave: ch0 = (10, 30) mean 20, ch1 = (20, 40) mean 30
    val stereo = Multimodal.decodeWav(wav(2, Seq(10, 20, 30, 40)))
    assert(stereo.toSeq == Seq(8000.0, 2.0, 2.0, 20.0, 30.0))
    // an unknown (odd-sized, padded) chunk before fmt/data must skip
    val skipped = Multimodal.decodeWav(wav(1, Seq(7, 9), extraChunk = true))
    assert(skipped.toSeq == Seq(8000.0, 1.0, 2.0, 8.0))
    // malformed payloads reject: wrong magic, size lie, truncated data,
    // non-PCM format
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("RIFX1234WAVE".getBytes("US-ASCII") ++ new Array[Byte](40))
    }
    val lie = wav(1, Seq(1, 2)); lie(4) = (lie(4) + 8).toByte
    intercept[IllegalArgumentException](Multimodal.decodeWav(lie))
    intercept[IllegalArgumentException](
      Multimodal.decodeWav(wav(1, Seq(1, 2)).dropRight(1)))
    val nonPcm = wav(1, Seq(1, 2)); nonPcm(20) = 3 // audioFormat = IEEE float
    intercept[IllegalArgumentException](Multimodal.decodeWav(nonPcm))
  }

  test("audio media table round-trips through the WAV decoder") {
    val media = Multimodal.audioFromDocs(
      spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 20))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.n_bytes == 140, "44-byte RIFF header + 96 sample bytes")
      assert(f.features(0) == 8000.0 && f.features(1) == 1.0 && f.features(2) == 48.0)
      // samples carry printable character codes, so the mean amplitude
      // lives in [32, 126]
      assert(f.features(3) >= 32.0 && f.features(3) <= 126.0)
    }
  }

  test("byte-histogram fallback is deterministic and L1-normalized") {
    val b = "spark filter join".getBytes("UTF-8")
    assert(Multimodal.byteHistogram(b).toSeq == Multimodal.byteHistogram(b).toSeq)
    assert(math.abs(Multimodal.byteHistogram(b).sum - 1.0) < 1e-9)
  }

  test("decoded modalities never take the histogram arm; unknown surfaces as opaque") {
    import spark.implicits._
    val ppm = Multimodal.mediaFromDocs(
      spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 5))
    val wav = Multimodal.audioFromDocs(
      spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 5))
    val unknown = Seq((9001L, "video/x-unknown", "no codec here".getBytes("UTF-8")))
      .toDF("media_id", "modality", "content")
      .withColumn("meta", struct(lit("synth").as("source"),
        length(col("content")).cast("long").as("n_bytes")))
    val feats = Multimodal.extractFeatures(ppm.unionByName(wav).unionByName(unknown))
      .collect()
    // PPM/WAV rows keep their modality and their decoder's feature
    // shape (5 = [w,h,meanR,meanG,meanB]; 4 = [rate,ch,frames,mean]);
    // the 16-bin histogram shape may never appear under a decodable
    // modality
    feats.filter(_.modality == Multimodal.PpmModality)
      .foreach(f => assert(f.features.length == 5))
    feats.filter(_.modality == Multimodal.WavModality)
      .foreach(f => assert(f.features.length == 4))
    assert(feats.count(_.modality == Multimodal.PpmModality) == 5)
    assert(feats.count(_.modality == Multimodal.WavModality) == 5)
    // the codec-less row surfaces as opaque — the stand-in cannot
    // masquerade as a decode under its input modality string
    val op = feats.filter(_.media_id == 9001L)
    assert(op.length == 1 && op.head.modality == Multimodal.OpaqueModality)
    assert(op.head.features.length == 16)
    assert(!feats.exists(_.modality == "video/x-unknown"))
  }

  test("jaccard prefix+positional filters return exactly the unfiltered result set") {
    import graft.operators.Dedup
    for ((sf, tau) <- Seq(("sf0.001", 0.8), ("sf0.01", 0.7))) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      def pairs(pf: Boolean) =
        Dedup.jaccardJoin(docs, tau = tau, prefixFilter = pf)
          .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val filtered = pairs(true)
      val full = pairs(false)
      assert(filtered == full,
        s"$sf tau=$tau filtering must be lossless: " +
          s"only-filtered=${filtered -- full}, missed=${full -- filtered}")
      assert(full.nonEmpty, s"$sf fixture should contain near-dup pairs")
    }
  }

  // ---- dHash perceptual fingerprint ----------------------------------

  /** 4×4 P6 from 16 gray levels (r = g = b = v). */
  private def grayPpm(levels: Seq[Int]): Array[Byte] =
    "P6\n4 4\n255\n".getBytes("US-ASCII") ++
      levels.flatMap(v => Seq(v.toByte, v.toByte, v.toByte)).toArray

  test("dHash: hand bits — one descending row sets exactly its three row bits") {
    // row 0 strictly descending (bits 0,1,2 set); rows 1-3 flat (no bits)
    val img = grayPpm(Seq(40, 30, 20, 10) ++ Seq.fill(12)(7))
    assert(Multimodal.dHashPpm(img) == 7L)
    // ascending row: luma(x) > luma(x+1) never holds → 0
    assert(Multimodal.dHashPpm(grayPpm(Seq(10, 20, 30, 40) ++ Seq.fill(12)(7))) == 0L)
  }

  test("dHash: invariant to uniform brightness shift (gradient signs survive)") {
    val base = Seq(40, 30, 20, 10, 5, 9, 9, 5, 100, 90, 110, 95, 7, 7, 8, 6)
    val shifted = base.map(_ + 60)
    assert(Multimodal.dHashPpm(grayPpm(base)) == Multimodal.dHashPpm(grayPpm(shifted)))
  }

  test("dHash: misuse rejected loudly (width 1; oversized bit plane)") {
    intercept[IllegalArgumentException] {
      Multimodal.dHashPpm(("P6\n1 4\n255\n" + "x" * 12).getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.dHashPpm(("P6\n12 12\n255\n" + "x" * 432).getBytes("US-ASCII"))
    }
  }

  test("dHashCensus: hand pair counts by distance; out-of-domain hash raises") {
    import spark.implicits._
    // hashes: 5 ×3 (3 same-pairs), 4 (hamming(5,4)=1, ×3 pairs), 12 (h(5,12)=2... )
    val df = Seq(5L, 5L, 5L, 4L, 12L).toDF("dhash")
    val got = Multimodal.dHashCensus(df, maxHamming = 3, bits = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // h(5,4)=1 → 3·1 pairs; h(5,12)=bits(9)=2 → 3 pairs; h(4,12)=bits(8)=1 → 1 pair
    assert(got == Map(0 -> 3L, 1 -> 4L, 2 -> 3L), s"got $got")
    val bad = Seq(5L, 99L).toDF("dhash")
    val e = intercept[Exception] {
      Multimodal.dHashCensus(bad, maxHamming = 1, bits = 4).collect()
    }
    assert(e.getMessage.contains("domain"))
  }

  test("dHash media stage: fixture twins share fingerprints; census ≡ direct count") {
    val media = Multimodal.mediaFromDocs(spark.read.parquet(s"$sfDir/documents.parquet"))
    val hashes = Multimodal.dHashMedia(media)
    val hs = hashes.collect().map(r => r.getLong(1))
    val direct0 = hs.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val census = Multimodal.dHashCensus(hashes, maxHamming = 3, bits = 12)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(census(0) == direct0, s"distance-0 census must equal the direct dup count")
    assert(census.getOrElse(1, 0L) + census.getOrElse(2, 0L) > 0L,
      "fixture prefixes should produce some near-miss fingerprints")
  }

  test("simhash: near-dup docs land at small hamming distance") {
    // doc pair (8, 245) is a generator-injected near-dup (J ~ 0.988 at sf0.01)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val sh = MinHash.simHashTable(docs)
      .filter(col("doc_id").isin(8L, 245L, 100L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(hamming(sh(8L), sh(245L)) <= 6, s"near-dups too far: ${hamming(sh(8L), sh(245L))}")
    assert(hamming(sh(8L), sh(100L)) > hamming(sh(8L), sh(245L)),
      "unrelated doc should be farther than the near-dup")
  }
}
