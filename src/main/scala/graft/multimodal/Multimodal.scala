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
  * whole batch — the JVM equivalent of a `mapInPandas` batch UDF. The
  * actual image/audio codecs are NOT available in this environment, so
  * [[decodeStub]] is a clearly-marked deterministic stand-in; the
  * schema, partitioning, batch shape, and feature plumbing are real.
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

  /** STUB decoder: where a real pipeline would run an image/audio codec
    * (JPEG decode, resample, frame-sample), this computes a
    * deterministic 16-bin byte histogram, L1-normalized — a stand-in
    * feature vector with the same shape/contract a codec would emit. */
  def decodeStub(content: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xff) >> 4) += 1.0
      i += 1
    }
    val n = math.max(1, content.length).toDouble
    hist.map(_ / n)
  }

  /** Build a media table from the documents fixture: UTF-8 bytes stand
    * in for encoded media; metadata travels as a typed struct. */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(col("source"), length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** Batched feature extraction: one decoder instantiation per
    * partition, streamed row batches — the mapInPandas shape on the JVM. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("modality"), col("content"))
      .mapPartitions { rows: Iterator[Row] =>
        // per-partition decoder setup would happen here (codec init)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          MediaFeatures(
            r.getAs[Long]("media_id"),
            r.getAs[String]("modality"),
            bytes.length.toLong,
            decodeStub(bytes))
        }
      }
  }

  /** "Frame sampling" stub: every k-th fixed-size chunk of the payload
    * (a video pipeline would emit decoded frames; the chunking/explode
    * plumbing is the real part). */
  def sampleFrames(media: DataFrame, chunkBytes: Int, everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(chunkBytes).zipWithIndex
          .filter(_._2 % everyK == 0)
          .map { case (chunk, idx) => (id, idx, chunk.length, decodeStub(chunk)) }
      }
      .toDF("media_id", "frame_idx", "frame_bytes", "frame_features")
  }
}
