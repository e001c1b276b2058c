package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.EventStreams

/** Pipeline-surface queries: multimodal feature extraction (batched
  * typed pipeline over binary columns) and the unified batch/streaming
  * transform applied in batch mode (backfill path). */
object PipelineQueries {

  /** Binary media -> stub features, projected to oracle-comparable
    * scalars (byte histogram bins; corpus is ASCII so DuckDB can
    * recompute them from character codes). */
  def qMultimodal(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.mediaFromDocs(s.read.parquet(s"$dir/documents.parquet")))
      .toDF()
      .select(
        col("media_id"),
        col("n_bytes"),
        round(element_at(col("features"), 3), 4).as("f2"),
        round(element_at(col("features"), 7), 4).as("f6"),
        round(element_at(col("features"), 8), 4).as("f7"))
      .orderBy("media_id")

  /** The streaming hourly-counts transform run over the batch events
    * table — same code path `readStream` uses (watermark is a no-op in
    * batch). `ts` arrives as nanos-since-epoch; truncate to micros. */
  def qStreamHourly(s: SparkSession, dir: String): DataFrame =
    EventStreams.hourlyCounts(
        s.read.parquet(s"$dir/events.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000"))))
      .select(
        date_format(col("hour_start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_multimodal", qMultimodal, Some(
      """SELECT doc_id AS media_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |  round(CAST(len(list_filter(string_split(text,''), c -> (ord(c) >> 4) = 2)) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE), 4) AS f2,
        |  round(CAST(len(list_filter(string_split(text,''), c -> (ord(c) >> 4) = 6)) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE), 4) AS f6,
        |  round(CAST(len(list_filter(string_split(text,''), c -> (ord(c) >> 4) = 7)) AS DOUBLE)
        |        / CAST(length(text) AS DOUBLE), 4) AS f7
        |FROM documents ORDER BY media_id""".stripMargin)),
    QueryDef("q_stream_hourly", qStreamHourly, Some(
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin)),
  )
}
