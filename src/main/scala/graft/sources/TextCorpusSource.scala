package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Reader/writer pair for the two text-corpus interchange formats a
  * training-data pipeline actually exchanges with the outside world
  * (extension — the reference's only disk format is the packed-f32
  * vector file, `/root/reference/src/disk_store.rs`):
  *
  *  - **JSONL** (one JSON object per line) — the de-facto LLM corpus
  *    format. Spark's json source is line-splittable, so a 100 TB
  *    corpus scans with one task per split and NO cross-record
  *    coordination; escaping (quotes, control chars, non-ASCII) is
  *    the codec's problem, not the caller's.
  *  - **CSV (RFC 4180)** — `quote`-doubling escape convention
  *    (`escape = quote = '"'`, not Spark's backslash default, so any
  *    standards-compliant consumer reads the output). Fields may then
  *    legally contain embedded newlines, which makes a general CSV
  *    read NOT line-splittable — `multiLine` parses whole files, the
  *    documented throughput price of the format (JSONL is the scale
  *    format; CSV exists for interchange). Empty string vs NULL is
  *    disambiguated explicitly (`emptyValue = ""` both ways).
  *
  * Both writers shard into one part-file per task (no driver
  * collect); both readers take an EXPLICIT schema — inference would
  * scan twice and can mistype columns, the classic silent-drift trap.
  * Round-trip losslessness (hostile quoting, embedded newlines,
  * non-ASCII) is pinned in TextSourceSpec; the fixture-scale ordinal
  * and content integrity are gated by q_jsonl_source / q_csv_source.
  */
object TextCorpusSource {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("emptyValue", "\"\"")
      // the writer TRIMS field whitespace by default — data loss, off
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      // a sentinel no real text contains, so NULL and "" stay distinct
      .option("nullValue", "\u0000")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("emptyValue", "")
      // the reader's default nullValue is "" — it would fold empty
      // strings into NULL; match the writer's sentinel instead
      .option("nullValue", "\u0000")
      .option("multiLine", "true")
      .csv(path)
}
