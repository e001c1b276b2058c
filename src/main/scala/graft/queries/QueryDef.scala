package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus, when SQL
  * can express it, DuckDB oracle SQL the driver checks it against.
  * `oracle = None` → the driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Shared convention: deterministic double → decimal cast before any
    * SUM so both engines accumulate exact decimals (bit-identical when
    * cast back to double). See SparkEntry scaladoc. */
  val MoneyScale = "decimal(18,6)"
}

/** Dtype-adaptive ingest for the events fixture. The driver's generator
  * has shipped `events.ts` both as int64 nanos-since-epoch (rounds ≤6)
  * and as native parquet timestamp[us] (round 7 refresh); every
  * event-time query goes through ONE normalization point that branches
  * on the actual column dtype, so a fixture refresh can never again
  * break the whole event-time suite at once.
  */
object EventsFixture {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{LongType, TimestampType}

  /** Normalize `ts` to TimestampType at micros precision whatever the
    * fixture shipped: int64 → interpret as nanos-since-epoch and
    * truncate; timestamp → already micros, pass through; anything else
    * → plain cast. Works identically on batch and readStream frames
    * (branching is on the schema, resolved before execution). */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampType => df
    case _             => df.withColumn("ts", col("ts").cast(TimestampType))
  }

  /** The events table with `ts` normalized (batch read). */
  def events(s: SparkSession, dir: String): DataFrame =
    normalizeTs(s.read.parquet(s"$dir/events.parquet"))
}
