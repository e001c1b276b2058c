package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RelationalQueries

/** Dtype-matrix armor for the event-time suite (VERDICT r9 item #5):
  * the driver regenerates fixtures between rounds and has shipped `ts`
  * both as timestamp[us] (rounds 7+) and as int64 nanos (rounds ≤6).
  * The parity convention is that BOTH engines truncate to micros —
  * `EventsFixture.normalizeTs` on the Spark side, `epoch_ns(ts) //
  * 1000` in the oracles — so sub-microsecond jitter (in particular at
  * the 1800 s session-gap boundary) can never split the engines. This
  * spec pins the Spark half of that convention: the same events served
  * under either dtype, with deliberate sub-µs nanos jitter, produce
  * identical answers.
  */
class EventsDtypeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The fixture's ts as epoch micros, whatever dtype it shipped as. */
  private def withUs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("__us", expr("ts div 1000"))
    case _        => df.withColumn("__us", unix_micros(col("ts").cast("timestamp")))
  }

  private def writeFixture(df: DataFrame): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_evdtype_")
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
    df.write.mode("overwrite").parquet(s"$p/events.parquet")
    p.toString
  }

  test("event-time queries are invariant across timestamp[us] and int64-nanos fixtures") {
    val src = withUs(spark.read.parquet(s"$sfDir/events.parquet"))
    val cols = src.columns.filter(c => c != "ts" && c != "__us").map(col)
    // copy A: timestamp[us] — the shape rounds 7+ ship
    val usDir = writeFixture(
      src.select(cols :+ timestamp_micros(col("__us")).as("ts"): _*))
    // copy B: int64 nanos with deterministic sub-µs jitter — the
    // rounds-≤6 shape plus the precision that would split the engines
    // if either side compared raw nanos (997 is coprime to 1000, so
    // jitter hits 0..996 ns across ids; all below one micro)
    val nsDir = writeFixture(
      src.select(cols :+
        (col("__us") * 1000L + pmod(col("event_id"), lit(997L))).cast("long").as("ts"): _*))

    // the named risk: session gaps cut at exactly the 1800 s boundary
    val a = RelationalQueries.qEventsSessions(spark, usDir).collect().map(_.toSeq).toSeq
    val b = RelationalQueries.qEventsSessions(spark, nsDir).collect().map(_.toSeq).toSeq
    assert(a == b, "session counts diverged between us and nanos fixtures")
    assert(a.nonEmpty)

    // the rest of the batch event-time suite under the same matrix
    for ((name, fn) <- Seq[(String, (SparkSession, String) => DataFrame)](
        "hourly" -> RelationalQueries.qEventsHourly,
        "funnel" -> RelationalQueries.qEventsFunnel,
        "cohort" -> RelationalQueries.qCohortRetention)) {
      val x = fn(spark, usDir).collect().map(_.toSeq).toSeq
      val y = fn(spark, nsDir).collect().map(_.toSeq).toSeq
      assert(x == y, s"$name diverged between us and nanos fixtures")
    }
  }
}
