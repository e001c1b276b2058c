package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RelationalQueries

/** SCD2 history and the trailing-window anomaly census: structural
  * invariants the oracle hash can't articulate on its own. */
class WindowOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("SCD2 versions tile each user's timeline: no overlaps, no repeats, one open row") {
    val rows = RelationalQueries.qScd2History(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), Option(r.getString(4))))
    rows.groupBy(_._1).foreach { case (user, hist) =>
      val sorted = hist.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"user $user version gap")
      // exactly one current (open) version, and it is the last
      assert(sorted.count(_._5.isEmpty) == 1 && sorted.last._5.isEmpty,
        s"user $user open-row invariant broken")
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5.contains(b._4), s"user $user: valid_to must chain to the next valid_from")
          assert(a._3 != b._3, s"user $user: consecutive versions with equal attribute must compress")
        case _ =>
      }
    }
  }

  test("anomaly census z-scores a crafted spike far above its flat history") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 30 flat hours (n=10 each) then one 5x spike for one event type:
    // build synthetic events at 1 event per (hour, i) granularity
    val base = for (h <- 0 until 31; i <- 0 until (if (h == 30) 50 else 10))
      yield (h.toLong * 100 + i, java.sql.Timestamp.valueOf(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:15:00"), 1L, "click", 1.0, "{}")
    val df = base.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val path = java.nio.file.Files.createTempDirectory("graft_anom_").toString
    df.write.mode("overwrite").parquet(s"$path/events.parquet")
    val out = RelationalQueries.qAnomalyHourly(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(4)))
    // a perfectly constant history has sigma = 0: NOTHING may emit (a
    // 0/0 z-score leaking through would be a wrong answer)
    assert(out.isEmpty, s"sigma=0 rows must filter, got ${out.toSeq}")
    // jitter the history so sigma > 0: the spike must flag, flat must not
    val base2 = for (h <- 0 until 31; i <- 0 until (if (h == 30) 50 else 10 + h % 2))
      yield (h.toLong * 100 + i, java.sql.Timestamp.valueOf(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:15:00"), 1L, "click", 1.0, "{}")
    base2.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$path/events.parquet")
    val out2 = RelationalQueries.qAnomalyHourly(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(4)))
    val spike = out2.filter(_._2 == 50L)
    assert(spike.nonEmpty && spike.head._3 > 10.0,
      s"5x spike must z-score far out: ${spike.toSeq}")
    assert(out2.filter(_._2 <= 11L).forall(r => math.abs(r._3) < 3.0),
      "near-flat hours must not flag")
  }
}
