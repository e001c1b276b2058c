package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{UserEvent, UserStat}

/** Structured Streaming tests: the same transforms the batch queries
  * use, driven through readStream-equivalent MemoryStream sources. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("EventsFixture.normalizeTs adapts to int64-nanos, timestamp, and castable ts dtypes") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.TimestampType
    import spark.implicits._
    // the nanos branch no longer occurs in the driver fixtures (they
    // ship timestamp[us] since round 7) — keep it covered here so the
    // next dtype flip either way stays a no-op
    val nanos = Seq((1L, 1700000000000000000L)).toDF("event_id", "ts")
    val n = graft.queries.EventsFixture.normalizeTs(nanos)
    assert(n.schema("ts").dataType == TimestampType)
    assert(n.select(unix_micros(col("ts"))).head().getLong(0) == 1700000000000000L)
    // timestamp passes through unchanged
    val p = graft.queries.EventsFixture.normalizeTs(n)
    assert(p.select(unix_micros(col("ts"))).head().getLong(0) == 1700000000000000L)
    // anything else takes the cast fallback
    val c = graft.queries.EventsFixture.normalizeTs(
      Seq("2023-11-14 22:13:20").toDF("ts"))
    assert(c.schema("ts").dataType == TimestampType)
  }

  test("foreachBatch micro-batches drive incremental index maintenance (multi-trigger addBatch)") {
    import org.apache.spark.sql.functions._
    import graft.index.{HnswIndex, HnswParams}
    val P = HnswParams(16, 32)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("part", col("label"))
    val late = col("vec_id") % 2 === 1
    var idx = HnswIndex.build(e.filter(!late), P)
    // stage the late rows as 3 files -> maxFilesPerTrigger=1 yields 3
    // REAL micro-batches, each one addBatch generation
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_spec_").toString
    e.filter(late).select("vec_id", "embedding", "label")
      .repartition(3, col("vec_id")).write.mode("overwrite").parquet(stage)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val stream = spark.readStream.schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (b.count() > 0) batches.incrementAndGet()
        idx = HnswIndex.addBatch(idx, b.withColumn("part", col("label")), P)
        idx = idx.persist()
        idx.count()
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.get() >= 2,
      s"expected multiple micro-batch generations, got ${batches.get()}")
    assert(idx.count() == 500L, "streamed index must cover the full corpus")
    // exhaustive-ef search over the streamed index == batch-built index
    val full = HnswIndex.build(e, P)
    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def top(ds: org.apache.spark.sql.Dataset[HnswIndex.IndexRow]) =
      HnswIndex.search(ds, queries, k = 5, P, efSearch = 4096)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(top(idx) == top(full),
      "stream-maintained index must serve identically to a batch build")
  }

  test("hourly windowed counts over a stream (watermark + tumbling window)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, String, Double)]
    val df = src.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.startToMemory(
      EventStreams.hourlyCounts(df), "hourly_test", OutputMode.Complete())
    try {
      src.addData((ts(5), "click", 1.5), (ts(10), "click", 2.5), (ts(15), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, sum_value FROM hourly_test ORDER BY event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq(("click", 2L, 4.0), ("view", 1L, 1.0)))
    } finally q.stop()
  }

  test("late-data census predicts the real engine's watermark drops, boundary included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(hhmm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    // batch 1: max 12:10 -> watermark at batch-2 start = 12:00 sharp
    val b1 = Seq((at("10:10"), "a", 1.0), (at("12:10"), "a", 1.0))
    // batch 2: 10:30 (window end 11:00 < wm -> drop), 11:10 (window
    // end 12:00 == wm -> the BOUNDARY row), 12:05 + 12:20 (kept)
    val b2 = Seq((at("10:30"), "a", 1.0), (at("11:10"), "a", 1.0),
      (at("12:05"), "a", 1.0), (at("12:20"), "a", 1.0))
    val src = MemoryStream[(Timestamp, String, Double)]
    val df = src.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.startToMemory(
      EventStreams.hourlyCounts(df), "late_test", OutputMode.Update())
    val engineCounts =
      try {
        src.addData(b1: _*); q.processAllAvailable()
        src.addData(b2: _*); q.processAllAvailable()
        // last update per window = its final surviving count
        spark.sql("""SELECT hour_start, max(n) AS n FROM late_test
                     GROUP BY hour_start ORDER BY hour_start""")
          .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq
      } finally q.stop()
    // census over the SAME batch assignment
    val assigned = (b1.map(e => (e._1, e._2, e._3, 1)) ++
      b2.map(e => (e._1, e._2, e._3, 2))).toDF("ts", "event_type", "value", "bt")
    val census = EventStreams.lateDataCensus(assigned,
      org.apache.spark.sql.functions.col("bt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // the census says: batch 1 drops nothing, batch 2 drops the 10:30
    // row AND the 12:00-boundary row (window_end <= wm)
    assert(census.toSeq == Seq((1, 2L, 0L), (2, 4L, 2L)), s"census: ${census.toSeq}")
    // and the ENGINE agrees: 10:00 window keeps only batch-1's row,
    // 11:00 window's late boundary row never lands, 12:00 window gets
    // batch-1's 12:10 + batch-2's 12:05/12:20
    assert(engineCounts == Seq(
      ("2024-01-01 10:00:00.0", 1L), ("2024-01-01 12:00:00.0", 3L)),
      s"engine: $engineCounts")
  }

  test("streaming KMV distinct sketch: incremental micro-batches equal the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, Long)]
    val df = src.toDF().toDF("ts", "user_id")
    val q = EventStreams.startToMemory(
      EventStreams.hourlyDistinctUsers(df, k = 4), "kmv_test", OutputMode.Complete())
    try {
      // 6 distinct users across two micro-batches (with repeats): the
      // O(k) sketch state must merge incrementally to the same result
      // one batch would give
      src.addData((ts(1), 10L), (ts(2), 11L), (ts(3), 12L), (ts(4), 10L))
      q.processAllAvailable()
      src.addData((ts(5), 13L), (ts(6), 14L), (ts(7), 15L), (ts(8), 11L))
      q.processAllAvailable()
      val streamed = spark.table("kmv_test")
        .select("n_cand", "kth_hash", "est_users").head()
      val batch = EventStreams.hourlyDistinctUsers(
          (10L to 15L).map(u => (ts(1), u)).toDF("ts", "user_id"), k = 4)
        .select("n_cand", "kth_hash", "est_users").head()
      assert(streamed == batch,
        s"incremental sketch $streamed must equal one-shot batch sketch $batch")
      assert(streamed.getInt(0) == 4, "6 distinct users must fill the k=4 sketch")
    } finally q.stop()
  }

  test("streaming HLL register sketch: incremental micro-batches equal the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, Long)]
    val df = src.toDF().toDF("ts", "user_id")
    val q = EventStreams.startToMemory(
      EventStreams.hourlyDistinctUsersHll(df), "hll_test", OutputMode.Complete())
    try {
      // the register state must merge by element-wise max across
      // micro-batches (with repeated users) to the one-shot answer
      src.addData((ts(1), 10L), (ts(2), 11L), (ts(3), 12L), (ts(4), 10L))
      q.processAllAvailable()
      src.addData((ts(5), 13L), (ts(6), 14L), (ts(7), 15L), (ts(8), 11L))
      q.processAllAvailable()
      val streamed = spark.table("hll_test")
        .select("v_zero", "s_units", "est_users").head()
      val batch = EventStreams.hourlyDistinctUsersHll(
          (10L to 15L).map(u => (ts(1), u)).toDF("ts", "user_id"))
        .select("v_zero", "s_units", "est_users").head()
      assert(streamed == batch,
        s"incremental registers $streamed must equal one-shot batch $batch")
      // 6 distinct users, 512 registers -> linear-counting regime;
      // register-index collisions can shave ~1 (here 2 of the 6 users
      // share an index: 505..507 empty registers are all plausible)
      assert(math.abs(streamed.getDouble(2) - 6.0) <= 1.5, s"$streamed")
      assert(streamed.getInt(0) >= 512 - 6 && streamed.getInt(0) < 512, s"$streamed")
    } finally q.stop()
  }

  test("streaming hourly OOV drift: incremental micro-batches equal the batch census") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, String)]
    val df = src.toDF().toDF("ts", "props")
    val vocab = Seq("alpha", "beta").toDF("tok") // the static broadcast side
    val q = EventStreams.startToMemory(
      EventStreams.hourlyOovRate(df, vocab), "oov_test", OutputMode.Complete())
    try {
      src.addData((ts(1), "alpha beta"), (ts(2), "alpha zzz"))
      q.processAllAvailable()
      src.addData((ts(3), "qqq; beta!"), (ts(4), "alpha"))
      q.processAllAvailable()
      val streamed = spark.table("oov_test")
        .select("n_tokens", "n_oov", "oov_rate").head()
      val batch = EventStreams.hourlyOovRate(
          Seq((ts(1), "alpha beta"), (ts(2), "alpha zzz"),
            (ts(3), "qqq; beta!"), (ts(4), "alpha")).toDF("ts", "props"), vocab)
        .select("n_tokens", "n_oov", "oov_rate").head()
      assert(streamed == batch,
        s"incremental census $streamed must equal one-shot batch $batch")
      // 7 tokens, 2 OOV (zzz, qqq); punctuation splits away
      assert(streamed.getLong(0) == 7L && streamed.getLong(1) == 2L, s"$streamed")
    } finally q.stop()
  }

  test("hopping windows: each event lands in 4 overlapping windows, incremental equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, String, Double)]
    val df = src.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.startToMemory(
      EventStreams.hoppingCounts(df), "hop_test", OutputMode.Complete())
    try {
      src.addData((ts(1), "click", 1.0), (ts(2), "view", 1.0))
      q.processAllAvailable()
      src.addData((ts(3), "click", 1.0))
      q.processAllAvailable()
      val streamed = spark.table("hop_test")
        .select("win_start", "event_type", "n").collect().toSet
      val batch = EventStreams.hoppingCounts(
          Seq((ts(1), "click", 1.0), (ts(2), "view", 1.0), (ts(3), "click", 1.0))
            .toDF("ts", "event_type", "value"))
        .select("win_start", "event_type", "n").collect().toSet
      assert(streamed == batch, s"incremental hopping diverged:\n$streamed\nvs\n$batch")
      // overlap arithmetic: every event contributes to exactly 4 windows
      val totalRows = spark.table("hop_test")
        .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
      assert(totalRows == 3L * 4L,
        s"3 events x 4 overlapping windows expected, counted $totalRows")
    } finally q.stop()
  }

  test("stream-static enrichment: broadcast dim join, incremental equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dims = Seq((1L, "AUTO"), (2L, "RETAIL"), (3L, "AUTO"))
      .toDF("c_custkey", "c_mktsegment")
    val src = MemoryStream[(Timestamp, Long, Double)]
    val df = src.toDF().toDF("ts", "user_id", "value")
    val q = EventStreams.startToMemory(
      EventStreams.enrichedHourlySegments(df, dims),
      "enrich_test", OutputMode.Complete())
    try {
      src.addData((ts(1), 1L, 10.0), (ts(2), 2L, 5.0))
      q.processAllAvailable()
      // second micro-batch: same segment via a DIFFERENT key (3 is
      // AUTO like 1) and an un-dimensioned key 99 that must drop
      src.addData((ts(3), 3L, 2.0), (ts(4), 99L, 100.0))
      q.processAllAvailable()
      val streamed = spark.table("enrich_test")
        .select("hour_start", "segment", "n", "sum_value").collect().toSet
      val all = Seq((ts(1), 1L, 10.0), (ts(2), 2L, 5.0),
        (ts(3), 3L, 2.0), (ts(4), 99L, 100.0)).toDF("ts", "user_id", "value")
      val batch = EventStreams.enrichedHourlySegments(all, dims)
        .select("hour_start", "segment", "n", "sum_value").collect().toSet
      assert(streamed == batch, s"incremental enrichment diverged:\n$streamed\nvs\n$batch")
      // the un-dimensioned event dropped; AUTO merged keys 1 and 3
      val auto = streamed.filter(_.getString(1) == "AUTO").map(r => (r.getLong(2), r.getDouble(3)))
      assert(auto == Set((2L, 12.0)), s"AUTO rollup wrong: $auto")
      assert(!streamed.exists(_.getDouble(3) == 100.0), "key 99 must not survive the enrichment join")
    } finally q.stop()
  }

  test("streaming Count-Min grid: incremental micro-batches equal the batch grid") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val src = MemoryStream[(Timestamp, Long)]
    val df = src.toDF().toDF("ts", "user_id")
    val q = EventStreams.startToMemory(
      EventStreams.hourlyFreqGrid(df, col("user_id"), width = 8),
      "cms_test", OutputMode.Complete())
    try {
      // repeated hot key 10 across two micro-batches: the grid counts
      // must merge incrementally to exactly the one-shot batch grid
      src.addData((ts(1), 10L), (ts(2), 11L), (ts(3), 10L))
      q.processAllAvailable()
      src.addData((ts(4), 10L), (ts(5), 12L), (ts(6), 11L))
      q.processAllAvailable()
      val streamed = spark.table("cms_test")
        .select("hour_start", "row", "bucket", "cnt").collect().toSet
      val batch = EventStreams.hourlyFreqGrid(
          Seq((ts(1), 10L), (ts(2), 11L), (ts(3), 10L),
            (ts(4), 10L), (ts(5), 12L), (ts(6), 11L)).toDF("ts", "user_id"),
          col("user_id"), width = 8)
        .select("hour_start", "row", "bucket", "cnt").collect().toSet
      assert(streamed == batch,
        s"incremental grid must equal the one-shot batch grid:\n$streamed\nvs\n$batch")
      // the hot key's estimate from the emitted grid is exact here
      // (no colliding keys in any of its buckets at this tiny load):
      // min over the 4 rows of key 10's buckets == its true count 3
      val grid = spark.table("cms_test")
      val est = graft.operators.Sketches.CountMin.estimates(
          grid.select("row", "bucket", "cnt"),
          Seq(10L).toDF("k"), col("k"), width = 8)
        .head().getLong(1)
      assert(est == 3L, s"hot-key estimate from the streamed grid: $est != 3")
    } finally q.stop()
  }

  test("streaming exact dedup: duplicate texts drop, state bounded by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, Long, String)]
    val df = src.toDF().toDF("ts", "doc_id", "text")
    val q = EventStreams.startToMemory(
      EventStreams.dedupByContent(df, watermark = "30 minutes"), "dedup_test")
    try {
      src.addData((ts(0), 1L, "alpha"), (ts(1), 2L, "beta"), (ts(2), 3L, "alpha"))
      q.processAllAvailable()
      // duplicate "alpha" within the watermark window is dropped
      assert(spark.table("dedup_test").select("text").collect().map(_.getString(0)).sorted.toSeq
        == Seq("alpha", "beta"))
      // advance event time far past the watermark horizon: the state
      // for "alpha" has expired, so a re-arrival passes again — the
      // bounded-state semantics that keep this runnable forever
      src.addData((Timestamp.from(ts(2).toInstant.plusSeconds(7200)), 4L, "alpha"))
      q.processAllAvailable()
      src.addData((Timestamp.from(ts(2).toInstant.plusSeconds(7260)), 5L, "alpha"))
      q.processAllAvailable()
      val texts = spark.table("dedup_test").select("text").collect().map(_.getString(0))
      assert(texts.count(_ == "alpha") == 2,
        s"expired-state re-arrival must pass once more, got ${texts.toSeq}")
    } finally q.stop()
  }

  test("streaming near-dup screen: perturbed re-crawl drops, distinct text passes, expired state re-admits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a long non-repeating token stream and a ONE-token perturbation of
    // it: the SimHash majority vote absorbs the 3 changed shingles, so
    // the fingerprints collide — the near-dup case byte-exact dedup
    // misses. The collision is asserted as a precondition so the test
    // can never silently gate the exact-dup path instead.
    val base = (0 until 100).map(i => s"tok$i").mkString(" ")
    val distinct_ = (0 until 100).map(i => s"other$i").mkString(" ")
    // whitespace churn: doubled/newline-swapped interior separators —
    // the classic re-crawl noise. The \s+ tokenizer collapses interior
    // runs (Spark's split keeps a TRAILING empty token, so trailing
    // junk is not invariant — interior churn is), making the shingle
    // set (hence the fingerprint) IDENTICAL while the bytes (hence
    // content_hash) are not — the case the exact screen passes and
    // this screen drops.
    val nearDup = base.replace(" tok50 ", "  tok50\n ").replace(" tok80 ", " \t tok80 ")
    val fps = graft.operators.MinHash
      .simHashTable(Seq((1L, base), (2L, nearDup), (3L, distinct_)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fps(1L) == fps(2L),
      s"precondition: whitespace churn must be fingerprint-invariant, got ${fps(1L)} vs ${fps(2L)}")
    assert(fps(1L) != fps(3L), "precondition: the distinct text must not collide")
    assert(base != nearDup, "precondition: the bytes must differ (content_hash would pass it)")
    val src = MemoryStream[(Timestamp, Long, String)]
    val df = src.toDF().toDF("ts", "doc_id", "text")
    val q = EventStreams.startToMemory(
      EventStreams.dedupByFingerprint(df, watermark = "30 minutes"), "neardedup_test")
    try {
      src.addData((ts(0), 1L, base), (ts(1), 2L, nearDup), (ts(2), 3L, distinct_))
      q.processAllAvailable()
      val ids = spark.table("neardedup_test").select("doc_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 3L),
        s"near-dup must drop, distinct must pass: got ${ids.toSeq}")
      // past the watermark horizon the fingerprint state expires — the
      // bounded-state property that keeps the screen runnable forever
      src.addData((Timestamp.from(ts(2).toInstant.plusSeconds(7200)), 4L, base))
      q.processAllAvailable()
      src.addData((Timestamp.from(ts(2).toInstant.plusSeconds(7260)), 5L, nearDup))
      q.processAllAvailable()
      val n = spark.table("neardedup_test").count()
      assert(n == 3L, s"expired-state re-arrival must pass exactly once more, got $n rows")
    } finally q.stop()
  }

  test("session windows split on the inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, Long)]
    val df = src.toDF().toDF("ts", "user_id")
    val q = EventStreams.startToMemory(
      EventStreams.sessionWindows(df), "sessions_test", OutputMode.Complete())
    try {
      // user 1: two events 5 min apart (one session), then one 50 min
      // later (second session)
      src.addData((ts(0), 1L), (ts(5), 1L), (ts(55), 1L))
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM sessions_test WHERE user_id = 1").collect()(0).getLong(0)
      assert(n == 2L, s"expected 2 sessions, got $n")
    } finally q.stop()
  }

  test("stream-stream join matches within the horizon, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val buys = MemoryStream[(Timestamp, Long, Long)]
    val q = EventStreams.startToMemory(
      EventStreams.correlateWithin(
        clicks.toDF().toDF("ts", "user_id", "event_id"),
        buys.toDF().toDF("ts", "user_id", "event_id"),
        horizon = "30 minutes", watermark = "2 hours"),
      "sjoin_test")
    try {
      clicks.addData((ts(0), 1L, 100L), (ts(0), 2L, 101L), (ts(10), 3L, 102L))
      q.processAllAvailable()
      // the matching purchase arrives in a LATER micro-batch — the
      // buffered left state must still pair it
      buys.addData((ts(20), 1L, 200L))
      q.processAllAvailable()
      // outside the horizon (45 min after the click) and before the
      // click: both excluded
      buys.addData((ts(45), 2L, 201L), (ts(5), 3L, 202L))
      q.processAllAvailable()
      val rows = spark.table("sjoin_test")
        .select("user_id", "l_id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 100L, 200L)), s"got $rows")
    } finally q.stop()
  }

  test("left-outer stream join: null-padding waits for the watermark, then emits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val buys = MemoryStream[(Timestamp, Long, Long)]
    val q = EventStreams.startToMemory(
      EventStreams.correlateLeftOuter(
        clicks.toDF().toDF("ts", "user_id", "event_id"),
        buys.toDF().toDF("ts", "user_id", "event_id"),
        horizon = "30 minutes", watermark = "10 minutes"),
      "souter_test")
    def rows() = spark.table("souter_test")
      .select("user_id", "l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    try {
      // user 1 converts; user 2's click has no partner
      clicks.addData((ts(0), 1L, 100L), (ts(0), 2L, 101L))
      buys.addData((ts(5), 1L, 200L))
      q.processAllAvailable()
      // the unmatched click is NOT yet declarable: the watermark
      // (10:05 − 10 min = 09:55) hasn't passed its horizon (10:30) —
      // a partner could still arrive. Matches emit immediately.
      assert(rows() == Set((1L, 100L, 200L)), s"got ${rows()}")
      // two far-future batches: the first lifts the watermark past
      // every horizon at the NEXT batch (the watermark a batch uses is
      // computed from the batches before it), the second is that next
      // batch — it starts from the lifted watermark and must evict the
      // unmatched click as a null-padded row before its own commit
      // (the q_stream_outer sentinel-file mechanics, pinned here
      // against MemoryStream ground truth)
      val far = Timestamp.from(ts(0).toInstant.plusSeconds(4 * 3600))
      val farther = Timestamp.from(ts(0).toInstant.plusSeconds(8 * 3600))
      clicks.addData((far, 9L, 900L)); buys.addData((far, 8L, 901L))
      q.processAllAvailable()
      clicks.addData((farther, 7L, 700L)); buys.addData((farther, 6L, 701L))
      q.processAllAvailable()
      assert(rows().contains((2L, 101L, -1L)),
        s"watermark-evicted unmatched click must emit null-padded, got ${rows()}")
      assert(!rows().exists(r => r._2 == 100L && r._3 == -1L),
        "a matched left row must never ALSO emit null-padded")
    } finally q.stop()
  }

  test("sessionizeWithState: gap closes inline, open tail emits only via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[EventStreams.SessEvent]
    val q = EventStreams.sessionizeWithState(src.toDS(), gapMinutes = 30,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_state_test")
      .outputMode(OutputMode.Append()).start()
    def rows() = spark.table("sess_state_test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def us(t: Timestamp) = t.getTime * 1000L
    try {
      // user 1: two events 5 min apart, then one 50 min later — the
      // third event CLOSES the first session inline (gap exceeded
      // inside the batch) and opens a second
      src.addData(EventStreams.SessEvent(1L, ts(0), 1L),
        EventStreams.SessEvent(1L, ts(5), 2L),
        EventStreams.SessEvent(1L, ts(55), 3L))
      q.processAllAvailable()
      val gapUs = 30L * 60 * 1000000
      assert(rows() == Set((1L, us(ts(0)), us(ts(5)) + gapUs, 2L)),
        s"only the gap-closed session may emit; the open tail must wait: ${rows()}")
      // two far-future batches: the first lifts the watermark, the
      // second starts from it — the armed timeout fires with NO data
      // for user 1 and the final session emits from state expiry
      val far = Timestamp.from(ts(0).toInstant.plusSeconds(4 * 3600))
      val farther = Timestamp.from(ts(0).toInstant.plusSeconds(8 * 3600))
      src.addData(EventStreams.SessEvent(9L, far, 90L))
      q.processAllAvailable()
      src.addData(EventStreams.SessEvent(9L, farther, 91L))
      q.processAllAvailable()
      assert(rows().contains((1L, us(ts(55)), us(ts(55)) + gapUs, 1L)),
        s"the timed-out open tail must emit its final session: ${rows()}")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[UserEvent]
    val q = EventStreams.runningUserTotals(src.toDS()).writeStream
      .format("memory").queryName("totals_test").outputMode(OutputMode.Update()).start()
    try {
      src.addData(UserEvent(1L, ts(0), 2.0), UserEvent(1L, ts(1), 3.0))
      q.processAllAvailable()
      src.addData(UserEvent(1L, ts(2), 5.0))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT n_events, total_value FROM totals_test WHERE user_id = 1 ORDER BY n_events DESC LIMIT 1")
        .collect()(0)
      assert(last.getLong(0) == 3L && last.getDouble(1) == 10.0)
    } finally q.stop()
  }

  test("streaming last-touch attribution: window crediting, cross-batch " +
      "state carry, per-user isolation, and expired-touch none-crediting") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(day: Int, hhmm: String): Timestamp =
      Timestamp.valueOf(f"2024-01-0$day%d $hhmm:00")
    val src = MemoryStream[EventStreams.TouchEvent]
    val name = "attr_state_test"
    val q = EventStreams.attributeLastTouch(src.toDS(),
        windowMinutes = 60, watermark = "0 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 clicks; user 2 purchases with NO prior touch
      src.addData(
        EventStreams.TouchEvent(1L, at(1, "10:00"), 1L, "click", 0.0),
        EventStreams.TouchEvent(2L, at(1, "10:05"), 2L, "purchase", 3.0))
      q.processAllAvailable()
      // batch 2: user 1 purchases 30 min after the click (state carried
      // ACROSS batches, inside the 60-min window -> credits click);
      // then purchases again 2 h later -> window expired -> none
      src.addData(
        EventStreams.TouchEvent(1L, at(1, "10:30"), 3L, "purchase", 5.0),
        EventStreams.TouchEvent(1L, at(1, "12:30"), 4L, "purchase", 7.0))
      q.processAllAvailable()
      val rows = spark.table(name)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows == Set(
        (2L, "none", 3.0),
        (1L, "click", 5.0),
        (1L, "none", 7.0)), s"got $rows")
    } finally q.stop()
  }

  test("streaming attribution: in-batch ordering and touch replacement") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(hhmm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val src = MemoryStream[EventStreams.TouchEvent]
    val name = "attr_order_test"
    val q = EventStreams.attributeLastTouch(src.toDS(),
        windowMinutes = 60, watermark = "0 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // one batch, deliberately unordered input: view -> signup -> buy;
      // the callback's (ts, event_id) sort must credit signup, and a
      // second buy still credits signup (touch persists until replaced)
      src.addData(
        EventStreams.TouchEvent(1L, at("10:20"), 3L, "purchase", 1.0),
        EventStreams.TouchEvent(1L, at("10:00"), 1L, "view", 0.0),
        EventStreams.TouchEvent(1L, at("10:10"), 2L, "signup", 0.0),
        EventStreams.TouchEvent(1L, at("10:25"), 4L, "purchase", 2.0))
      q.processAllAvailable()
      val rows = spark.table(name)
        .collect().map(r => (r.getString(1), r.getDouble(2))).toSet
      assert(rows == Set(("signup", 1.0), ("signup", 2.0)), s"got $rows")
    } finally q.stop()
  }

  test("streaming secret screen: the map-only scan emits flagged rows incrementally, " +
    "identical to the batch operator") {
    import spark.implicits._
    import graft.operators.Curation
    implicit val sqlCtx = spark.sqlContext
    val key = "a3f8c2e917b4d605a3f8c2e917b4d605"
    val src = MemoryStream[(Long, String)]
    val name = "secrets_inc"
    val q = Curation.secretScan(src.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      src.addData((1L, s"rotate $key now"), (2L, "plain words only here"))
      q.processAllAvailable()
      assert(spark.table(name).collect().map(_.getString(1)).toSeq == Seq(key),
        "batch 1 must flag in-flight")
      src.addData((3L, s"another leak $key today"))
      q.processAllAvailable()
      val got = spark.table(name).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = Curation.secretScan(
        Seq((1L, s"rotate $key now"), (2L, "plain words only here"),
          (3L, s"another leak $key today")).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == batch, s"streaming $got != batch $batch")
    } finally q.stop()
  }
}
