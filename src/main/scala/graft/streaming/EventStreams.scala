package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream (extension —
  * the reference is batch-only, SURVEY.md §2.1 "Streaming: none").
  *
  * Each transform takes a DataFrame so the SAME code path serves both
  * `spark.readStream` (production) and batch DataFrames (backfill +
  * tests) — the Structured Streaming unification. Watermarks bound
  * state: at 100 TB/day the per-key state store only retains windows
  * newer than the watermark horizon.
  */
object EventStreams {

  /** Tumbling 1-hour counts per event type with a 10-minute watermark
    * for late data. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // decimal-cast sum: deterministic across partition orders (and
      // engine-comparable in the batch/backfill oracle)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** HOPPING (sliding) 1-hour windows every 15 minutes: each event
    * lands in exactly 4 overlapping windows — the smoothing view a
    * rate monitor reads, distinct semantics from the tumbling form
    * (state is 4× the tumbling row count, still O(windows·types),
    * watermark retires windows as they close). Same transform batch
    * and streaming; window assignment is epoch-aligned in both
    * engines, so the oracle replays it as `time_bucket(15min) −
    * j·15min` for j ∈ 0..3. */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Stream-static enrichment join + windowed rollup: the canonical
    * "join the live event stream to a slowly-changing dimension"
    * shape (events → customer → market segment here). The static side
    * is dimension-sized by contract and BROADCASTS — re-resolved each
    * micro-batch, so a dimension refresh is picked up without a
    * restart and the stream side never shuffles for the join; the
    * only streaming state is the windowed aggregate's, O(windows ×
    * segments) under the watermark. Inner join: an event without a
    * dimension row carries no segment and drops (the enrichment
    * contract). Same transform batch and streaming. */
  def enrichedHourlySegments(events: DataFrame, dims: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .join(broadcast(dims.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"),
        col("c_mktsegment").as("segment"), col("n"), col("sum_value"))

  /** Hourly out-of-vocabulary drift — the LIVE tokenizer-coverage
    * monitor ([[graft.queries.TextQueries.qOovRate]]'s streaming
    * twin): event-payload tokens left-joined against a BROADCAST
    * static vocabulary, per-hour token/OOV census. A rising hourly
    * OOV rate is the earliest signal that live traffic drifted away
    * from the corpus the tokenizer/vocab was fit on. State is
    * O(windows) counters under the watermark; the vocabulary is the
    * static side of a stream-static broadcast join (no stream
    * shuffle on token); same transform batch and streaming. */
  def hourlyOovRate(events: DataFrame, vocab: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .select(col("ts"), explode(filter(
        split(lower(col("props")), "[^a-z0-9]+"), t => t =!= "")).as("tok"))
      .join(broadcast(vocab.select(col("tok"), lit(true).as("__in"))),
        Seq("tok"), "left")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(sum(when(col("__in").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_oov"))
      .select(col("window.start").as("hour_start"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)
          .as("oov_rate"))

  /** Gap-based session windows (30-min inactivity) per user — the
    * streaming twin of RelationalQueries.qEventsSessions. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Per-hour Count-Min frequency grid over the user-id stream — the
    * windowed FREQUENCY sketch beside [[hourlyDistinctUsers]]'s
    * cardinality one: each event explodes to its d (row, bucket)
    * coordinates ([[graft.operators.Sketches.CountMin]]'s
    * deterministic row family), then a plain windowed count
    * aggregates them — so the per-window state is the O(d·w) grid
    * (bounded forever, watermark retires windows) and the key
    * universe never enters state, where a per-key windowed count
    * would buffer every hot-key stream key. Point estimates replay
    * offline from the emitted grid (min over rows). Same transform
    * batch and streaming. */
  def hourlyFreqGrid(events: DataFrame, fp: org.apache.spark.sql.Column,
      width: Int = 16): DataFrame = {
    import graft.operators.Sketches.CountMin
    val coords = array(
      (0 until CountMin.Depth).map(j => CountMin.bucket(fp, j, width)): _*)
    events
      .withWatermark("ts", "10 minutes")
      .select(col("ts"), posexplode(coords).as(Seq("row", "bucket")))
      .groupBy(window(col("ts"), "1 hour"), col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour_start"),
        col("row"), col("bucket"), col("cnt"))
  }

  /** Per-hour distinct users via the HyperLogLog REGISTER aggregate
    * ([[graft.operators.Sketches.HllAggregator]] — the register-state
    * sibling of [[hourlyDistinctUsers]]'s bottom-k): per-window state
    * is the fixed 2^p register array merged by element-wise max, so
    * late-arriving micro-batches fold in idempotently and the
    * watermark retires windows. Deterministic md5 fingerprint ⇒ every
    * window's registers and estimate replay in the oracle. */
  def hourlyDistinctUsersHll(events: DataFrame): DataFrame = {
    import graft.operators.Sketches
    val hll = Sketches.hllAgg()
    events
      .withWatermark("ts", "10 minutes")
      .filter(col("user_id").isNotNull)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(hll(Sketches.stringFingerprint(col("user_id").cast("string"))).as("sk"))
      .select(
        col("window.start").as("hour_start"),
        col("sk._1").as("v_zero"),
        col("sk._2").as("s_units"),
        col("sk._3").as("est_users"))
  }

  /** Per-hour approximate distinct users via the KMV sketch aggregate
    * ([[graft.operators.Sketches.KmvAggregator]]): the window's state
    * is the k smallest distinct user-hashes — O(k) per window forever,
    * where a `count(distinct)` stream would buffer every key — and the
    * watermark retires windows. Same code path batch and streaming;
    * the deterministic hash makes the sketch oracle-replayable. */
  def hourlyDistinctUsers(events: DataFrame, k: Int = 8): DataFrame = {
    import graft.operators.Sketches
    val kmv = Sketches.kmvAgg(k)
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(kmv(Sketches.hashExpr(col("user_id"))).as("sk"))
      .select(
        col("window.start").as("hour_start"),
        col("sk._1").as("n_cand"),
        col("sk._2").as("kth_hash"),
        Sketches.estFromSketch(k, col("sk._1"), col("sk._2")).as("est_users"))
  }

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserStat(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state: running per-user totals via
    * mapGroupsWithState — the KeyValueGroupedDataset surface for logic
    * window/session operators can't express. */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          batch.foreach { e => n += 1; tot += e.value }
          val next = UserStat(uid, n, tot)
          state.update(next)
          next
      }
  }

  final case class UserRunning(user_id: Long, n_events: Long, max_value: Double)

  /** Keyed custom state under the oracle gate: per-user running event
    * count and max value via mapGroupsWithState. Both accumulators are
    * arrival-order independent (count, max) — unlike a double sum,
    * whose accumulation order would differ run to run — so the final
    * state is deterministic regardless of partitioning or micro-batch
    * structure, which is what makes a DuckDB oracle valid for it.
    * State is O(1) per user. */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, Double.NegativeInfinity))
          var n = prev.n_events
          var mx = prev.max_value
          batch.foreach { e => n += 1; if (e.value > mx) mx = e.value }
          val next = UserRunning(uid, n, mx)
          state.update(next)
          next
      }
  }

  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  final case class SessState(start_us: Long, last_us: Long, n: Long)
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  private def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Gap-based sessionization through the CUSTOM-state API —
    * flatMapGroupsWithState with an EVENT-TIME TIMEOUT — the one
    * stateful-streaming surface `session_window` can't demonstrate:
    * emission driven by STATE EXPIRY. Per user, the state is the open
    * session tail (start, last, count — O(1) per key); events extend
    * it or, past the gap, close it (closed sessions emit inline); and
    * the timeout is armed at `last + gap`, so when the WATERMARK
    * passes that point Spark fires the callback with `hasTimedOut`
    * and the final session emits with no further data — exactly when
    * no event could legally reopen it. State expiry, result
    * completeness, and the memory bound are all the same watermark
    * contract (the correlateLeftOuter argument, on the custom-state
    * surface).
    *
    * Within a micro-batch the group's events sort by (ts, event_id)
    * in memory — bounded by the micro-batch, the standard
    * custom-sessionization shape; across batches the state carries
    * only the open tail, and an event older than the watermark
    * arriving out of order is the documented streaming-sessionization
    * exclusion (the watermark is what makes `hasTimedOut` final).
    * Output matches the batch gap-sessionization exactly: end = last
    * event + gap, sessions merge at exactly-gap spacing (strict `>`
    * opens a new one). */
  def sessionizeWithState(events: Dataset[SessEvent],
      gapMinutes: Int = 30,
      watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          val evs = it.toArray.sortBy(e => (tsMicros(e.ts), e.event_id))
          if (evs.isEmpty) {
            // only reachable via timeout: the watermark passed
            // last + gap, so the open tail is final
            val out = state.getOption.map(s =>
              Session(uid, s.start_us, s.last_us + gapUs, s.n)).iterator
            state.remove()
            out
          } else {
            val closed = scala.collection.mutable.ArrayBuffer[Session]()
            var cur = state.getOption.orNull
            for (e <- evs) {
              val us = tsMicros(e.ts)
              if (cur == null) cur = SessState(us, us, 1L)
              else if (us - cur.last_us > gapUs) {
                closed += Session(uid, cur.start_us, cur.last_us + gapUs, cur.n)
                cur = SessState(us, us, 1L)
              } else cur = SessState(cur.start_us, math.max(cur.last_us, us), cur.n + 1L)
            }
            state.update(cur)
            // arm the expiry at the open tail's horizon (ms precision
            // is all the API offers; the flush batch's watermark jump
            // dwarfs the sub-ms truncation)
            state.setTimeoutTimestamp((cur.last_us + gapUs) / 1000L)
            closed.iterator
          }
      }
  }

  final case class TouchEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String, value: Double)
  final case class TouchState(touch_type: String, touch_us: Long)
  final case class Credit(user_id: Long, touch_type: String, value: Double)

  /** STREAMING last-touch attribution with an attribution WINDOW —
    * the real-time twin of [[graft.operators.Attribution.lastTouch]],
    * carrying the industry-standard lookback the batch census skips:
    * a conversion credits the user's most recent prior non-conversion
    * touch only if it happened within `windowMinutes`; older (or
    * absent) touches credit `"none"`. Credits emit INLINE with their
    * conversion event (no watermark wait for results).
    *
    * The attribution window IS the state bound: per user the state is
    * ONE (touch_type, touch_us) pair, and the event-time timeout is
    * armed at touch + window — when the watermark passes that point
    * the state removes itself, which is semantically invisible
    * (in-order, any conversion arriving later is itself past the
    * window and credits "none" either way; out-of-order events older
    * than the watermark are the documented streaming exclusion, the
    * [[sessionizeWithState]] contract). Total state = O(users active
    * within the window), whatever the stream's lifetime.
    *
    * Within a micro-batch the group's events sort by (ts, event_id)
    * in memory — bounded by the micro-batch, same as
    * [[sessionizeWithState]]. */
  def attributeLastTouch(events: Dataset[TouchEvent],
      convType: String = "purchase",
      windowMinutes: Int = 2880,
      watermark: String = "10 minutes"): Dataset[Credit] = {
    import events.sparkSession.implicits._
    val wUs = windowMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Credit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[TouchEvent], state: GroupState[TouchState]) =>
          val evs = it.toArray.sortBy(e => (tsMicros(e.ts), e.event_id))
          if (evs.isEmpty) {
            // timeout: the watermark passed touch + window — no future
            // in-order conversion can credit this touch
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ArrayBuffer[Credit]()
            var cur = state.getOption.orNull
            for (e <- evs) {
              val us = tsMicros(e.ts)
              if (e.event_type == convType) {
                val credit =
                  if (cur != null && us - cur.touch_us <= wUs) cur.touch_type
                  else "none"
                out += Credit(uid, credit, e.value)
              } else cur = TouchState(e.event_type, us)
            }
            if (cur != null) {
              val toMs = (cur.touch_us + wUs) / 1000L
              // the API rejects a timeout at/below the watermark — an
              // already-expired touch just drops its state now
              if (toMs > state.getCurrentWatermarkMs()) {
                state.update(cur)
                state.setTimeoutTimestamp(toMs)
              } else state.remove()
            }
            out.iterator
          }
      }
  }

  /** Streaming exact dedup for document ingest: first event per
    * content hash passes, later duplicates drop, and — the part that
    * matters at 100 TB/day — the per-key state store retains a hash
    * only within the watermark horizon (dropDuplicatesWithinWatermark),
    * so state is bounded by the duplicate-arrival window, not the
    * stream's lifetime. The batch twin is
    * [[graft.operators.Dedup.exactDupGroups]]; near-dup streaming
    * dedup composes this with the SimHash fingerprint as the key. */
  def dedupByContent(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming NEAR-dup novelty screen: watermark-bounded
    * deduplication on the 64-bit SimHash fingerprint instead of the
    * content hash — drops, in flight, the re-crawls whose perturbation
    * is invisible to the \s+ shingle tokenizer (whitespace churn,
    * trailing junk — fingerprint IDENTICAL) plus any text close enough
    * to collide on all 64 majority votes, both of which byte-exact
    * [[dedupByContent]] passes through. SimHash collisions conflate
    * only near-identical texts by construction (Manku et al. WWW'07).
    * Honesty note (measured in the spec): a one-TOKEN edit on a
    * ~200-shingle doc flips a few fingerprint bits, so equality-keyed
    * streaming dedup does NOT catch it — hamming-tolerant matching
    * needs the banded structure, which is the in-corpus
    * q_dedup_simhash_pairs arm; this screen is the cheap in-flight
    * admission filter in front of it.
    *
    * State shape: one row per distinct fingerprint inside the
    * watermark horizon — O(distinct-fingerprints/horizon), the same
    * bounded-state contract as dedupByContent; the fingerprint itself
    * is the [[graft.operators.MinHash.simHashCols]] map-only
    * expression chain, so the only stateful operator is the dedup. */
  def dedupByFingerprint(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      watermark: String = "1 hour"): DataFrame = {
    import graft.operators.{Dedup, MinHash}
    // the shingle-hash array materializes as ONE column: the emptiness
    // screen and the fingerprint both read it (filtering on a separate
    // shingle expression would shingle every row twice — Spark does
    // not CSE across the filter/project boundary)
    docs
      .withColumn("__hs",
        transform(Dedup.shingles(col(textCol), 3), s => MinHash.polyHash(s)))
      .filter(size(col("__hs")) > 0)
      .withColumn("__sim", MinHash.simHash(col("__hs")))
      .select(col("*"), col("__sim")(0).as("sim_hi"), col("__sim")(1).as("sim_lo"))
      .drop("__sim", "__hs")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("sim_hi", "sim_lo")
  }

  /** Streaming crawl-frontier discovery: pages arrive as a stream
    * (the crawl IS a stream — captures land continuously), outlinks
    * extract map-only ([[graft.operators.HtmlExtract.extractLinks]]),
    * resolve/normalize against the page's base URL
    * ([[graft.operators.UrlParse.resolve]]), and the frontier dedups
    * in flight on the NORMALIZED url — a URL seen from ten thousand
    * pages schedules once. State is one row per distinct frontier URL
    * inside the watermark horizon (the recrawl-eligibility window: a
    * URL older than the horizon may re-enter the frontier, which is
    * exactly recrawl semantics — bounded state and refresh policy are
    * the same knob). The only stateful operator is the dedup;
    * everything upstream rides the micro-batch map-side. */
  def discoverFrontier(
      pages: DataFrame,
      baseCol: Column,
      htmlCol: Column,
      tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    pages
      .select(col(tsCol), baseCol.as("__base"),
        explode(graft.operators.HtmlExtract.extractLinks(htmlCol)).as("__href"))
      .select(col(tsCol),
        graft.operators.UrlParse.resolve(col("__base"), col("__href")).as("url"))
      .filter(col("url").isNotNull)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("url")

  /** Stream-stream inner join: each left event pairs with the right
    * events of the same key whose time falls in [l.ts, l.ts + horizon]
    * — attribution-style correlation (click → purchase within 30 min).
    * Both sides carry watermarks and the join condition carries the
    * time range, which is what lets Structured Streaming bound the
    * buffered state to watermark + horizon instead of the whole stream
    * — the property that keeps a 100 TB/day two-stream join finite.
    * Works identically over batch DataFrames (backfill/oracle twin). */
  def correlateWithin(
      left: DataFrame,
      right: DataFrame,
      key: String = "user_id",
      idCol: String = "event_id",
      horizon: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(key).as("__k"), col("ts").as("l_ts"), col(idCol).as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col(key).as("__rk"), col("ts").as("r_ts"), col(idCol).as("r_id"))
    l.join(r,
        col("__k") === col("__rk") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"))
      .select(col("__k").as(key), col("l_id"), col("r_id"))
  }

  /** Stream-stream LEFT OUTER join — [[correlateWithin]]'s sibling for
    * the question inner join structurally cannot answer: which left
    * events found NO partner ("clicks that never converted")? A
    * matched pair emits in the micro-batch where both sides are
    * present, exactly like the inner join; an UNMATCHED left row is a
    * negative that can only be declared once the watermark proves no
    * qualifying right row can still arrive — Structured Streaming
    * emits it null-padded when the watermark passes `l.ts + horizon`,
    * the same moment the row's buffered state retires. So the state
    * bound AND the completeness of the "never converted" answer are
    * the same watermark contract: at 100 TB/day both sides buffer only
    * watermark + horizon of data, and every older left row has either
    * matched or been emitted null-padded (eviction timing is pinned
    * against a real MemoryStream run in StreamingSpec).
    *
    * Output: `(key, l_id, r_id)` with `r_id` NULL on the null-padded
    * rows. Works identically over batch DataFrames (left join). */
  def correlateLeftOuter(
      left: DataFrame,
      right: DataFrame,
      key: String = "user_id",
      idCol: String = "event_id",
      horizon: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(key).as("__k"), col("ts").as("l_ts"), col(idCol).as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col(key).as("__rk"), col("ts").as("r_ts"), col(idCol).as("r_id"))
    l.join(r,
        col("__k") === col("__rk") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"),
        "leftOuter")
      .select(col("__k").as(key), col("l_id"), col("r_id"))
  }

  /** Late-data census — the batch-replayable AUDIT of what a
    * watermarked streaming windowed aggregate would drop, given an
    * explicit micro-batch assignment (`batchCol` — in production the
    * ingestion system's batch/file id; here a deterministic replay
    * key). Structured Streaming's contract, replayed exactly:
    * the watermark at the START of batch b is `max(event time over
    * batches < b) − delay` (never the current batch's own data), and
    * a row is DROPPED iff its tumbling window has already been
    * finalized — `window_end(ts) ≤ watermark` (the boundary
    * convention is pinned empirically in StreamingSpec against a real
    * MemoryStream run). Answers the capacity-planning question "how
    * much data would we lose at delay D?" BEFORE changing production
    * delay — on historical data, in one batch query.
    *
    * Scale shape: one map-side-combined per-batch max, a #batches-row
    * running-max artifact that BROADCASTS back, and one map-only
    * classify + per-batch aggregate — two small shuffles total, no
    * window over the event rows themselves. */
  def lateDataCensus(events: DataFrame, batchCol: org.apache.spark.sql.Column,
      delay: String = "10 minutes", windowLen: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val b = events.withColumn("__b", batchCol.cast("int"))
    val wmTab = b.groupBy("__b").agg(max(col("ts")).as("__mx"))
      .select(col("__b"),
        (max(col("__mx")).over(
          W.orderBy("__b").rowsBetween(W.unboundedPreceding, -1))
          - expr(s"INTERVAL $delay")).as("__wm"))
    b.join(broadcast(wmTab), "__b")
      .withColumn("__wend", window(col("ts"), windowLen)("end"))
      .groupBy(col("__b").as("batch"))
      .agg(count(lit(1)).as("n_events"),
        coalesce(sum(when(col("__wend") <= col("__wm"), 1L).otherwise(0L)), lit(0L))
          .as("n_late"),
        unix_micros(min(col("__wm"))).as("wm_micros"))
      .orderBy("batch")
  }

  /** Wire a streaming query end-to-end (memory sink, for tests/demos). */
  def startToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append()) =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()
}
