package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory cardinality sketches for corpus QA at 100 TB
  * (extension — the reference's only census is an exact `len()`,
  * `/root/reference/src/lib.rs:350-352`).
  *
  * KMV (k-minimum-values) distinct counting, Bar-Yossef et al.
  * RANDOM'02: hash every key into [0, 2^32), keep only the k smallest
  * DISTINCT hash values, estimate |distinct| as (k−1)·2^32 / h_(k).
  * Unlike `COUNT(DISTINCT x)` — whose shuffle carries every distinct
  * key — the sketch's state is O(k) per task and O(k·#partitions)
  * total, and the final combine is a toy-sized sort. The deterministic
  * Knuth-remix hash (the [[Curation.hashBucket]] family) makes the
  * estimate reproducible run-to-run and exactly replayable by the
  * DuckDB oracle — a property no RNG-seeded sketch has.
  */
object Sketches {

  val HashMod = 4294967296L // 2^32

  /** KMV distinct-count sketch over a numeric key (string keys go
    * through [[kmvDistinctText]] — a non-numeric key here raises at
    * plan time rather than silently hashing NULLs). Returns ONE row:
    * `(k, kth_hash, est)` — when fewer than k distinct hashes exist
    * the sketch has seen everything and `est` is the exact count (the
    * standard KMV small-cardinality convention).
    *
    * Each input partition keeps a bounded TreeSet of its k smallest
    * distinct hashes (genuinely imperative per-partition state — the
    * documented mapPartitions niche); candidates (≤ k·#partitions
    * rows) then combine with a tiny distinct + sort. No stage ever
    * materializes the distinct key set. */
  def kmvDistinct(df: DataFrame, key: Column, k: Int = 256,
      mult: Long = 2654435761L, add: Long = 987654321L): DataFrame =
    bottomK(df, key, k, mult, add)
      .agg(count(lit(1)).as("__n"), max(col("hv")).as("kth_hash"))
      .select(lit(k).as("k"), col("kth_hash"), estExpr(k).as("est"))

  /** Deterministic string→long fingerprint for text-keyed sketches:
    * the first 15 hex chars of md5(UTF-8 bytes) parsed base-16 — a
    * uniform non-negative 60-bit long, exactly replayable by the
    * oracle as `('0x' || substr(md5(s), 1, 15))::BIGINT`. (xxhash64
    * would be cheaper per row but has no replayable twin in the
    * oracle engine; md5 exists in both with identical semantics.) */
  def stringFingerprint(key: Column): Column =
    conv(substring(md5(key.cast("binary")), 1, 15), 16, 10).cast("long")

  /** KMV distinct-count sketch over a STRING key — the sketch suite's
    * natural 100 TB input is token/shingle/url text, which the
    * numeric surface rejects. The md5 fingerprint IS the mix (no
    * Knuth remix: remixing a 60-bit value would overflow the oracle's
    * checked BIGINT arithmetic, and md5 already uniformizes), reduced
    * mod 2³² into the sketch's hash space. Same bounded machinery,
    * same estimator, same one-row output as [[kmvDistinct]]. */
  def kmvDistinctText(df: DataFrame, key: Column, k: Int = 256): DataFrame =
    bottomKHv(df, pmod(stringFingerprint(key), lit(HashMod)), k)
      .agg(count(lit(1)).as("__n"), max(col("hv")).as("kth_hash"))
      .select(lit(k).as("k"), col("kth_hash"), estExpr(k).as("est"))

  /** Cross-corpus overlap census from two KMV sketches over the SAME
    * hash family (the theta-sketch set-operation shape, Dasgupta et
    * al., "Theta Sketch Framework"): among the k smallest distinct
    * hashes of A ∪ B, every member's presence in A and in B is known
    * exactly (each side's own threshold is ≥ the union's), so the
    * matched fraction estimates Jaccard and `jaccard × est_union`
    * estimates the intersection — the contamination/coverage question
    * ("how much of corpus B is already in A?") answered from two O(k)
    * sketches, with neither corpus ever joined against the other.
    * Returns ONE row:
    * `(k, est_a, est_b, est_union, jaccard, est_common)`. */
  def kmvOverlap(dfA: DataFrame, keyA: Column, dfB: DataFrame, keyB: Column,
      k: Int = 256, mult: Long = 2654435761L, add: Long = 987654321L): DataFrame =
    overlapOf(bottomK(dfA, keyA, k, mult, add), bottomK(dfB, keyB, k, mult, add),
      dfA.sparkSession, k)

  /** [[kmvOverlap]] over STRING keys — both sides share the
    * [[stringFingerprint]] hash family (the theta-sketch requirement),
    * so e.g. shingle-level contamination between two text corpora
    * costs two O(k) sketches. */
  def kmvOverlapText(dfA: DataFrame, keyA: Column,
      dfB: DataFrame, keyB: Column, k: Int = 256): DataFrame =
    overlapOf(
      bottomKHv(dfA, pmod(stringFingerprint(keyA), lit(HashMod)), k),
      bottomKHv(dfB, pmod(stringFingerprint(keyB), lit(HashMod)), k),
      dfA.sparkSession, k)

  private def overlapOf(botA: DataFrame, botB: DataFrame,
      spark: org.apache.spark.sql.SparkSession, k: Int): DataFrame = {
    // each side's bottom-k feeds BOTH its own estimate and the union —
    // persist the ≤k-row candidate sets so each corpus scans exactly
    // once (the whole point of a sketch)
    val ba = botA.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bb = botB.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = ba.select(col("hv"), lit(1).as("in_a"), lit(0).as("in_b"))
    val b = bb.select(col("hv"), lit(0).as("in_a"), lit(1).as("in_b"))
    val union = a.unionByName(b)
      .groupBy("hv")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .orderBy("hv").limit(k)
    def sideEst(bot: DataFrame, alias: String) = bot
      .agg(count(lit(1)).as("__n"), max(col("hv")).as("kth_hash"))
      .select(estExpr(k).as(alias))
    val estA = sideEst(ba, "est_a")
    val estB = sideEst(bb, "est_b")
    val out = union
      .agg(
        count(lit(1)).as("__n"),
        max(col("hv")).as("kth_hash"),
        sum(col("in_a") * col("in_b")).as("__n_both"))
      .select(lit(k).as("k"), estExpr(k).as("est_union"),
        round(col("__n_both").cast("double") / col("__n"), 4).as("jaccard"),
        col("__n_both"), col("__n"))
      .crossJoin(estA).crossJoin(estB)
      .select(col("k"), col("est_a"), col("est_b"), col("est_union"),
        col("jaccard"),
        round(col("__n_both").cast("double") / col("__n") * col("est_union"), 2)
          .as("est_common"))
    // the census is ONE row — materialize it and release both cached
    // bottom-k candidate frames before returning, so repeated overlap
    // calls in a long-lived session never accumulate cached tables
    val rows = out.collect()
    ba.unpersist(blocking = false)
    bb.unpersist(blocking = false)
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** The KMV estimator over a bottom-k aggregate carrying `__n` (how
    * many distinct hashes the sketch holds) and `kth_hash`: exact when
    * the sketch saw everything, (k−1)·2³² / h_k when full. */
  private def estExpr(k: Int): Column =
    when(col("__n") < k, col("__n").cast("double"))
      .otherwise(round(
        lit((k - 1).toDouble) * lit(HashMod.toDouble) / col("kth_hash"), 2))

  /** The deterministic Knuth-remix hash every KMV surface shares. */
  def hashExpr(key: Column, mult: Long = 2654435761L, add: Long = 987654321L): Column =
    pmod(key.cast("long") * mult + add, lit(HashMod))

  /** The KMV estimator from a sketch's (candidate count, k-th hash):
    * exact when the sketch saw everything, (k−1)·2³²/h_k when full. */
  def estFromSketch(k: Int, nCand: Column, kth: Column): Column =
    when(nCand < k, nCand.cast("double"))
      .otherwise(round(lit((k - 1).toDouble) * lit(HashMod.toDouble) / kth, 2))

  /** Grouped/streaming KMV sketch as an Aggregator: the bounded
    * sorted-distinct bottom-k buffer merges associatively and
    * commutatively, so it runs map-side-combined in batch `groupBy`
    * AND incrementally inside Structured Streaming's stateful
    * aggregation — per-group state is O(k) forever, the property that
    * lets a watermark-bounded stream count distincts without keeping
    * the key set. Output: (n_cand, kth_hash). */
  final class KmvAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, List[Long], (Int, Long)] {
    require(k >= 2, s"k must be >= 2, got $k")
    override def zero: List[Long] = Nil
    override def reduce(buf: List[Long], h: Long): List[Long] =
      if (buf.contains(h) || (buf.length >= k && h > buf.last)) buf
      else {
        val (lo, hi) = buf.span(_ < h)
        (lo ::: h :: hi).take(k)
      }
    override def merge(a: List[Long], b: List[Long]): List[Long] =
      (a ++ b).distinct.sorted.take(k)
    override def finish(buf: List[Long]): (Int, Long) =
      (buf.length, if (buf.isEmpty) -1L else buf.last)
    override def bufferEncoder: org.apache.spark.sql.Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[(Int, Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Long)]()
  }

  /** Column function: `kmvAgg(k)(hashExpr(key))` in `groupBy.agg` —
    * returns struct(_1 = n_cand, _2 = kth_hash). */
  def kmvAgg(k: Int): Column => Column = {
    val fn = org.apache.spark.sql.functions.udaf(new KmvAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    h => fn(h)
  }

  /** Per-GROUP KMV distinct sketch over a STRING key — the grouped
    * serving arm of [[KmvAggregator]] (the streaming arm is
    * `EventStreams.hourlyDistinctUsers`): "distinct vocabulary per
    * source/domain" corpus QA in ONE map-side-combined hash aggregate
    * whose per-group state is O(k) forever. A per-group
    * `COUNT(DISTINCT key)` shuffles every distinct (group, key) pair —
    * at 100 TB with a token/shingle key that IS the corpus; the sketch
    * shuffle carries O(groups · k). Same md5 fingerprint + estimator
    * as [[kmvDistinctText]], so every group's row replays exactly.
    * Output: one row per group `(group, n_cand, kth_hash, est)`. */
  def kmvGroupedText(df: DataFrame, group: Column, key: Column,
      k: Int = 256): DataFrame = {
    val kmv = kmvAgg(k)
    // NULL keys are skipped (COUNT DISTINCT convention) BEFORE the
    // aggregator: its Long input encoder is non-nullable, so a NULL
    // fingerprint would throw mid-aggregate instead of being ignored.
    // (A group whose keys are ALL null therefore emits no row — the
    // same shape COUNT(DISTINCT) GROUP BY gives an all-null group.)
    df.filter(key.isNotNull)
      .groupBy(group.as("grp"))
      .agg(kmv(pmod(stringFingerprint(key), lit(HashMod))).as("sk"))
      .select(col("grp"), col("sk._1").as("n_cand"), col("sk._2").as("kth_hash"),
        estFromSketch(k, col("sk._1"), col("sk._2")).as("est"))
  }

  /** Count-Min sketch (Cormode & Muthukrishnan '05): frequency
    * estimates for ANY key from a d×w counter grid — build cost is one
    * map-side-combined aggregate whose shuffle carries O(d·w) rows
    * (the grid), not the key universe; estimates are upper bounds
    * (collisions only inflate), exact when a key's d buckets are
    * collision-free. The textbook heavy-hitter census at 100 TB: the
    * full token vocabulary never materializes anywhere.
    *
    * Hash row j remixes with the Knuth family at distinct constants
    * (`mult + 2j·step`-style odd multipliers) — deterministic, so the
    * whole grid AND every estimate replay exactly in the oracle. */
  object CountMin {
    val Depth = 4

    /** Row-j bucket of a hashed key (keys pre-hash through a string/
      * numeric → long fingerprint; `fp` must already be a long). */
    def bucket(fp: Column, j: Int, width: Int): Column =
      pmod(pmod(fp * lit(RowMults(j)) + lit(RowAdds(j)), lit(HashMod)), lit(width.toLong))

    /** Independent odd multipliers / offsets per row (the SimHash
      * remix family extended). */
    val RowMults: Array[Long] =
      Array(2654435761L, 2246822519L, 3266489917L, 668265263L)
    val RowAdds: Array[Long] = Array(0L, 12345L, 374761393L, 2127912214L)

    /** Row-j bucket of a STRING key: row j draws its own 28-bit slice
      * of the md5 hex (chars 8j+1 .. 8j+7) — the d rows hash with
      * TRULY independent bits (stronger than remixing one
      * fingerprint), every intermediate fits the oracle's checked
      * BIGINT arithmetic, and the whole grid replays exactly as
      * `('0x' || substr(md5(key), 8j+1, 7))::BIGINT % width`. */
    def textBucket(key: Column, j: Int, width: Int): Column =
      pmod(
        conv(substring(md5(key.cast("binary")), 8 * j + 1, 7), 16, 10).cast("long"),
        lit(width.toLong))

    /** Build the grid over one long-keyed column: rows (row, bucket,
      * cnt) for every non-empty counter. */
    def build(df: DataFrame, fp: Column, width: Int = 256): DataFrame =
      buildWith(df, j => bucket(fp, j, width), width)

    /** [[build]] over a STRING key ([[textBucket]] row hashes). NULL
      * keys are skipped — the `COUNT(DISTINCT)`/[[bottomKHv]]
      * convention; without the filter a NULL key yields NULL bucket
      * rows and [[collectGrid]]'s primitive reads would NPE. */
    def buildText(df: DataFrame, key: Column, width: Int = 256): DataFrame =
      buildWith(df.filter(key.isNotNull), j => textBucket(key, j, width), width)

    private def buildWith(df: DataFrame, bucketOf: Int => Column,
        width: Int): DataFrame = {
      require(width >= 2, s"width must be >= 2, got $width")
      // ONE corpus scan: each record explodes into its d (row, bucket)
      // coordinates, then the grid aggregates map-side
      val buckets = array((0 until Depth).map(bucketOf): _*)
      df.select(posexplode(buckets).as(Seq("row", "bucket")))
        .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
    }

    /** Point estimates for a literal key set against a built grid:
      * est(key) = min over rows of its bucket's counter (0 when a
      * bucket is empty). The grid is O(d·w) — it broadcasts. */
    def estimates(grid: DataFrame, keys: DataFrame, fp: Column,
        width: Int = 256): DataFrame =
      estimatesWith(grid, keys, j => bucket(fp, j, width))

    /** [[estimates]] for a STRING key ([[textBucket]] row hashes —
      * must match the [[buildText]] grid's). */
    def estimatesText(grid: DataFrame, keys: DataFrame, key: Column,
        width: Int = 256): DataFrame =
      estimatesWith(grid, keys, j => textBucket(key, j, width))

    private def estimatesWith(grid: DataFrame, keys: DataFrame,
        bucketOf: Int => Column): DataFrame = {
      val keyed = (0 until Depth).map { j =>
        keys.select(col("*"), lit(j).as("row"), bucketOf(j).as("bucket"))
      }.reduce(_.unionByName(_))
      keyed.join(broadcast(grid), Seq("row", "bucket"), "left")
        .groupBy(keys.columns.map(col): _*)
        .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
    }

    /** End-to-end heavy-hitter census over a STRING key — the
      * composition a pipeline actually runs (estimate → threshold →
      * exact verify): one row `(key, est, cnt)` per key whose EXACT
      * count ≥ `threshold`, with the CMS upper bound `est ≥ cnt`
      * riding beside the verified count.
      *
      * Stage shape at 100 TB: the grid builds from one scan; the
      * O(d·w) grid then collects and rides into the SECOND (and last)
      * scan as literal bucket→count lookup maps, so the estimate
      * threshold is a MAP-ONLY filter fused into the scan (no join,
      * no shuffle) — the est ≥ threshold predicate prunes the scan to
      * exactly the candidate keys' occurrences (est is constant per
      * key), i.e. the same bounded set an In(key) list would select
      * WITHOUT a third scan or a driver round-trip for the list. The
      * exact verify is then one map-side-combined aggregate over only
      * those pruned rows: its shuffle carries O(candidates ×
      * partitions) partials, candidates ≈ N/threshold plus the few
      * collision survivors. CMS never under-counts, so a true heavy
      * hitter can never be missed; collision false positives die in
      * the verify's count filter. */
    def heavyHittersText(df: DataFrame, key: Column, threshold: Long,
        width: Int = 256): DataFrame = {
      require(threshold >= 1L, s"threshold must be >= 1, got $threshold")
      verifyAtLeast(df, key, collectGrid(df, key, width), threshold, width)
    }

    /** [[heavyHittersText]] with a RELATIVE threshold `ceil(N·num/den)`
      * — N derives from the collected grid itself (every record lands
      * exactly one coordinate in row 0, so N = Σ row-0 counters): no
      * separate corpus-count job, still exactly oracle-replayable
      * rational-rank arithmetic. */
    def heavyHittersTextFrac(df: DataFrame, key: Column, num: Int, den: Int,
        width: Int = 256): DataFrame = {
      require(num >= 1 && den >= num, s"fraction $num/$den out of (0, 1]")
      val g = collectGrid(df, key, width)
      val n = g.collect { case ((0, _), c) => c }.sum
      val threshold = math.max(1L, (num.toLong * n + den - 1) / den)
      verifyAtLeast(df, key, g, threshold, width)
    }

    private def collectGrid(df: DataFrame, key: Column,
        width: Int): Map[(Int, Long), Long] =
      buildText(df, key, width).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    private def verifyAtLeast(df: DataFrame, key: Column,
        g: Map[(Int, Long), Long], threshold: Long, width: Int): DataFrame = {
      val estCol = least((0 until Depth).map { j =>
        val entries = (0L until width.toLong).flatMap { b =>
          g.get((j, b)).toSeq.flatMap(c => Seq(lit(b), lit(c)))
        }
        if (entries.isEmpty) lit(0L)
        else coalesce(
          element_at(map(entries: _*), textBucket(key, j, width)), lit(0L))
      }: _*)
      df.filter(estCol >= threshold)
        .groupBy(key.cast("string").as("key"))
        .agg(max(estCol).as("est"), count(lit(1)).as("cnt"))
        .filter(col("cnt") >= threshold)
    }
  }

  /** HyperLogLog distinct sketch (Flajolet-Fusy-Gandouet-Meunier,
    * AofA 2007) over a STRING key — the REGISTER-state counterpart of
    * [[kmvDistinctText]] and the industry-standard distinct sketch:
    * fixed 2^p registers each holding one small int, and merge is
    * element-wise MAX — associative, commutative and idempotent, so
    * per-source register tables union across corpora, partitions,
    * days or engines with no re-scan (the property KMV's sorted
    * bottom-k only gets through a re-sort, and an exact
    * COUNT(DISTINCT) cannot have at all).
    *
    * Determinism: the hash is the [[stringFingerprint]] 60-bit md5
    * value — register index = low p bits, rho = (trailing zeros of
    * the remaining 51-bit suffix) + 1, capped at 52 for a zero
    * suffix. Trailing zeros of a uniform integer are geometric(1/2)
    * exactly like the classic leading-zero rank, and `suffix & -suffix`
    * isolates the lowest set bit as an exact power of two in BOTH
    * engines, so `floor(log2(...))` is exact integer arithmetic in
    * IEEE doubles and the whole register table replays in the oracle.
    *
    * Exactness of the estimator: the indicator sum Σ 2^-rho_j
    * accumulates in integer units of 2^-52 (`shiftleft(1, 52-rho)`
    * longs, ≤ 2^61 total — no double-rounding order dependence), and
    * the final estimate is ONE double division by that exact integer
    * (plus the standard linear-counting branch below 2.5·m when empty
    * registers remain). Scale shape: ONE map-side-combined aggregate;
    * the shuffle carries O(m) register rows, never the key set. */
  /** Count-Sketch second-moment (F2) estimator — AMS '96 via the
    * Charikar-Chen-Farach-Colton sketch: F2 = Σ_key cnt(key)² is the
    * SELF-JOIN SIZE of the key column, the planning statistic that
    * predicts join/groupBy blowup before the shuffle runs (a key
    * column with F2 ≫ N is the q_skew_join situation). Each of d=4
    * rows hashes every occurrence to a signed ±1 bucket counter;
    * E[Σ_b counter²] = F2 per row (cross terms cancel in
    * expectation, Var ≈ 2·F2²/w), and the MEDIAN of the 4 row
    * estimates tightens the tail.
    *
    * Determinism + replay: row j's bucket is the [[CountMin.textBucket]]
    * md5 slice (chars 8j+1..8j+7); its SIGN is the parity of hex char
    * 8j+8 — the remaining nibble of the same 8-char block, so the
    * four (bucket, sign) draws partition md5's 32 hex chars exactly
    * and every value fits checked BIGINT arithmetic. All counters and
    * squares are exact integers; the even-count median is the mean of
    * the two middle values — a single exact /2.
    *
    * Scale shape: ONE map-side-combined aggregate whose shuffle
    * carries the O(d·w) grid, never the key universe; the exact F2
    * census beside it in the gate shuffles every distinct key — the
    * contrast the sketch exists to avoid at 100 TB. */
  object F2 {
    /** Row-j ±1 sign of a string key: parity of md5 hex char 8j+8. */
    def textSign(key: Column, j: Int): Column =
      conv(substring(md5(key.cast("binary")), 8 * j + 8, 1), 16, 10)
        .cast("long") % 2L * 2L - 1L

    /** One-row (w, d, est_f2) frame: grid → per-row Σ counter² →
      * median of the d row estimates. */
    def estimateText(df: DataFrame, key: Column, width: Int = 256): DataFrame = {
      require(width >= 2, s"width must be >= 2, got $width")
      val rows = (0 until 4).map { j =>
        struct(lit(j).as("r"),
          CountMin.textBucket(key, j, width).as("b"),
          textSign(key, j).as("s"))
      }
      df.filter(key.isNotNull)
        .select(explode(array(rows: _*)).as("rb"))
        .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
        .agg(sum(col("rb.s")).as("c"))
        .groupBy("r").agg(sum(col("c") * col("c")).as("f2r"))
        .agg(sort_array(collect_list(col("f2r"))).as("fs"))
        // empty (or all-NULL-key) input leaves fs = [] — define the
        // result as 0.0 (the KMV/HLL empty-input convention) instead
        // of a NULL est_f2 / ANSI element_at error
        .select(lit(width).as("w"), lit(4).as("d"),
          when(size(col("fs")) === 4,
            (element_at(col("fs"), 2) + element_at(col("fs"), 3)).cast("double") / 2.0d)
            .otherwise(lit(0.0d))
            .as("est_f2"))
    }
  }

  object Hll {
    /** Register-index bits; m = 2^P registers (σ ≈ 1.04/√m ≈ 4.6%). */
    val P = 9
    val M: Int = 1 << P
    /** 60-bit fingerprint minus P index bits. */
    val SuffixBits: Int = 60 - P
    /** rho for an all-zero suffix (trailing-zero count saturates). */
    val RhoCap: Int = SuffixBits + 1
    /** alpha_m for m ≥ 128 (Flajolet et al. §4). */
    val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)
    /** The whole raw-estimate numerator alpha·m²·2^RhoCap — ONE
      * literal shared verbatim with the oracle SQL, so the raw branch
      * is a single cross-engine-identical division. */
    val EstNum: Double = Alpha * M * M * java.lang.Math.scalb(1.0, RhoCap)

    /** The register table `(idx, rho)` of a corpus — one map-side-
      * combined MAX aggregate; NULL keys skipped (COUNT DISTINCT
      * convention). Absent idx ⇒ register 0. */
    def registers(df: DataFrame, key: Column): DataFrame =
      df.filter(key.isNotNull)
        .select(stringFingerprint(key).as("fp"))
        .select((col("fp") % lit(M.toLong)).as("idx"), expr(s"fp div $M").as("sfx"))
        .select(col("idx"),
          when(col("sfx") === 0L, lit(RhoCap))
            .otherwise(floor(log2(col("sfx").bitwiseAND(-col("sfx"))))
              .cast("int") + lit(1)).as("rho"))
        .groupBy("idx").agg(max(col("rho")).as("rho"))

    /** Sketch union: element-wise register MAX — exactly
      * `registers(corpusA ∪ corpusB)` by associativity of max. Both
      * sides are O(m) rows; nothing re-scans. */
    def merge(regA: DataFrame, regB: DataFrame): DataFrame =
      regA.unionByName(regB).groupBy("idx").agg(max(col("rho")).as("rho"))

    /** Per-group register tables `(grp, idx, rho)` — the shard-local
      * sketch builds (one per source/partition/day) whose element-wise
      * max IS the global sketch: the mergeability that lets a 100 TB
      * corpus keep O(m) state per shard and roll up without ever
      * re-scanning. One map-side-combined MAX aggregate. */
    def registersBy(df: DataFrame, group: Column, key: Column): DataFrame =
      df.filter(key.isNotNull)
        .select(group.as("grp"), stringFingerprint(key).as("fp"))
        .select(col("grp"), (col("fp") % lit(M.toLong)).as("idx"),
          expr(s"fp div $M").as("sfx"))
        .select(col("grp"), col("idx"),
          when(col("sfx") === 0L, lit(RhoCap))
            .otherwise(floor(log2(col("sfx").bitwiseAND(-col("sfx"))))
              .cast("int") + lit(1)).as("rho"))
        .groupBy("grp", "idx").agg(max(col("rho")).as("rho"))

    /** N-way [[merge]]: the element-wise max over EVERY group's
      * register table at once — O(groups·m) rows in, O(m) out. */
    def mergeAll(regs: DataFrame): DataFrame =
      regs.groupBy("idx").agg(max(col("rho")).as("rho"))

    /** The estimate from a register table — ONE row
      * `(m, v_zero, s_units, est)`: v_zero = empty registers,
      * s_units = the exact integer indicator sum (pins the full
      * register state through the gate), est = the HLL estimate with
      * the standard small-range linear-counting branch
      * (`m·ln(m/V)` when raw ≤ 2.5·m and V > 0). */
    def estimate(regs: DataFrame): DataFrame =
      regs.agg(
          count(lit(1)).as("nz"),
          coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoCap - rho)")),
            lit(0L)).as("s_obs"))
        .select(
          lit(M).as("m"),
          (lit(M.toLong) - col("nz")).cast("int").as("v_zero"),
          (col("s_obs") + (lit(M.toLong) - col("nz")) * lit(1L << RhoCap))
            .as("s_units"))
        .select(col("m"), col("v_zero"), col("s_units"),
          round(
            when(col("v_zero") > 0 &&
                lit(EstNum) / col("s_units").cast("double") <= lit(2.5 * M),
              lit(M.toDouble) * log(lit(M.toDouble) / col("v_zero").cast("double")))
              .otherwise(lit(EstNum) / col("s_units").cast("double")),
            2).as("est"))

    /** End-to-end distinct estimate of a STRING key. */
    def distinctText(df: DataFrame, key: Column): DataFrame =
      estimate(registers(df, key))

    /** Spark `round(x, 2)` (BigDecimal HALF_UP) — the aggregator's
      * estimate must round exactly like the column-expression arm. */
    private[operators] def round2(x: Double): Double =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

    /** The estimate computed from raw register values — shared by the
      * [[HllAggregator]] finish and any collected-register consumer;
      * the SAME branches and constants as [[estimate]]'s expression. */
    private[operators] def estimateFromRegisters(regs: Array[Int]): (Int, Long, Double) = {
      var nz = 0
      var s = 0L
      var i = 0
      while (i < regs.length) {
        val r = regs(i)
        if (r > 0) { nz += 1; s += 1L << (RhoCap - r) }
        else s += 1L << RhoCap
        i += 1
      }
      val vZero = M - nz
      val raw = EstNum / s.toDouble
      val est =
        if (vZero > 0 && raw <= 2.5 * M) M * math.log(M.toDouble / vZero)
        else raw
      (vZero, s, round2(est))
    }
  }

  /** [[Hll]] as a typed Aggregator — the STREAMING arm of the register
    * sketch (the [[KmvAggregator]] rationale): the 2^p register array
    * is the buffer, `reduce` folds one fingerprint's (idx, rho) in
    * with integer ops only (trailing zeros — exactly the batch arm's
    * `log2(sfx & -sfx)` on exact powers of two), and `merge` is the
    * element-wise MAX the sketch is built around — associative,
    * commutative, idempotent, so it runs map-side-combined in batch
    * AND incrementally inside watermark-bounded streaming state at
    * O(m) per window forever. Output: (v_zero, s_units, est) — the
    * batch [[Hll.estimate]] columns. */
  final class HllAggregator extends org.apache.spark.sql.expressions.Aggregator[
      Long, Array[Int], (Int, Long, Double)] {
    import Hll._
    override def zero: Array[Int] = new Array[Int](M)
    override def reduce(b: Array[Int], fp: Long): Array[Int] = {
      val idx = (fp % M).toInt
      val sfx = fp / M
      val rho = if (sfx == 0L) RhoCap
        else java.lang.Long.numberOfTrailingZeros(sfx) + 1
      if (rho > b(idx)) b(idx) = rho
      b
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(b: Array[Int]): (Int, Long, Double) =
      estimateFromRegisters(b)
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[(Int, Long, Double)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Long, Double)]()
  }

  /** Column function: `hllAgg()(pmod-free 60-bit fingerprint)` in
    * `groupBy.agg` — returns struct(_1 = v_zero, _2 = s_units,
    * _3 = est). NULL fingerprints must be filtered by the caller
    * (COUNT DISTINCT convention — the encoder is non-nullable). */
  def hllAgg(): Column => Column = {
    val fn = org.apache.spark.sql.functions.udaf(new HllAggregator,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    h => fn(h)
  }

  /** Per-GROUP HLL distinct sketch over a STRING key — the grouped
    * batch arm of [[HllAggregator]] (streaming arm:
    * `EventStreams.hourlyDistinctUsersHll`): "distinct vocabulary per
    * source/domain" in ONE map-side-combined aggregate at O(m) state
    * per group — and because registers merge by max, the per-group
    * tables ALSO roll up to the exact global sketch without
    * re-scanning (the KMV grouped arm cannot do that without a
    * re-sort). Output: `(group, v_zero, s_units, est)`. */
  def hllGroupedText(df: DataFrame, group: Column, key: Column): DataFrame = {
    val hll = hllAgg()
    df.filter(key.isNotNull)
      .groupBy(group.as("grp"))
      .agg(hll(stringFingerprint(key)).as("sk"))
      .select(col("grp"), col("sk._1").as("v_zero"),
        col("sk._2").as("s_units"), col("sk._3").as("est"))
  }

  /** Bloom filter (Bloom CACM'70) over a STRING key — the
    * incremental-ingest membership sketch: build an m-bit array from
    * the resident corpus ONCE, then screen every new batch map-only.
    * An unset bit is definite ("this key was never ingested"), so the
    * filter partitions a batch into definitely-new rows and a small
    * maybe-seen remainder — only the remainder ever needs an exact
    * check, and at the design fill ratio that remainder is the true
    * duplicates plus an ε of false positives. At 100 TB this replaces
    * the batch-vs-corpus anti-join (a shuffle of the resident key set
    * per ingest) with one O(m/32)-row build aggregate and a literal
    * lookup fused into the batch scan.
    *
    * Bit positions reuse the [[CountMin.textBucket]] md5-slice family
    * (row j draws its own 28-bit slice), so the whole bit array AND
    * every probe replay exactly in the oracle as
    * `('0x'||substr(md5(key),8j+1,7))::BIGINT % m`. Words are 32-bit
    * (stored in longs): every word value is positive, so no oracle
    * sign/overflow edge exists anywhere. */
  object Bloom {
    /** Number of md5-slice hash functions (≤ 4 — the slice family). */
    val Depth = 4

    private def checkBits(mBits: Int): Unit =
      require(mBits >= 64 && mBits <= (1 << 28) && (mBits & (mBits - 1)) == 0,
        s"mBits must be a power of two in [64, 2^28], got $mBits — " +
          "the 28-bit md5 slice is uniform mod m only when m divides 2^28")

    /** The set-bit census of the corpus: rows `(word_idx, word)` for
      * every non-zero 32-bit word of the m-bit array (absent word ⇒
      * 0). ONE map-side-combined aggregate; the shuffle carries
      * O(m/32) rows, never the key set. */
    def build(df: DataFrame, key: Column, mBits: Int): DataFrame = {
      checkBits(mBits)
      // NULL keys are skipped (COUNT DISTINCT convention): a NULL key
      // hashes to NULL positions, and collectGrid's primitive reads
      // would NPE on the resulting NULL-word row
      df.filter(key.isNotNull)
        .select(explode(array((0 until Depth).map(j =>
          CountMin.textBucket(key, j, mBits)): _*)).as("pos"))
        .select((col("pos") / 32).cast("int").as("word_idx"),
          pmod(col("pos"), lit(32L)).cast("int").as("bit"))
        .groupBy("word_idx")
        .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), bit)")).as("word"))
    }

    /** Membership probe as a pure Column over `key`, from a collected
      * bit array (`build(...).collect()` — bounded O(m/32) rows, the
      * [[CountMin.heavyHittersText]] literal-grid pattern): TRUE iff
      * all Depth probed bits are set (maybe seen), FALSE iff any is
      * unset (definitely new). Fuses map-only into whatever scan the
      * batch arrives on — no join, no shuffle. */
    def maybeSeenExpr(grid: Map[Int, Long], key: Column, mBits: Int): Column = {
      checkBits(mBits)
      val entries = grid.toSeq.sortBy(_._1)
        .flatMap { case (w, v) => Seq(lit(w), lit(v)) }
      val wordOf: Column => Column =
        if (entries.isEmpty) _ => lit(0L)
        else p => coalesce(
          element_at(map(entries: _*), (p / 32).cast("int")), lit(0L))
      (0 until Depth).map { j =>
        val p = CountMin.textBucket(key, j, mBits)
        val mask = call_function("shiftleft", lit(1L), pmod(p, lit(32L)).cast("int"))
        wordOf(p).bitwiseAND(mask) =!= 0L
      }.reduce(_ && _)
    }

    /** [[build]] collected to the literal-map form [[maybeSeenExpr]]
      * takes (bounded: O(m/32) one-int-one-long rows). */
    def collectGrid(df: DataFrame, key: Column, mBits: Int): Map[Int, Long] =
      build(df, key, mBits).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap

    /** Incremental maintenance: fold a new batch's grid into the
      * resident filter — bit arrays union by word-wise OR, so ingest
      * NEVER rebuilds over the resident corpus (screen the batch,
      * then merge its O(m/32) grid in; both sides tiny). Exactly
      * `build(corpusA ∪ corpusB)` by associativity of bit_or. */
    def merge(gridA: DataFrame, gridB: DataFrame): DataFrame =
      gridA.union(gridB)
        .groupBy("word_idx")
        .agg(bit_or(col("word")).as("word"))

    /** Frame-level probe for corpus-scale m (where the literal-map
      * form would bloat codegen): one row per input key with its
      * membership verdict `(key, maybe_seen)`. The Depth probes
      * explode per key and BROADCAST-join the O(m/32) grid — the
      * probed frame itself never shuffles on anything but its own
      * key. Feed DISTINCT keys and join the verdicts back on the key
      * column when screening a multiset (the verdict is a pure
      * function of the key). */
    def maybeSeenFlags(keys: DataFrame, key: Column, grid: DataFrame,
        mBits: Int): DataFrame = {
      checkBits(mBits)
      keys.select(key.as("__bf_key"), explode(array((0 until Depth).map(j =>
          CountMin.textBucket(key, j, mBits)): _*)).as("pos"))
        .select(col("__bf_key"), (col("pos") / 32).cast("int").as("word_idx"),
          pmod(col("pos"), lit(32L)).cast("int").as("bit"))
        .join(broadcast(grid), Seq("word_idx"), "left")
        .groupBy("__bf_key")
        .agg(min(when(coalesce(col("word"), lit(0L))
          .bitwiseAND(call_function("shiftleft", lit(1L), col("bit"))) =!= 0L,
          1).otherwise(0)).as("__allset"))
        .select(col("__bf_key").as("key"), (col("__allset") === 1).as("maybe_seen"))
    }
  }

  /** The k smallest DISTINCT hash values of a numerically-keyed
    * corpus. Non-numeric keys fail loudly here: `cast("long")` on a
    * string yields NULL, so a text corpus would silently sketch
    * nothing instead of erroring (route text through
    * [[kmvDistinctText]] / [[stringFingerprint]]). */
  private def bottomK(df: DataFrame, key: Column, k: Int,
      mult: Long, add: Long): DataFrame = {
    val dt = df.select(key).schema.head.dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"KMV numeric surface requires a numeric key, got ${dt.sql} — " +
        "use kmvDistinctText/stringFingerprint for text keys")
    bottomKHv(df, pmod(key.cast("long") * mult + add, lit(HashMod)), k)
  }

  /** The k smallest DISTINCT values of a pre-built hash column, as a
    * ≤k-row DataFrame("hv"): bounded per-partition TreeSets, then a
    * toy-sized distinct + sort over ≤ k·#partitions candidates.
    * NULL keys (⇒ NULL hashes) are skipped — the `COUNT(DISTINCT)`
    * convention, which the oracle's NULLS-LAST bottom-k matches. */
  private def bottomKHv(df: DataFrame, hv: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .select(hv.as("hv"))
      .filter(col("hv").isNotNull)
      .as[Long]
    val cand = hashed.mapPartitions { it =>
      val set = new java.util.TreeSet[java.lang.Long]()
      it.foreach { h =>
        val boxed = java.lang.Long.valueOf(h)
        if (!set.contains(boxed) && (set.size < k || h < set.last)) {
          set.add(boxed)
          if (set.size > k) set.pollLast()
        }
      }
      scala.jdk.CollectionConverters.IteratorHasAsScala(set.iterator)
        .asScala.map(_.longValue)
    }
    cand.distinct().orderBy(col("value")).limit(k).select(col("value").as("hv"))
  }
}
