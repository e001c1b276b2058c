package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage-layout kernels (extension — the reference
  * stores insertion order only, `/root/reference/src/lib.rs:55-60`).
  *
  * Z-ORDER (Morton) interleaving linearizes two key dimensions so rows
  * close in EITHER key land close in the linear order: range-partition
  * or sort a 100 TB table by `zValue` and every file's min/max stats
  * become tight in BOTH keys — a predicate on either dimension prunes
  * files (data skipping), where a single-key sort gives pruning on one
  * dimension and none on the other. The interleave is a STATIC
  * expression tree (no HOF, no UDF — whole-stage codegen'd), and plain
  * integer bit tests, so the DuckDB oracle replays it exactly.
  */
object Layout {

  /** Morton z-value of two non-negative integer keys: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. `bits` caps the
    * interleaved width per key (21 bits each → a 42-bit z in a long).
    * Keys wider than `bits` must be range-reduced first — the top
    * bits silently truncate (the standard z-cluster convention: layout
    * quality degrades gracefully, correctness never depends on z). */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        when(al.bitwiseAND(lit(1L << i)) =!= 0L, lit(1L << (2 * i))).otherwise(0L) +
        when(bl.bitwiseAND(lit(1L << i)) =!= 0L, lit(1L << (2 * i + 1))).otherwise(0L)
    }
  }

  /** The same interleave as DuckDB SQL over expressions `a`/`b` — ONE
    * generator for both engines (the shared-fragment rule). */
  def zValueSql(a: String, b: String, bits: Int = 21): String =
    (0 until bits).flatMap { i =>
      Seq(
        s"(CASE WHEN ($a & ${1L << i}) <> 0 THEN ${1L << (2 * i)} ELSE 0 END)",
        s"(CASE WHEN ($b & ${1L << i}) <> 0 THEN ${1L << (2 * i + 1)} ELSE 0 END)")
    }.mkString("(", " + ", ")")

  /** Cluster a table for two-dimensional data skipping: NORMALIZE both
    * keys to a common `bits`-wide range (one min/max aggregate — keys
    * of unequal magnitude would otherwise let the wider key's high
    * bits dominate the interleave and collapse z-order to a
    * single-key sort), then range-partition on the z-value into
    * `buckets` write tasks and sort within each — the write-side
    * layout pass before `write.parquet`. File min/max stats then
    * bound BOTH keys per file, so scans filtered on either key prune
    * most files. (Range boundaries come from Spark's reservoir
    * sampling — a layout choice, not a result: downstream results
    * never depend on which boundary a row lands on.) */
  def clusterByZ(df: DataFrame, a: Column, b: Column, buckets: Int,
      bits: Int = 16): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val mm = df.agg(
      min(a.cast("double")), max(a.cast("double")),
      min(b.cast("double")), max(b.cast("double"))).head()
    val top = (1L << bits) - 1
    def scaled(c: Column, lo: Double, hi: Double): Column =
      if (mm.anyNull || hi == lo) lit(0L)
      else floor((c.cast("double") - lit(lo)) / lit(hi - lo) * top).cast("long")
    val za = scaled(a, mm.getDouble(0), mm.getDouble(1))
    val zb = scaled(b, mm.getDouble(2), mm.getDouble(3))
    df.withColumn("__z", zValue(za, zb, bits))
      .repartitionByRange(buckets, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Bucketed co-located storage — the layout that removes the JOIN
    * shuffle entirely (the complement of [[clusterByZ]]'s scan
    * pruning): both sides of a recurring equi-join written with the
    * SAME hash-bucket count on the join key join bucket-to-bucket
    * with ZERO Exchange in the plan — at 100 TB this converts every
    * fact-to-fact join on the layout key from a full two-sided
    * shuffle into a local per-bucket merge (the sortBy makes each
    * bucket file key-sorted, so even the merge sort reads
    * presorted runs). Registered as an EXTERNAL parquet table (data
    * at `path`) because bucket metadata lives in the catalog — a
    * plain `spark.read.parquet` cannot carry it.
    * LayoutSpec pins the no-Exchange plan shape and
    * result-equality with the unbucketed join. */
  def writeBucketed(df: DataFrame, path: String, table: String, key: String,
      numBuckets: Int): Unit = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Rendezvous (highest-random-weight) shard assignment — Thaler &
    * Ravishankar '98: a key's shard is the one maximizing
    * hash(key, shard). Unlike `hash(key) % n`, growing the shard set
    * moves ONLY the keys won by the new shard (≈ 1/(n+1) of them) and
    * removing a shard moves only ITS keys — the stable-routing
    * property an incremental corpus layout needs (re-sharding a 100 TB
    * store to add capacity rewrites ~1/(n+1) of the data, not
    * (n-1)/n of it). The weight is the established md5-prefix
    * fingerprint of "key:shard", so assignment is a pure map-only
    * STATIC expression tree over a literal shard list (codegen'd, no
    * UDF, no shuffle, SQL-replayable); ties (a 60-bit hash collision
    * across shards for one key) break to the lexicographically
    * LARGEST shard name via the struct order, deterministically. */
  def hrwShard(key: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty, "shards must be non-empty")
    require(shards.distinct.size == shards.size,
      s"duplicate shard names: ${shards.diff(shards.distinct).mkString(", ")}")
    val entries = shards.map { sh =>
      struct(
        conv(substring(md5(concat(key.cast("string"), lit(":"), lit(sh))
          .cast("binary")), 1, 15), 16, 10).cast("long").as("w"),
        lit(sh).as("shard"))
    }
    array_max(array(entries: _*)).getField("shard")
  }

  /** The oracle-side rendering of [[hrwShard]]'s weight for one
    * key-expression/shard pair (DuckDB md5 of the same concatenation,
    * the established hex-prefix identity). */
  def hrwWeightSql(keyExpr: String, shardLit: String): String =
    s"('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || ':' || $shardLit), 1, 15))::BIGINT"

  /** Driver-local point arm of [[hrwShard]] — route ONE key with zero
    * Spark jobs (the searchLocal serving convention; the Python
    * facade's routing surface): identical md5-prefix weights over the
    * identical "key:shard" bytes and the identical (w DESC, shard
    * DESC) tie-break, pinned ≡ the column arm in LayoutSpec. Callers
    * routing a numeric key pass the same string Spark's cast renders
    * (`123`, not `123.0`). */
  def hrwRouteLocal(key: String, shards: Seq[String]): String = {
    require(shards.nonEmpty, "shards must be non-empty")
    require(shards.distinct.size == shards.size,
      s"duplicate shard names: ${shards.diff(shards.distinct).mkString(", ")}")
    shards.map { sh =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$key:$sh".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = d.take(8).map(b => f"$b%02x").mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16), sh)
    }.max._2
  }

  /** Per-shard dataset MANIFEST — the integrity census every
    * multi-stage pipeline materializes between copy/convert/filter
    * stages (the interchange sources' round-trip aggregate, promoted
    * to a first-class operator): per shard, row count, id sum, and an
    * ORDER-INDEPENDENT content fingerprint (per-row md5 prefix mod
    * 2^31, summed as BIGINT — inside int64 to ~4·10⁹ rows per shard,
    * yet any single mangled character anywhere still changes it).
    * Every column is ADDITIVE, so manifests MERGE: the union of two
    * shards' manifests is the elementwise sum ([[mergeManifests]]) —
    * verify a 100 TB copy by comparing per-shard manifests locally
    * and folding, never by re-reading both sides into one job. ONE
    * map-side-combined census; output is O(#shards). */
  def manifest(df: DataFrame, shard: Column, id: Column,
      payload: Column): DataFrame =
    df.groupBy(shard.cast("string").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(id.cast("long")).as("sum_ids"),
        sum(conv(substring(md5(payload.cast("binary")), 1, 15), 16, 10)
          .cast("long") % lit(2147483648L)).as("payload_fp"))

  /** Fold a set of per-shard manifests into one (all columns are
    * additive sums) — merge(manifest(A), manifest(B)) ≡
    * manifest(A ∪ B), pinned in LayoutSpec and by the q_manifest
    * gate's oracle (the q_hll_union shared-oracle trick). */
  def mergeManifests(manifests: DataFrame): DataFrame =
    manifests.agg(
      sum(col("n_rows")).as("n_rows"),
      sum(col("sum_ids")).as("sum_ids"),
      sum(col("payload_fp")).as("payload_fp"))

  /** Diff two per-shard manifests — the VERIFICATION consumer the
    * additive manifests exist for: after a copy / convert / filter /
    * re-shard stage, compare the source and destination manifests and
    * report ONLY the exceptions (an empty result IS the verification).
    * Verdict per differing shard, checked in severity order:
    * `missing_in_a`/`missing_in_b` (the shard exists on one side
    * only), `row_count` (both present, counts differ — dropped or
    * duplicated rows), `content` (same count but the id sum or the
    * order-free fingerprint differs — substituted ids or corrupted
    * payload bytes). Both sides' censuses ride along so the report is
    * actionable without re-running anything.
    *
    * Scale shape: an O(#shards) join of two O(#shards) frames —
    * verifying a 100 TB copy reads two manifests, never either
    * corpus; the corpora were read exactly once each, by their own
    * [[manifest]] call (possibly on different clusters, possibly
    * folded from finer shards via [[mergeManifests]]). */
  def diffManifests(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("shard"), col("n_rows").as("a_rows"),
      col("sum_ids").as("a_sum_ids"), col("payload_fp").as("a_fp"))
    val r = b.select(col("shard"), col("n_rows").as("b_rows"),
      col("sum_ids").as("b_sum_ids"), col("payload_fp").as("b_fp"))
    l.join(r, Seq("shard"), "full_outer")
      .withColumn("verdict",
        when(col("a_rows").isNull, lit("missing_in_a"))
          .when(col("b_rows").isNull, lit("missing_in_b"))
          .when(col("a_rows") =!= col("b_rows"), lit("row_count"))
          // null-safe: a shard whose payloads are ALL NULL carries a
          // NULL fingerprint — a plain =!= would silently skip it
          .when(!(col("a_sum_ids") <=> col("b_sum_ids")) ||
            !(col("a_fp") <=> col("b_fp")), lit("content")))
      .filter(col("verdict").isNotNull)
      .select(col("shard"), col("verdict"), col("a_rows"), col("b_rows"),
        col("a_sum_ids"), col("b_sum_ids"), col("a_fp"), col("b_fp"))
      .orderBy("shard")
  }

  /** Epoch-over-epoch crawl delta — the recrawl-scheduling census:
    * given two captures `(url, fp)` of the same crawl scope (fp = a
    * content fingerprint of the fetched payload), classify every URL
    * as `unchanged` / `changed` / `new` / `vanished`. Downstream this
    * drives refresh policy (changed-rate per host sets recrawl
    * cadence), frontier maintenance (vanished URLs leave it), and
    * incremental corpus updates (only `new`+`changed` re-enter the
    * text stack — the 100 TB point: a recrawl processes the DELTA,
    * never the whole corpus again).
    *
    * CONTRACT: each epoch is KEYED by url (one row per url — crawl
    * captures are; dedupe upstream if a capture can repeat a url,
    * otherwise the join fans out). Shape: ONE full-outer equi-join on
    * url; an engine-written epoch is already url-partitioned, making
    * the join co-located; output is per-URL, census it per host
    * downstream. NULL fingerprints compare null-safely (a fetch whose
    * payload was empty on both epochs is `unchanged`, not `changed`). */
  def crawlDelta(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("url"), col("fp").as("__fa"), lit(true).as("__ina"))
    val r = b.select(col("url"), col("fp").as("__fb"), lit(true).as("__inb"))
    l.join(r, Seq("url"), "full_outer")
      .select(col("url"),
        when(col("__ina").isNull, lit("new"))
          .when(col("__inb").isNull, lit("vanished"))
          .when(col("__fa") <=> col("__fb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
