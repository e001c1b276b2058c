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

  /** KMV distinct-count sketch over a numeric key. Returns ONE row:
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
      mult: Long = 2654435761L, add: Long = 987654321L): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .select(pmod(key.cast("long") * mult + add, lit(HashMod)).as("hv"))
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
    cand.distinct().orderBy(col("value")).limit(k)
      .agg(count(lit(1)).as("__n"), max(col("value")).as("kth_hash"))
      .select(
        lit(k).as("k"),
        col("kth_hash"),
        when(col("__n") < k, col("__n").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(HashMod.toDouble) / col("kth_hash"), 2))
          .as("est"))
  }
}
