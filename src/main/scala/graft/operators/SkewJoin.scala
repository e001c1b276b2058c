package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for keyed joins at 100 TB: when a few hot
  * keys dominate (the Zipfian reality of shingles, user ids, join
  * dims), a plain shuffle join puts entire hot keys on single tasks.
  *
  * Two complementary tools:
  *  - AQE skew-join handles moderate skew automatically (enabled in
  *    our sessions; splits oversized partitions post-shuffle);
  *  - [[SkewJoin.salted]] handles extreme skew structurally: the big
  *    side gets a random salt in [0, S), the small side is replicated
  *    S times, and the join key becomes (key, salt) — hot keys spread
  *    across S tasks. Exact same join result, S× replication of the
  *    small side only.
  */
object SkewJoin {

  /** Salted equi-join: `big ⋈ small` on `key`, with the big side's hot
    * keys spread over `salt` buckets. Inner join semantics. The salt
    * column is seeded for reproducibility. */
  def salted(big: DataFrame, small: DataFrame, key: String, salt: Int, seed: Long = 42L): DataFrame = {
    require(salt > 0, "salt must be positive")
    val bigS = big.withColumn("__salt", (rand(seed) * salt).cast("int"))
    val smallS = small.crossJoin(
      big.sparkSession.range(0, salt).select(col("id").cast("int").as("__salt")))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
