package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application — the MERGE INTO primitive
  * (extension; the reference's only mutation surface is the in-place
  * add/remove of `/root/reference/src/lib.rs:62-72`): apply a batch
  * of keyed upserts and deletes to a base table, latest change per
  * key winning. This is the ingest step a warehouse runs every
  * micro-batch (Delta/Iceberg `MERGE`), and the complement of the
  * SCD2 HISTORY rendering already gated by q_scd2_history — SCD2
  * keeps every version with validity intervals; CDC-apply produces
  * the CURRENT snapshot.
  *
  * Scale shape: ONE shuffle of the (usually small) change batch to
  * pick each key's latest change (window on the key), then ONE
  * equi-join of base to winners on the key. Nothing explodes: the
  * output is ≤ |base| + |inserts| rows, each row built by a map-only
  * struct choice. AQE broadcasts the winner side when the batch is
  * small (the common case — a micro-batch against a 100 TB base
  * turns into a broadcast hash join with NO base shuffle); a
  * backfill-sized batch degrades gracefully to a shuffled join on
  * the key, which is the same co-located shuffle a MERGE engine
  * performs. A base bucketed/partitioned on the key joins in place.
  */
object Cdc {

  /** Apply `changes` to `base`.
    *
    * Contract: `changes` carries every `base` column (same names and
    * types — for a delete the payload columns may hold anything),
    * plus an ordering column `seq` and an operation column `op` with
    * values `"U"` (upsert: update if the key exists, insert if not)
    * or `"D"` (delete; deleting an absent key is a no-op). `(key,
    * seq)` pairs must be unique — the per-key winner would otherwise
    * be ambiguous, so ties fail loudly rather than resolve
    * arbitrarily. Base rows without a change pass through unchanged.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      seq: String = "seq", op: String = "op"): DataFrame = {
    val cols = base.columns
    require(!cols.contains(seq) && !cols.contains(op),
      s"base must not already have a '$seq'/'$op' column")
    val w = Window.partitionBy(col(key)).orderBy(col(seq).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nties", count(lit(1))
        .over(Window.partitionBy(col(key), col(seq))))
      .filter(col("__rn") === 1)
    // the ambiguity guard rides INSIDE the winner's op column, which
    // every downstream row evaluates — no extra scan, and it fires
    // exactly when the WINNING (key, seq) is duplicated (duplicates
    // at losing seqs cannot affect the result, so they are legal)
    val c = latest.select(col(key).as("__k"),
      when(col("__nties") > 1,
        raise_error(concat(
          lit(s"duplicate ($key, $seq) at the winning seq for key "),
          col(key).cast("string"))))
        .otherwise(col(op)).as("__op"),
      struct(cols.map(col): _*).as("__c"))
    val b = base.select(col(key).as("__k"),
      struct(cols.map(col): _*).as("__b"))
    b.join(c, Seq("__k"), "full_outer")
      .filter(col("__op").isNull || col("__op") === "U")
      .select(when(col("__op") === "U", col("__c")).otherwise(col("__b")).as("__r"))
      .select(col("__r.*"))
  }
}
