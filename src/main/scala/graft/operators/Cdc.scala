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
        // an unrecognized (or NULL) op must fail loudly, not silently
        // behave as a delete: the downstream filter keeps only NULL
        // (base-only) / "U" winners, so a typo'd op would vanish rows
        .when(col(op).isNull || !col(op).isin("U", "D"),
          raise_error(concat(
            lit(s"unrecognized $op value '"), col(op).cast("string"),
            lit(s"' (expected U or D) for key "), col(key).cast("string"))))
        .otherwise(col(op)).as("__op"),
      struct(cols.map(col): _*).as("__c"))
    val b = base.select(col(key).as("__k"),
      struct(cols.map(col): _*).as("__b"))
    b.join(c, Seq("__k"), "full_outer")
      .filter(col("__op").isNull || col("__op") === "U")
      .select(when(col("__op") === "U", col("__c")).otherwise(col("__b")).as("__r"))
      .select(col("__r.*"))
  }

  /** Snapshot diff — classify every key as `added` / `removed` /
    * `changed` between two corpus snapshots, dropping the unchanged
    * mass. The inverse problem of [[applyChanges]]: MERGE applies a
    * change feed to produce a snapshot; diff recovers the change feed
    * from two snapshots (the audit / incremental-reprocessing
    * primitive — "what actually moved between yesterday's crawl and
    * today's?" drives which partitions a 100 TB pipeline recomputes).
    *
    * Contract: both frames carry identical column sets; `keyCols`
    * identify a row (at most one row per key per snapshot — violations
    * surface as duplicate output keys rather than silently winning).
    * Payload comparison is null-safe (`<=>` over one packed struct):
    * a payload column going NULL -> non-NULL or back is `changed`,
    * absent rows are never confused with NULL payloads (row presence
    * is the struct's own nullity, and a present row's struct is
    * non-null even when every payload field is NULL).
    *
    * Scale shape: ONE full-outer equi-join on the key — each side
    * shuffles once (or not at all when both snapshots are bucketed /
    * co-partitioned on the key, the layout a snapshot store should
    * use); classification is a map-only struct compare and the
    * dominant unchanged mass is filtered before anything downstream,
    * so the output is O(churn), not O(corpus). Nothing broadcasts,
    * nothing collects, no window. */
  def snapshotDiff(old: DataFrame, neu: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(old.columns.sorted.sameElements(neu.columns.sorted),
      s"snapshot schemas differ: ${old.columns.mkString(",")} vs " +
        neu.columns.mkString(","))
    require(keyCols.forall(old.columns.contains),
      s"key column(s) missing from snapshots: ${keyCols.mkString(",")}")
    val payload = old.columns.filterNot(keyCols.contains).toSeq
    def packed(df: DataFrame, side: String): DataFrame =
      df.select(keyCols.map(col) :+
        (if (payload.isEmpty) lit(0) else struct(payload.map(col): _*))
          .as(side): _*)
    packed(old, "__po").join(packed(neu, "__pn"), keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__po").isNull, lit("added"))
          .when(col("__pn").isNull, lit("removed"))
          .when(!(col("__po") <=> col("__pn")), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) :+ col("change_type"): _*)
  }
}
