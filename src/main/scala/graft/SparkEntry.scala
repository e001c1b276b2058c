package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CurationQueries, DedupQueries, HybridQueries, IndexQueries, PipelineQueries, QueryDef, RelationalQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions)
  * is registered as a named query over the driver fixtures, paired with
  * DuckDB-equivalent oracle SQL where SQL can express it. Query
  * implementations live in graft.queries.* (one object per domain).
  *
  * Conventions shared by the Spark queries and their oracles (so the
  * driver's row/schema/hash compare is stable):
  *   - distances are computed in double and rounded to a fixed number
  *     of decimals in BOTH engines (accumulation-order noise ~1e-13);
  *   - SUMs over double columns cast per-row to DECIMAL(18,6) first so
  *     both engines accumulate identical exact decimals;
  *   - every query has a total ORDER BY with an id tiebreak;
  *   - aggregates are aliased to identical column names on both sides.
  */
object SparkEntry {

  def registry: Seq[QueryDef] =
    VectorQueries.all ++ IndexQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ RelationalQueries.all ++ PipelineQueries.all ++
      CurationQueries.all ++ HybridQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact top-10 L2² neighbors of vector 0 — the reference's core query
    * (`/root/reference/src/lib.rs:74-97`) incl. the self-query invariant
    * (`src/lib.rs:546-549`: first hit is the query row at distance 0). */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.qKnnExact(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a weaker rows-only
    * check from the driver. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
