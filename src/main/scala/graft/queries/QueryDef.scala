package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus, when SQL
  * can express it, DuckDB oracle SQL the driver checks it against.
  * `oracle = None` → the driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Shared convention: deterministic double → decimal cast before any
    * SUM so both engines accumulate exact decimals (bit-identical when
    * cast back to double). See SparkEntry scaladoc. */
  val MoneyScale = "decimal(18,6)"
}
