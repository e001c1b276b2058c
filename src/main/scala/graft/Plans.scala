package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit diagnostic: prints the formatted physical plan of each
  * registered query so scan pruning, pushed filters, broadcast joins,
  * partial aggregation, and whole-stage codegen spans can be reviewed
  * (the 100 TB design checklist). Usage:
  *   runMain graft.Plans <sfDir> [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.registry
      .filter(q => only.isEmpty || only(q.name))
      .foreach { q =>
        println(s"\n==================== ${q.name} ====================")
        try q.fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
