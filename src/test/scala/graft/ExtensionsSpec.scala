package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: native kernels registered via
  * SparkSessionExtensions are callable from plain SQL. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.extensions", classOf[GraftExtensions].getName)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("l2sq_native / dot_native / cosine_native usable from SQL") {
    val r = spark.sql(
      """SELECT
        |  l2sq_native(array(1.0F, 2.0F), array(1.0F, 4.0F)) AS l2,
        |  dot_native(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dot,
        |  cosine_native(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos_same,
        |  cosine_native(array(1.0F, 0.0F), array(0.0F, 0.0F)) AS cos_zero
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 4.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.0)
  }

  test("bq_pack_native / bq_hamming_native usable from SQL") {
    val r = spark.sql(
      """SELECT
        |  bq_pack_native(array(1.0F, -1.0F, 0.0F, 2.0F, 3.0F), 5) AS packed,
        |  bq_hamming_native(
        |    bq_pack_native(array(1.0F, 1.0F), 2),
        |    bq_pack_native(array(-1.0F, 1.0F), 2)) AS ham
        |""".stripMargin).collect()(0)
    assert(r.getSeq[Long](0) == Seq(25L), "bits 0, 3, 4 -> 25")
    assert(r.getInt(1) == 1)
    // dim must be a literal — a column reference is a loud error
    val e = intercept[Exception] {
      spark.sql("SELECT bq_pack_native(array(1.0F), CAST(id AS INT)) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }
}
