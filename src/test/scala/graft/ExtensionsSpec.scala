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
}
