package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile
import graft.queries.TextQueries

/** One-pass drift dashboard: the composed census must report EXACTLY
  * what each standalone gate reports — the panel is a cost win, never
  * a different number. */
class DriftPanelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("every panel column equals its standalone gate's value, source by source") {
    val panel = TextQueries.qDriftPanel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(panel.nonEmpty)

    val kl = TextQueries.qSourceKl(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val oov = TextQueries.qOovRate(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val zipf = TextQueries.qZipfSlope(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ks = TextQueries.qKsSources(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4), r.getDouble(5))).toMap

    assert(panel.keySet == kl.keySet && panel.keySet == oov.keySet &&
      panel.keySet == zipf.keySet && panel.keySet == ks.keySet)
    panel.foreach { case (src, row) =>
      assert((row.getLong(1), row.getDouble(2)) == kl(src), s"KL drifted for $src")
      assert((row.getLong(3), row.getDouble(4)) == oov(src), s"OOV drifted for $src")
      assert(row.getDouble(5) == zipf(src), s"Zipf drifted for $src")
      assert((row.getLong(6), row.getLong(7), row.getDouble(8)) == ks(src),
        s"KS drifted for $src")
    }
  }

  test("psiByGroup row g == psi(value, group===g, group=!=g) for every source") {
    val grouped = Profile.psiByGroup(docs, col("source"), col("n_chars"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(grouped.nonEmpty)
    grouped.foreach { case (g, (nG, nRest, nBins, psiMicro)) =>
      val lone = Profile.psi(docs, col("n_chars"),
          col("source") === g, col("source") =!= g)
        .head()
      assert((lone.getLong(0), lone.getLong(1), lone.getLong(2), lone.getLong(3)) ==
        (nG, nRest, nBins, psiMicro), s"PSI drifted for $g")
    }
  }

  test("panel is invariant to physical partitioning") {
    def run(parts: Int) = TextQueries.driftPanel(docs.repartition(parts))
      .collect().toSeq
    assert(run(1) == run(32))
  }
}
