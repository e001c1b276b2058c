package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{HnswIndex, HnswParams}
import graft.sources.BinaryVectorSource

/** End-to-end acceptance analog of the reference's semantic demo
  * (`/root/reference/semantic_search.py:33-46`): embed a tiny knowledge
  * base, round-trip the raw f32 bytes through the binary source (the
  * reference's mmap disk format), build the index, and assert the
  * semantically-matching document ranks FIRST for a natural-language
  * query. No embedding model exists in the sandbox, so the encoder is a
  * deterministic bag-of-words hash embedding plus a fixture synonym map
  * that folds query-side vocabulary onto corpus-side dimensions — the
  * geometry a real sentence encoder learns, supplied as a fixture. */
class SemanticSearchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val P = HnswParams(16, 32)

  private val docs = Seq(
    0L -> "Scala runs on the JVM and powers large data platforms.",
    1L -> "Gradient descent trains deep neural networks.",
    2L -> "Slow simmered tomato sauce needs ripe tomatoes and basil.",
    3L -> "Export controls intensify the global semiconductor rivalry.",
    4L -> "Binary search trees keep lookups logarithmic.",
    5L -> "Morning swims build endurance and lung capacity.")

  private val synonyms =
    Map("microchip" -> "semiconductor", "chip" -> "semiconductor", "war" -> "rivalry")

  /** Deterministic stand-in encoder: L2-normalized 64-dim bag-of-words
    * hash embedding (synonyms fold to one token first). */
  private def embed(text: String): Array[Float] = {
    val v = new Array[Float](64)
    text.toLowerCase.replaceAll("[^a-z ]", " ").split("\\s+").filter(_.nonEmpty).foreach { raw =>
      val t = synonyms.getOrElse(raw, raw)
      val h = t.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
      v((h % 64).toInt) += 1f
    }
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    if (n > 0) v.map(_ / n) else v
  }

  test("embed -> bin round-trip -> index -> query ranks the semiconductor doc first") {
    import spark.implicits._
    val df = docs.map { case (id, t) => (id, embed(t)) }.toDF("vec_id", "embedding")

    val tmp = java.nio.file.Files.createTempDirectory("graft_semantic_").toString
    BinaryVectorSource.write(df, tmp, dims = 64)
    val loaded = BinaryVectorSource.read(spark, tmp, dims = 64)
    assert(loaded.count() == docs.length.toLong)

    val idx = HnswIndex.build(loaded.withColumn("part", lit(0)), P)
    val q = Seq((0L, embed("Who is winning the microchip war?"))).toDF("qid", "qv")
    val hits = HnswIndex.search(idx, q, k = 2, P).orderBy("rank").collect()

    assert(hits.length == 2)
    assert(hits(0).getAs[Long]("vector_id") == 3L,
      s"expected the semiconductor doc first, got ${hits.toSeq}")
    assert(hits(0).getAs[Double]("dist") < hits(1).getAs[Double]("dist"),
      "the semantic match must be strictly closer than the runner-up")
  }
}
