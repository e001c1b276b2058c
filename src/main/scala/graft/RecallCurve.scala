package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{HnswIndex, HnswParams, IvfIndex}

/** Measures the ANN quality-latency tradeoff the serving knobs buy:
  * recall@10 (vs exact brute force) as `efSearch` grows on the
  * un-routed beam, and as `nprobe` grows on the routed path — the two
  * levers a 100 TB deployment tunes. Prints a markdown table for
  * BASELINE.md. The oracle-gated queries pin these knobs at exhaustive
  * settings (ANN ≡ exact, hash-checkable); this main records what the
  * PRODUCTION settings give up, so the tradeoff is a published number
  * rather than only a ScalaTest threshold.
  *
  * Usage: `sbt "runMain graft.RecallCurve [sfDir]"`.
  */
object RecallCurve {

  private val P = HnswParams(m = 16, efConstruction = 32)
  private val K = 10
  private val NQueries = 64

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-recall")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = e.count()
    val queries = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    // ef curve: ONE graph over the whole corpus, so beam quality is
    // measured on an n-node small-world graph (per-cell graphs at this
    // sf are ~n/10 nodes and exact even at ef=16 — uninformative)
    val one = HnswIndex.build(e.withColumn("part", lit(0)), P)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    one.count() // materialize the build outside the timed region

    // nprobe curve: trained IVF cells + the same model as router — the
    // production routed-serving configuration (routing by an unrelated
    // partition key, e.g. the fixture's labels, is geometrically
    // near-random: measured recall ~= nprobe/L)
    val cells = 16
    val model = IvfIndex.train(e, k = cells, iters = 3)
    val routed = HnswIndex.build(
      IvfIndex.assign(e, model).withColumn("part", col("cell")), P)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    routed.count()

    // contrast: routing by the fixture's label partitions — a cell key
    // UNRELATED to vector geometry, i.e. what routing degrades to when
    // the coarse quantizer is never trained (expect recall ~ nprobe/L)
    val labelIdx = HnswIndex.build(e.withColumn("part", col("label")), P)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    labelIdx.count()
    val labelRouter = IvfIndex.fromPartitionMeans(e, "label", "embedding")
    val labelCells = labelRouter.k

    // cosine serving curve: the unit-normalized graph (its L2 walk
    // ranks by cosine) — quantifies what the round-6 cosine pipeline
    // gives up at production ef vs its own exhaustive ground truth
    val normed = e.select(col("vec_id"),
        graft.functions.VectorFunctions.l2Normalize(col("embedding")).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val oneCos = HnswIndex.build(normed.withColumn("part", lit(0)), P)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    oneCos.count()
    val queriesCos = normed.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    def top(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid"), col("vector_id"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    // exhaustive beam == exact: the ground truths (L2 and cosine)
    val exact = top(HnswIndex.search(one, queries, K, P, efSearch = 1 << 20))
    val exactCos = top(HnswIndex.search(oneCos, queriesCos, K, P, efSearch = 1 << 20))

    def measure(label: String, truth: Map[Long, Set[Long]], mk: => DataFrame): (String, Double, Double) = {
      val t0 = System.nanoTime()
      val got = top(mk)
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = truth.map { case (q, want) =>
        got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
      }.sum / truth.size
      (label, recall, sec)
    }

    val rows =
      Seq(10, 16, 32, 64, 128).map { ef =>
        measure(s"single graph, ef=$ef", exact,
          HnswIndex.search(one, queries, K, P, efSearch = ef))
      } ++ Seq(16, 32, 64).map { ef =>
        measure(s"cosine (unit graph), ef=$ef", exactCos,
          HnswIndex.search(oneCos, queriesCos, K, P, efSearch = ef))
      } ++ Seq(1, 2, 3, 5, 8).map { np =>
        measure(s"routed $cells trained cells, nprobe=$np (ef=256)", exact,
          HnswIndex.search(routed, queries, K, P, efSearch = 256,
            router = Some(model), nprobe = np))
      } ++ Seq(1, 3).map { np =>
        measure(s"routed $labelCells LABEL cells (untrained), nprobe=$np (ef=256)", exact,
          HnswIndex.search(labelIdx, queries, K, P, efSearch = 256,
            router = Some(labelRouter), nprobe = np))
      }

    println(s"\n### recall@$K vs serving knobs ($sfDir, n=$n, $NQueries queries, " +
      s"m=${P.m}, efConstruction=${P.efConstruction})\n")
    println("| config | recall@10 | wall sec |")
    println("|---|---|---|")
    rows.foreach { case (l, r, s) => println(f"| $l | $r%.3f | $s%.2f |") }
    spark.stop()
  }
}
