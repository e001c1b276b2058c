package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.index.{Hnsw, HnswIndex, HnswParams}

/** ANN-index queries: deterministic level sampling, IVF-routed search,
  * per-partition HNSW build + search (SURVEY.md §7.2 M2/M3; reference
  * ops 9-14 + 16). */
object IndexQueries {

  private val P = HnswParams(m = 16, efConstruction = 32)

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Session-scoped memo: one value per live session + fixture dir, so
    * a harness run builds each model/index once instead of per query
    * execution (training inside the per-run query path re-issues the
    * same driver-side jobs every run — contention-fragile, and
    * retrain-per-query waste at scale). Keyed by applicationId +
    * startTime (unique per live context — identity hashes can collide)
    * and dropped when the owning session stops, so a recreated session
    * never receives a value bound to a dead one. */
  private[queries] final class SessionMemo[V] {
    private val cache =
      scala.collection.concurrent.TrieMap.empty[(String, String), (SparkSession, V)]
    def get(s: SparkSession, dir: String)(build: => V): V = {
      cache.filterInPlace { case (_, (sess, _)) => !sess.sparkContext.isStopped }
      val key = (s.sparkContext.applicationId + ":" + s.sparkContext.startTime, dir)
      // builds run inside Residency.pinning: every persistent RDD a
      // memo creates is session-lived by construction and must survive
      // the harness's between-query Residency.sweep
      cache.getOrElseUpdate(key, (s, graft.Residency.pinning(s)(build)))._2
    }
  }

  /** The label-partitioned index, built (and persisted) once per
    * session + fixture. */
  private val idxMemo = new SessionMemo[org.apache.spark.sql.Dataset[HnswIndex.IndexRow]]
  private def labelIndex(s: SparkSession, dir: String) =
    idxMemo.get(s, dir)(
      HnswIndex.build(emb(s, dir).withColumn("part", col("label")), P)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Router over the label cells: one centroid-aggregation job whose
    * result is O(L·d) driver-resident model parameters. */
  private val routerMemo = new SessionMemo[graft.index.IvfIndex.Model]
  private def labelRouter(s: SparkSession, dir: String) =
    routerMemo.get(s, dir)(
      graft.index.IvfIndex.fromPartitionMeans(emb(s, dir), "label", "embedding"))

  /** Persisted serving index: the label index written cell-partitioned
    * ([[HnswIndex.save]] → one parquet subtree per cell) and re-loaded
    * ([[HnswIndex.load]]) — the disk-backed store that IS the
    * reference's identity (`/root/reference/src/disk_store.rs:7-36`,
    * `src/lib.rs:344-347`). Queries against this Dataset scan the
    * saved files, so a routed search exercises partition pruning on
    * `part` for real: only the probed cells' subtrees are read. One
    * temp dir per JVM + fixture, removed on JVM exit. */
  private val persistMemo =
    new SessionMemo[org.apache.spark.sql.Dataset[HnswIndex.IndexRow]]
  private def persistedIndex(s: SparkSession, dir: String) =
    persistMemo.get(s, dir) {
      val p = java.nio.file.Files.createTempDirectory("graft_idx_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
      HnswIndex.save(labelIndex(s, dir), p.toString)
      HnswIndex.load(s, p.toString)
    }

  /** Compacted index: a deliberately fragmented build — the label
    * cells plus 20 undersized junk cells holding vec_id < 100 (the
    * debris a long-lived index accrues from [[HnswIndex.addBatch]]
    * routing trickles into fresh part keys) — then [[HnswIndex.compact]]
    * dissolves every sub-16 cell into its nearest surviving cell.
    * Built once per session + fixture. */
  private val compactMemo =
    new SessionMemo[org.apache.spark.sql.Dataset[HnswIndex.IndexRow]]
  private def compactedIndex(s: SparkSession, dir: String) =
    compactMemo.get(s, dir) {
      val fragmented = emb(s, dir).withColumn("part",
        when(col("vec_id") < 100,
          lit(100) + pmod(col("vec_id"), lit(20)).cast("int"))
          .otherwise(col("label").cast("int")))
      HnswIndex.compact(HnswIndex.build(fragmented, P), P, minCellSize = 16)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Capped-build index over a DELIBERATELY skewed layout: labels 0-7
    * all collapse into one hot cell (≫ the 64-vector cap), so
    * [[HnswIndex.build]]'s cell-size cap must split it into bounded
    * id-ordered sub-graphs — the guard against one executor task
    * materializing a skewed mega-cell at 100×. Search probes all
    * sub-parts of a cell together, so at exhaustive ef the answers are
    * identical to an uncapped build (ANN ≡ exact — the brute-force
    * oracle checks no vector was lost or duplicated across the
    * split). */
  private val cappedMemo =
    new SessionMemo[org.apache.spark.sql.Dataset[HnswIndex.IndexRow]]
  private def cappedIndex(s: SparkSession, dir: String) =
    cappedMemo.get(s, dir) {
      val skewed = emb(s, dir).withColumn("part",
        when(col("label") < 8, lit(0)).otherwise(col("label").cast("int")))
      HnswIndex.build(skewed, P, maxCellSize = 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** The [[cappedIndex]] REBALANCED: the hot cell's chunks become
    * first-class cells ([[HnswIndex.rebalance]] — parallel rebuild +
    * finer persisted pruning granularity, the inverse of compact's
    * dissolve). Exhaustive ef makes served answers invariant under
    * any repartitioning, so the brute-force oracle gates that the
    * split lost no vector, duplicated none, and corrupted no
    * adjacency. */
  private val rebalMemo =
    new SessionMemo[org.apache.spark.sql.Dataset[HnswIndex.IndexRow]]
  private def rebalancedIndex(s: SparkSession, dir: String) =
    rebalMemo.get(s, dir) {
      HnswIndex.rebalance(cappedIndex(s, dir), P, maxCellSize = 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Shard-merged index ([[HnswIndex.merge]] — the 100 TB
    * parallel-build path): the corpus splits into two DISJOINT halves
    * by id parity, each half builds its own label-partitioned index
    * INDEPENDENTLY (both number cells from the same label space, so
    * their part ids COLLIDE — the merge must re-key, not just union),
    * each is [[HnswIndex.save]]d and re-[[HnswIndex.load]]ed (the
    * persisted-shard hand-off the parallel build actually does), then
    * merged into one serving handle with NO cell rebuilt. Built once
    * per session + fixture. */
  private val mergedMemo =
    new SessionMemo[org.apache.spark.sql.Dataset[HnswIndex.IndexRow]]
  private def mergedIndex(s: SparkSession, dir: String) =
    mergedMemo.get(s, dir) {
      val e = emb(s, dir).withColumn("part", col("label"))
      val halves = Seq(0, 1).map { parity =>
        val idx = HnswIndex.build(e.filter(col("vec_id") % 2 === parity), P)
        val p = java.nio.file.Files.createTempDirectory(s"graft_shard${parity}_")
        sys.addShutdownHook {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
        }
        HnswIndex.save(idx, p.toString)
        HnswIndex.load(s, p.toString)
      }
      // merge() persists the union itself (before its duplicate-id
      // check) — no second persist here
      HnswIndex.merge(halves(0), halves(1))
    }

  /** Search over the [[mergedIndex]] — fresh query ids (114-117).
    * Exhaustive ef ⇒ the brute-force oracle over the FULL corpus gates
    * that the merge re-keyed both shards' colliding cell ids, lost no
    * vector, duplicated none, and left every shard graph intact. */
  def qAnnMerged(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = mergedIndex(s, dir)
    val queries = e.filter(col("vec_id") >= 114 && col("vec_id") < 118)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(idx, queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "merged")(idx))
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Search over the [[rebalancedIndex]] — fresh query ids (99-102). */
  def qAnnRebalanced(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = rebalancedIndex(s, dir)
    val queries = e.filter(col("vec_id") >= 99 && col("vec_id") < 103)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(idx, queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "rebalanced")(idx))
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Trained coarse quantizer: one Lloyd's iteration at k = 16 (init =
    * the 16 lowest-id vectors — decimal-exact and SQL-expressible, so
    * the TRAINED router itself sits under the oracle gate, not just the
    * fixture-label router). */
  private val trainedMemo = new SessionMemo[graft.index.IvfIndex.Model]
  private def trainedRouter(s: SparkSession, dir: String) =
    trainedMemo.get(s, dir)(
      graft.index.IvfIndex.train(emb(s, dir), k = 16, iters = 1))

  /** Index partitioned by the TRAINED cells (vs [[labelIndex]]'s
    * fixture labels) — the layout every real deployment serves from. */
  private val trainedIdxMemo =
    new SessionMemo[org.apache.spark.sql.Dataset[HnswIndex.IndexRow]]
  private def trainedIndex(s: SparkSession, dir: String) =
    trainedIdxMemo.get(s, dir) {
      val parted = graft.index.IvfIndex.assign(emb(s, dir), trainedRouter(s, dir))
        .withColumn("part", col("cell"))
      HnswIndex.build(parted, P)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Incrementally-maintained index: built WITHOUT the odd-id vectors
    * of labels 0-4, which then arrive via [[HnswIndex.addBatch]] — so
    * the gate covers both addBatch branches: labels 5+ pass through the
    * untouched anti-join, labels 0-4 take the dirty-cell rebuild. */
  private val incrMemo =
    new SessionMemo[org.apache.spark.sql.Dataset[HnswIndex.IndexRow]]
  private def incrementalIndex(s: SparkSession, dir: String) =
    incrMemo.get(s, dir) {
      val e = emb(s, dir).withColumn("part", col("label"))
      val late = (col("vec_id") % 2 === 1) && (col("label") < 5)
      val base = HnswIndex.build(e.filter(!late), P)
      HnswIndex.addBatch(base, e.filter(late), P)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Streaming-maintained index (VERDICT r6 item #7): the composition
    * of two separately-gated pieces — TRUE readStream execution
    * (PipelineQueries) and dirty-cell-incremental [[HnswIndex.addBatch]]
    * (q_ann_incremental). The even-id vectors form the base index; the
    * odd-id vectors are staged as FOUR parquet files and ingested with
    * `maxFilesPerTrigger = 1`, so foreachBatch drives four real
    * micro-batch addBatch generations (each persisted + materialized
    * before the previous unpersists — the lineage never stacks across
    * triggers). The final index must serve identically to a batch
    * build over the same rows: exhaustive ef ⇒ ≡ brute force over the
    * full corpus, independent of batch boundaries and file order. */
  private val streamIdxMemo =
    new SessionMemo[org.apache.spark.sql.Dataset[HnswIndex.IndexRow]]
  private def streamedIndex(s: SparkSession, dir: String) =
    streamIdxMemo.get(s, dir) {
      val e = emb(s, dir).withColumn("part", col("label"))
      val late = col("vec_id") % 2 === 1
      var idx = HnswIndex.build(e.filter(!late), P)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      idx.count()
      val stage = java.nio.file.Files.createTempDirectory("graft_stream_idx_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(stage).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
      e.filter(late).select("vec_id", "embedding", "label")
        .repartition(4, col("vec_id"))
        .write.mode("overwrite").parquet(stage.toString)
      val schema = s.read.parquet(stage.toString).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage.toString)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val prev = idx
          val next = HnswIndex.addBatch(prev,
              batch.withColumn("part", col("label")), P)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count()
          prev.unpersist()
          idx = next
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      idx
    }

  /** Search over the [[streamedIndex]]: post-stream serving must equal
    * brute force over the WHOLE corpus — a vector dropped or
    * duplicated by any micro-batch generation (or a corrupted
    * pass-through cell) surfaces as a hash mismatch. */
  def qStreamIndex(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = streamedIndex(s, dir)
    val queries = e.filter(col("vec_id") >= 55 && col("vec_id") < 59)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(idx, queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "streamed")(idx))
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** The corpus with unit-normalized vectors: on unit vectors
    * 1 − cos(a,b) = ‖â−b̂‖²/2 (a monotone map), so COSINE serving
    * reduces to the existing L2 walk over normalized vectors — no new
    * graph code. (The reference exposes a pub cosine kernel,
    * `/root/reference/src/lib.rs:32-47`, but never wires it to its
    * index; this closes that gap.) */
  private def embNorm(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).withColumn("embedding", l2Normalize(col("embedding")))

  /** Cosine-metric serving index: the label-partitioned HNSW built over
    * UNIT vectors — its L2 beam walk ranks by cosine. */
  private val cosIdxMemo =
    new SessionMemo[org.apache.spark.sql.Dataset[HnswIndex.IndexRow]]
  private def cosineIndex(s: SparkSession, dir: String) =
    cosIdxMemo.get(s, dir)(
      HnswIndex.build(embNorm(s, dir).withColumn("part", col("label")), P)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Router for the cosine index: centroids live in the SAME unit
    * space as the index vectors, so probe selection is cosine-native
    * (nearest mean direction), not a raw-space approximation. */
  private val cosRouterMemo = new SessionMemo[graft.index.IvfIndex.Model]
  private def cosineRouter(s: SparkSession, dir: String) =
    cosRouterMemo.get(s, dir)(
      graft.index.IvfIndex.fromPartitionMeans(embNorm(s, dir), "label", "embedding"))

  /** The ANN ≡ brute-force gates require `efSearch` to exceed every
    * probed cell (the beam then visits each connected component
    * exhaustively, so the DuckDB brute-force oracle is valid). A
    * hardcoded constant silently stops being exhaustive at larger
    * fixtures, so derive ef from the measured max cell size instead —
    * the precondition is checked, not assumed. One tiny agg job per
    * (session, fixture, index), memoized; floor of 4096 keeps today's
    * behavior bit-identical. */
  private val efMemo =
    new SessionMemo[scala.collection.concurrent.TrieMap[String, Int]]
  private def exhaustiveEf(s: SparkSession, dir: String, kind: String)(
      idx: => org.apache.spark.sql.Dataset[HnswIndex.IndexRow]): Int =
    efMemo.get(s, dir)(scala.collection.concurrent.TrieMap.empty)
      .getOrElseUpdate(kind, {
        val maxCell =
          idx.groupBy("part").count().agg(max("count")).head().getLong(0)
        math.max(4096L, maxCell + 1L).min(Int.MaxValue).toInt
      })

  /** Scalar-quantizer bounds (one bounds-aggregation job). */
  private val sqMemo = new SessionMemo[(Seq[Double], Seq[Double])]
  private def sqBounds(s: SparkSession, dir: String) = {
    import graft.index.ScalarQuantizer
    sqMemo.get(s, dir)(ScalarQuantizer.bounds(ScalarQuantizer.train(emb(s, dir))))
  }

  /** PQ codebooks (one init-collect job at iters = 0). */
  private val pqMemo = new SessionMemo[graft.index.ProductQuantizer.Model]
  private def pqModel(s: SparkSession, dir: String) =
    pqMemo.get(s, dir)(
      graft.index.ProductQuantizer.train(emb(s, dir), numSub = 8, k = 16, iters = 0))

  /** Level-sampling histogram (ref `src/lib.rs:144-150`): levels derive
    * from ids via a Knuth multiplicative hash, so the exponential-decay
    * histogram is reproducible and SQL-expressible. */
  def qHnswLevels(s: SparkSession, dir: String): DataFrame = {
    // pmod mirrors Hnsw.levelFor's floorMod (safe for ids that wrap)
    val u = (pmod(col("vec_id") * lit(2654435761L), lit(1000003L)) + 1L).cast("double") / 1000003.0
    emb(s, dir)
      .select(least(lit(62), floor(-log(u) * lit(P.mL)).cast("int")).as("level"))
      .groupBy("level").agg(count(lit(1)).as("n"))
      .orderBy("level")
  }

  /** Decimal-exact label-cell centroids + the `n` nearest cells to the
    * single query `q` (a one-column DataFrame holding the query
    * vector) — the engine-side twin of [[centSql]]/[[probesSingleSql]],
    * shared by [[qAnnIvf]] and [[qAnnIvfPq]] so the centroid + probe
    * construction has exactly one definition on each side of the gate.
    * The centroid table is O(L·d) and broadcast. */
  /** Per-label centroid table (label, cv): exact decimal mean per
    * dimension, packed back into a (pos-sorted) double array. O(L·d)
    * — broadcastable. */
  private def labelCentroids(e: DataFrame): DataFrame = e
    .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
    .groupBy("label", "pos")
    .agg((sum(col("x").cast("decimal(18,12)")).cast("double") / count(lit(1))).as("m"))
    .groupBy("label")
    .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))), s => s("m")).as("cv"))

  private def labelProbes(e: DataFrame, q: DataFrame, n: Int): DataFrame = {
    val qv = col(q.columns.head)
    val cent = labelCentroids(e)
    cent.crossJoin(broadcast(q))
      .select(col("label"), l2Sq(col("cv"), qv).as("cd"))
      .orderBy(col("cd").asc, col("label").asc)
      .limit(n)
      .select("label")
  }

  /** IVF search: label-mean centroids (exact decimal accumulation →
    * deterministic), probe the 3 nearest cells, brute-force within
    * probed cells, global top-10. The centroid table is tiny and
    * broadcast; the corpus scan touches only probed partitions — the
    * shape that scales to 100 TB (scan 3/L of the data). */
  def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
    e.join(broadcast(labelProbes(e, q, 3)), "label")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), l2SqNative(col("embedding"), col("qv")).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), round(col("d"), 3).as("dist"))
  }

  /** Per-partition HNSW build + search, label-partitioned. At this
    * fixture scale `efSearch` exceeds every cell size, so the beam
    * visits each connected component exhaustively and ANN ≡ exact —
    * which is what makes the DuckDB oracle (brute-force SQL) valid.
    * Recall at production ef is gated separately in ScalaTest. */
  def qAnnHnsw(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = labelIndex(s, dir)
    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(idx, queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "label")(idx))
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** The reference's actual serving path (`src/lib.rs:152-169`), routed:
    * each query descends the coarse router (label-cell centroids) to its
    * 3 nearest cells and runs the HNSW beam ONLY inside those cells —
    * scan cost is nprobe/L of the index, and on a [[HnswIndex.save]]d
    * layout the `part` predicate prunes to exactly the probed parquet
    * subtrees. `efSearch` exceeds every cell here, so routed ANN ≡
    * brute force within the probed cells — which is what the oracle
    * computes (same decimal-exact centroids, same probe choice). */
  def qAnnRouted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = labelIndex(s, dir)
    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(idx, queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "label")(idx),
        router = Some(labelRouter(s, dir)), nprobe = 3)
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Routed search with the adaptive probe cutoff: cells are probed
    * closest-first but stop once centroid distance exceeds 2× the
    * nearest cell's (max 3) — in-cluster queries touch 1-2 cells
    * where fixed nprobe=3 would scan all three. Same exhaustive-ef
    * equivalence as qAnnRouted, so the oracle applies the identical
    * cutoff in SQL. */
  def qAnnAdaptive(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = labelIndex(s, dir)
    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(idx, queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "label")(idx),
        router = Some(labelRouter(s, dir)), nprobe = 3, adaptiveAlpha = Some(2.0))
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** The centroid-graph router over the label cells, built once per
    * session + fixture from the O(L·d) flat-router artifact (zero
    * extra jobs — the graph build is driver-side over the model the
    * flat router already holds). */
  private val graphRouterMemo = new SessionMemo[graft.index.IvfIndex.GraphRouter]
  private def labelGraphRouter(s: SparkSession, dir: String) =
    graphRouterMemo.get(s, dir)(
      new graft.index.IvfIndex.GraphRouter(labelRouter(s, dir)))

  /** Routed search with the probe CHOICE made by the centroid-graph
    * walk ([[graft.index.IvfIndex.GraphRouter]] — HNSW over the
    * centroid table) instead of the flat O(L·d)-per-query centroid
    * scan: the second routing level a 100 TB index needs, where the
    * cell count itself (~50 k-500 k at ~1 M vectors/cell) makes flat
    * routing the serving bottleneck (FAISS's IVF_HNSW coarse-quantizer
    * shape). Everything downstream of the probe choice — cell
    * pruning, per-cell beam, bounded-heap merge — is byte-identical
    * to q_ann_routed.
    *
    * Gate anchor: at `routerEf ≥ L` the walk surfaces every centroid
    * and the double re-rank is bit-identical to the flat router's
    * probe order, so the oracle is EXACTLY the q_ann_routed replay
    * (decimal-exact centroids, probe-3 choice in SQL) on fresh query
    * ids. The production-ef behavior (approximate probe choice) is
    * pinned separately: RecallSpec floors probe-set recall at
    * ef ≪ L on a many-cell fixture, with measured distance-eval
    * counts (sublinearity) recorded in BASELINE.md. */
  def qAnnBigroute(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = labelIndex(s, dir)
    val router = labelRouter(s, dir)
    val queries = e.filter(col("vec_id") >= 110 && col("vec_id") < 114)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(idx, queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "label")(idx),
        router = Some(router), nprobe = 3,
        routerGraph = Some(labelGraphRouter(s, dir)),
        routerEf = math.max(64, router.k))
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** The full serving lifecycle under the gate: build → save
    * (cell-partitioned parquet) → load → routed search. Identical
    * semantics to qAnnRouted, but the scan side is the PERSISTED
    * layout, so the `part IN probes` predicate prunes to exactly the
    * probed parquet subtrees (PlanShapeSpec asserts the pruning) —
    * the property that makes a 100 TB index serve at nprobe/L scan
    * cost. Different query ids than qAnnRouted so the two rows gate
    * different answers. */
  def qAnnPersisted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = persistedIndex(s, dir)
    val queries = e.filter(col("vec_id") >= 4 && col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(idx, queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "persisted")(idx),
        router = Some(labelRouter(s, dir)), nprobe = 3)
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Search over the [[compactedIndex]]: exhaustive ef makes the
    * result invariant under any repartitioning — pre- and
    * post-compaction answers are identical by construction, so the
    * brute-force oracle checks that dissolving cells (reassign by
    * decimal-exact centroid distance + dirty-cell rebuild) lost no
    * vector and corrupted no adjacency. Distinct query ids from the
    * other ANN rows so this gates fresh answers. */
  def qAnnCompacted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = compactedIndex(s, dir)
    val queries = e.filter(col("vec_id") >= 8 && col("vec_id") < 12)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(idx, queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "compacted")(idx))
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Search over the [[cappedIndex]]: the hot cell (labels 0-7) split
    * into bounded sub-parts at build; exhaustive ef makes the result
    * invariant under the split, so the brute-force oracle gates that
    * capping loses no vector, duplicates none, and corrupts no
    * sub-graph adjacency. Fresh query ids (83-86). */
  def qAnnCapped(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = cappedIndex(s, dir)
    val queries = e.filter(col("vec_id") >= 83 && col("vec_id") < 87)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(idx, queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "capped")(idx))
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Routed search where BOTH the router and the cell layout come from
    * a TRAINED k-means quantizer (`IvfIndex.train(k = 16, iters = 1)`)
    * rather than fixture labels — the path a real deployment tunes
    * first. One Lloyd's iteration is decimal-exact (init = lowest-id
    * vectors, update = exact-decimal means), so the oracle replays the
    * identical training in SQL and then the identical routed search.
    * `efSearch` exceeds every cell ⇒ ANN ≡ brute force within probed
    * cells. */
  def qAnnTrained(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 16 && col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(trainedIndex(s, dir), queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "trained")(trainedIndex(s, dir)),
        router = Some(trainedRouter(s, dir)), nprobe = 3)
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Direct gate on [[HnswIndex.addBatch]]: build → addBatch → search
    * with exhaustive ef, so the answer must equal brute force over the
    * FULL corpus — a dropped/duplicated vector or corrupted adjacency
    * in either the rebuilt or the passed-through cells surfaces as a
    * hash mismatch. (q_ann_compacted gates addBatch only via compact's
    * internal call.) */
  def qAnnIncremental(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 20 && col("vec_id") < 24)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(incrementalIndex(s, dir), queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "incremental")(incrementalIndex(s, dir)))
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Metadata-filtered routed ANN (VERDICT r5 item #2): the predicate
    * (even vector ids) is evaluated in the index-scan stage before the
    * shuffle; the beam navigates the intact cell graphs but admits only
    * matching rows as hits. Exhaustive ef ⇒ the filtered result equals
    * filtered brute force within the probed cells, which is exactly
    * what the oracle computes (same centroids, same probes, candidate
    * predicate applied to the scored set). */
  def qAnnFiltered(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = labelIndex(s, dir)
    val queries = e.filter(col("vec_id") >= 30 && col("vec_id") < 34)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(idx, queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "label")(idx),
        router = Some(labelRouter(s, dir)), nprobe = 3,
        candidateFilter = Some(pmod(col("vector_id"), lit(2)) === 0))
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Payload-carrying label index (VERDICT r6 item #4): every row
    * packs `{bucket: vec_id % 3}` as a metadata attribute at build —
    * the index rows THEMSELVES carry the filterable attributes, so a
    * metadata predicate is evaluable in the scan stage with no side
    * join at query time. */
  private val metaIdxMemo =
    new SessionMemo[org.apache.spark.sql.Dataset[HnswIndex.IndexRow]]
  private def metaIndex(s: SparkSession, dir: String) =
    metaIdxMemo.get(s, dir)(
      HnswIndex.build(
        emb(s, dir).withColumn("part", col("label"))
          .withColumn("bucket", pmod(col("vec_id"), lit(3))),
        P, payloadCols = Seq("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Metadata-filtered routed ANN over the PAYLOAD map (q_ann_filtered
    * gates the id-arithmetic predicate; this gates the attribute path
    * real deployments use): the predicate reads the `bucket` attribute
    * packed into the index rows at build — evaluated in the index-scan
    * stage below the part exchange (plan-asserted), never joined at
    * query time. Exhaustive ef ⇒ equals attribute-filtered brute force
    * within the probed cells. */
  def qAnnFilteredMeta(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = metaIndex(s, dir)
    val queries = e.filter(col("vec_id") >= 49 && col("vec_id") < 53)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(idx, queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "meta")(idx),
        router = Some(labelRouter(s, dir)), nprobe = 3,
        candidateFilter = Some(element_at(col("payload"), "bucket") === "1"))
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Index with a deleted slice: [[HnswIndex.removeBatch]] drops the
    * `vec_id % 5 == 2` vectors of labels 0-3, so the gate exercises
    * BOTH branches — labels 4+ pass through the untouched anti-join,
    * labels 0-3 take the dirty-cell rebuild over survivors. */
  private val deletedMemo =
    new SessionMemo[org.apache.spark.sql.Dataset[HnswIndex.IndexRow]]
  private def deletedIndex(s: SparkSession, dir: String) =
    deletedMemo.get(s, dir) {
      val gone = emb(s, dir)
        .filter(col("vec_id") % 5 === 2 && col("label") < 4)
        .select("vec_id")
      HnswIndex.removeBatch(labelIndex(s, dir), gone, P)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Direct gate on [[HnswIndex.removeBatch]] (VERDICT r5 item #3):
    * build → remove a slice → exhaustive search must equal brute force
    * over the REMAINDER — a surviving tombstone, a dropped survivor, or
    * corrupted adjacency in either branch surfaces as a hash mismatch.
    * Query 37 is itself a removed vector: its self-match must be gone
    * while it still works as a query. */
  def qAnnDeleted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 34 && col("vec_id") < 38)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    HnswIndex.search(deletedIndex(s, dir), queries, k = 5, P,
        efSearch = exhaustiveEf(s, dir, "deleted")(deletedIndex(s, dir)))
      .select(col("qid"), col("rank").as("rnk"), col("vector_id").as("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Cosine-metric ANN serving end to end (VERDICT r5 item #1): the
    * query routes through unit-space centroids to its 3 nearest cells,
    * the HNSW beam walks the NORMALIZED graph (L2 on unit vectors ≡
    * cosine ranking), and the final top-5 is re-scored with the exact
    * double cosine on the RAW vectors — the same formula the oracle
    * computes, so cross-engine agreement doesn't depend on float
    * normalization noise. The walk over-fetches (k=8 → top-5 after
    * re-score) so a <1e-7 unit-space ranking wiggle at the k boundary
    * can't drop a true hit; with exhaustive ef the candidate set is
    * every vector in the probed cells, making ANN ≡ brute force there. */
  def qAnnCosine(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qWhere = col("vec_id") >= 26 && col("vec_id") < 30
    val queriesRaw = e.filter(qWhere)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val queriesUnit = embNorm(s, dir).filter(qWhere)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val idx = cosineIndex(s, dir)
    // the walk's hit set is bounded (q x 13 pairs) — collect it and
    // re-scan the corpus through a pushed-down id filter (In(vec_id)
    // prunes parquet row groups), instead of full-scanning the corpus
    // just to hash-probe a handful of ids. k+8 over-fetch covers
    // unit-space/raw-space rank wiggle at the top-5 boundary (exact-tie
    // groups wider than the margin belong to dedup, not search)
    val hitPairs = HnswIndex.search(idx, queriesUnit, k = 13, P,
        efSearch = exhaustiveEf(s, dir, "cosine")(idx),
        router = Some(cosineRouter(s, dir)), nprobe = 3)
      .select(col("qid"), col("vector_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    import s.implicits._
    val hits = hitPairs.toSeq.toDF("qid", "vec_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d").asc, col("vec_id").asc)
    e.select(col("vec_id"), col("embedding"))
      .filter(col("vec_id").isin(hitPairs.map(_._2).distinct.toSeq: _*))
      .join(broadcast(hits), Seq("vec_id"))
      .join(broadcast(queriesRaw), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        (lit(1.0d) - cosineNative(col("embedding"), col("qv"))).as("d"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      // `+ 0.0` normalizes IEEE -0.0 on self-match rows (q_knn_cosine)
      .select(col("qid"), col("rnk").cast("int").as("rnk"), col("vec_id"),
        (round(col("d"), 4) + lit(0.0)).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** The user-facing [[graft.VectorDB]] handle, opened on the fixture
    * with a trained-IVF index (`buildIndexIvf(16, 1)` — the same
    * decimal-exact one-iteration train as [[trainedRouter]], so the
    * trained-cells oracle applies) and exhaustive ef. */
  private val vdbMemo = new SessionMemo[graft.VectorDB]
  private def vdbHandle(s: SparkSession, dir: String) =
    vdbMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      val built = db.buildIndexIvf(numCells = 16, iters = 1)
      // derived, not assumed: ef must exceed every cell for ANN == exact
      db.efSearch = exhaustiveEf(s, dir, "vdb_ivf")(built)
      db
    }

  /** The trained handle with CENTROID-GRAPH routing enabled
    * ([[graft.VectorDB.graphRouteEf]] exhaustive — the probe choice
    * walks the centroid HNSW, everything downstream identical), so
    * the public-handle arm of q_ann_bigroute sits under its own
    * oracle. Separate memo: the knob is handle state, and mutating
    * the shared [[vdbHandle]] mid-run would leak into its gates. */
  private val vdbGraphMemo = new SessionMemo[graft.VectorDB]
  private def vdbGraphHandle(s: SparkSession, dir: String) =
    vdbGraphMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      val built = db.buildIndexIvf(numCells = 16, iters = 1)
      db.efSearch = exhaustiveEf(s, dir, "vdb_graph")(built)
      db.graphRouteEf = 64 // >= L = 16: exhaustive, flat-identical probes
      db
    }

  /** Public-handle centroid-graph routing: the q_vectordb_search
    * trained-cells contract served with the probe choice made by the
    * graph walk. At exhaustive graphRouteEf the probes are
    * bit-identical to flat routing, so the oracle is the SAME trained
    * probe-3 replay — pinned through the handle dispatch path on a
    * fresh query id. */
  def qVectordbBigroute(s: SparkSession, dir: String): DataFrame = {
    val qv = emb(s, dir).filter(col("vec_id") === 95L)
      .select(col("embedding")).head().getSeq[Float](0)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dist"), col("vec_id")) // bounded: k rows
    vdbGraphHandle(s, dir).search(qv, k = 5)
      .withColumn("rnk", row_number().over(w).cast("int"))
      .select(lit(95L).as("qid"), col("rnk"), col("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** The same handle WITHOUT an index — dispatch picks the exact
    * brute-force arm. (`open` is pay-as-you-go since r6 — no
    * validation job — but the handle is still memoized for symmetry
    * with [[vdbHandle]].) */
  private val vdbExactMemo = new SessionMemo[graft.VectorDB]
  private def vdbExactHandle(s: SparkSession, dir: String) =
    vdbExactMemo.get(s, dir)(
      graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P))

  /** Gate on the public `VectorDB.search` DISPATCH surface itself (ref
    * op 17, `src/lib.rs:344-352`) rather than the query objects: the
    * same query vector runs through BOTH arms — `ann` = open →
    * buildIndexIvf → routed HNSW search, `exact` = open → brute-force
    * fallback (no index) — so the user-facing API cannot drift from the
    * gated paths. */
  def qVectordbSearch(s: SparkSession, dir: String): DataFrame = {
    val qv = emb(s, dir).filter(col("vec_id") === 24L)
      .select(col("embedding")).head().getSeq[Float](0)
    val ann = vdbHandle(s, dir).search(qv, k = 5)
      .select(lit("ann").as("mode"), col("vec_id"), col("dist").as("d"))
    val exact = vdbExactHandle(s, dir).search(qv, k = 5)
      .select(lit("exact").as("mode"), col("vec_id"), col("dist").as("d"))
    ann.unionByName(exact)
      .orderBy("mode", "d", "vec_id")
      .select(col("mode"), col("vec_id"), round(col("d"), 3).as("dist"))
  }

  /** Gate on the DRIVER-LOCAL point-query fast path
    * ([[graft.VectorDB.searchLocal]] — the reference's in-process
    * single-query serving shape, `/root/reference/benchmark.py:26-33`):
    * the same trained-IVF handle as q_vectordb_search, served from the
    * driver-resident router + cached cell graphs. The walk runs at the
    * handle's exhaustive ef, so local routed ANN ≡ brute force within
    * the 3 probed trained cells — the oracle replays the trained
    * routing in SQL. A second searchLocal call (the cache-warm path
    * every real point query takes) must serve identical rows — gated
    * as mode='warm' vs mode='cold'. */
  def qVectordbLocal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qv = emb(s, dir).filter(col("vec_id") === 87L)
      .select(col("embedding")).head().getSeq[Float](0)
    val db = vdbHandle(s, dir)
    val cold = db.searchLocal(qv, k = 5)
    val warm = db.searchLocal(qv, k = 5)
    (cold.map { case (id, d) => ("cold", id, d) } ++
      warm.map { case (id, d) => ("warm", id, d) })
      .toDF("mode", "vec_id", "d")
      .orderBy(col("mode"), col("d"), col("vec_id"))
      .select(col("mode"), col("vec_id"), round(col("d"), 3).as("dist"))
  }

  /** Driver-local point serving under the COSINE metric (VERDICT r10
    * item #2 — the reference's own demo workload shape,
    * `/root/reference/semantic_search.py:33-46`, is cosine semantic
    * search): the unit-space graph walks driver-side, candidates
    * re-score to 1−cos from the stored vectors. All cells probed at
    * exhaustive ef, so local ≡ distributed ≡ global brute-force
    * cosine — mode='dist' (the distributed arm), 'local' (cold cache)
    * and 'warm' (cached cells) must all serve the same oracle top-5. */
  def qVectordbLocalCosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qv = emb(s, dir).filter(col("vec_id") === 94L)
      .select(col("embedding")).head().getSeq[Float](0)
    val db = vdbCosineHandle(s, dir)
    val dist = db.search(qv, k = 5).select(col("vec_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .sortBy { case (id, d) => (d, id) }
    val local = db.searchLocal(qv, k = 5)
    val warm = db.searchLocal(qv, k = 5)
    (dist.map { case (id, d) => ("dist", id, d) } ++
      local.map { case (id, d) => ("local", id, d) } ++
      warm.map { case (id, d) => ("warm", id, d) })
      .toDF("mode", "vec_id", "d")
      .orderBy(col("mode"), col("d"), col("vec_id"))
      .select(col("mode"), col("vec_id"), round(col("d"), 3).as("dist"))
  }

  /** Driver-local point serving under the DOT (MIPS) metric: the
    * augmented-space graph walks driver-side, candidates re-score to
    * −dot over the zero-padded query — bit-identical to the
    * distributed exact re-score (the augmentation coordinate
    * contributes exactly 0). Same three-mode identity as
    * [[qVectordbLocalCosine]]. */
  def qVectordbLocalDot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qv = emb(s, dir).filter(col("vec_id") === 101L)
      .select(col("embedding")).head().getSeq[Float](0)
    val db = vdbDotHandle(s, dir)
    val dist = db.search(qv, k = 5).select(col("vec_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .sortBy { case (id, d) => (d, id) }
    val local = db.searchLocal(qv, k = 5)
    val warm = db.searchLocal(qv, k = 5)
    (dist.map { case (id, d) => ("dist", id, d) } ++
      local.map { case (id, d) => ("local", id, d) } ++
      warm.map { case (id, d) => ("warm", id, d) })
      .toDF("mode", "vec_id", "d")
      .orderBy(col("mode"), col("d"), col("vec_id"))
      .select(col("mode"), col("vec_id"),
        (round(col("d"), 3) + lit(0.0)).as("dist"))
  }

  /** The all-cells L2 handle REBALANCED through the public surface
    * ([[graft.VectorDB.rebalance]] — mega-cells split into first-class
    * cells, router re-derived): probing every post-rebalance cell at
    * exhaustive ef makes serving ≡ global brute force, so the plain
    * oracle gates that the handle arm (split + router re-derivation +
    * cache handoff) lost nothing. */
  private val vdbRebalMemo = new SessionMemo[graft.VectorDB]
  private def vdbRebalancedHandle(s: SparkSession, dir: String) =
    vdbRebalMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexIvf(numCells = 4, iters = 1)
      val rb = db.rebalance(maxCellSize = 64)
      // derived, not assumed: probe every cell, ef above the largest
      // (one stats row — the same census the exhaustiveEf memo runs)
      val st = rb.stats.head()
      rb.nprobe = st.getAs[Long]("n_cells").toInt
      rb.efSearch =
        math.max(4096L, st.getAs[Long]("max_cell") + 1L).min(Int.MaxValue).toInt
      rb
    }

  /** Shard-merged SERVING handle ([[graft.VectorDB.mergeWith]] — the
    * handle-level arm of [[HnswIndex.merge]]): each id-parity half of
    * the corpus becomes its own handle with its OWN trained 4-cell
    * router (cell ids 0-3 in both shards — the collision the merge
    * re-keys), then the two merge into one handle whose router
    * re-derives from the merged layout. Exhaustive probing makes
    * serving ≡ global brute force, gating that the handle arm (index
    * merge + corpus union + router re-derivation) lost nothing. */
  private val vdbMergedMemo = new SessionMemo[graft.VectorDB]
  private def vdbMergedHandle(s: SparkSession, dir: String) =
    vdbMergedMemo.get(s, dir) {
      val e = emb(s, dir)
      def shard(parity: Int) = {
        val db = graft.VectorDB.fromDataFrame(
          e.filter(col("vec_id") % 2 === parity), dims = 64, P)
        db.buildIndexIvf(numCells = 4, iters = 1)
        db
      }
      val m = shard(0).mergeWith(shard(1))
      val st = m.stats.head()
      m.nprobe = st.getAs[Long]("n_cells").toInt
      m.efSearch =
        math.max(4096L, st.getAs[Long]("max_cell") + 1L).min(Int.MaxValue).toInt
      m
    }

  /** Gate on the public merge arm — fresh query ids (118-121). */
  def qVectordbMerged(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 118 && col("vec_id") < 122)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    vdbMergedHandle(s, dir).searchBatch(queries, k = 5)
      .select(col("qid"), col("rank").cast("int").as("rnk"), col("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Shared-artifact merged COMPRESSED handle (VERDICT r15 item #1 —
    * the corpus-global compressed build): ONE
    * [[graft.index.SharedTraining.train]] pass over the union corpus
    * (the same 16-trained-cell / iters=0-init-codebook shape as
    * [[vdbPqHandle]]'s build), then each id-parity half ENCODES
    * against the shared artifact ([[graft.VectorDB.buildIndexShared]]
    * — a map-only job, no per-shard training) and the two handles
    * merge (fingerprint-equal artifacts lift the compressed-merge
    * rejection). Because encode and cell assignment are per-row maps
    * of the shared artifact, the merged codes table is row-identical
    * to a single full-corpus shared build — so the oracle is exactly
    * the q_vectordb_pq trained-probe + ADC replay, at a fresh query
    * id. */
  private val vdbPqMergedMemo = new SessionMemo[graft.VectorDB]
  private def vdbPqMergedHandle(s: SparkSession, dir: String) =
    vdbPqMergedMemo.get(s, dir) {
      val t = graft.index.SharedTraining.train(emb(s, dir), dims = 64,
        mode = "pq", metric = graft.operators.Knn.L2,
        numCells = 16, routerIters = 1, numSub = 8, codebookK = 16,
        pqIters = 0)
      def shard(parity: Int) = {
        val db = graft.VectorDB.fromDataFrame(
          emb(s, dir).filter(col("vec_id") % 2 === parity), dims = 64, P)
        db.buildIndexShared(t)
        db
      }
      val m = shard(0).mergeWith(shard(1))
      m.nprobe = 3
      m
    }

  /** Gate on merged shared-artifact PQ serving — fresh query id (123):
    * trained-router probe selection AND init-codebook ADC ranking must
    * both survive the shard-encode + merge path bit-for-bit. */
  def qVectordbPqMerged(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 123L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbPqMergedHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Shared-artifact merged DOT (MIPS) handle — the dot twin of
    * [[vdbPqMergedHandle]]: the augmentation max-norm is trained ONCE
    * over the union corpus, so both shards' augmented geometries agree
    * and the dot-merge rejection lifts. Exhaustive probing ⇒ merged
    * serving ≡ global brute-force argmax dot (the q_vectordb_dot
    * oracle shape at a fresh query id). */
  private val vdbDotMergedMemo = new SessionMemo[graft.VectorDB]
  private def vdbDotMergedHandle(s: SparkSession, dir: String) =
    vdbDotMergedMemo.get(s, dir) {
      val t = graft.index.SharedTraining.train(emb(s, dir), dims = 64,
        mode = "ivf", metric = graft.operators.Knn.Dot,
        numCells = 4, routerIters = 1)
      def shard(parity: Int) = {
        val db = graft.VectorDB.fromDataFrame(
          emb(s, dir).filter(col("vec_id") % 2 === parity), dims = 64, P)
        db.buildIndexShared(t)
        db
      }
      val m = shard(0).mergeWith(shard(1))
      val st = m.stats.head()
      m.nprobe = st.getAs[Long]("n_cells").toInt
      m.efSearch =
        math.max(4096L, st.getAs[Long]("max_cell") + 1L).min(Int.MaxValue).toInt
      m
    }

  /** Gate on merged shared-artifact dot serving — fresh query id
    * (124). */
  def qVectordbDotMerged(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 124L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbDotMergedHandle(s, dir).search(qv, k = 5)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), (round(col("dist"), 3) + lit(0.0)).as("dist"))
  }

  /** Merge → REBALANCE composition (VERDICT r15 item #3): a merged
    * layout keeps Σ shard-cells forever — after hundreds of shards the
    * router probes a cell count no single build would produce — so the
    * 100 TB lifecycle is merge, then rebalance the merged result into
    * the bounded-cell layout a fresh build would have. Fresh shard
    * handles (the memoized [[vdbMergedHandle]] must keep serving
    * q_vectordb_merged — rebalance releases its parent's cache), then
    * [[graft.VectorDB.rebalance]] splits every over-cap merged cell
    * into first-class cells and RE-DERIVES the router over the split
    * layout. Exhaustive probing ⇒ serving ≡ global brute force, so the
    * oracle gates that the composition lost no vector, duplicated
    * none, and left every graph servable. */
  private val vdbMergedRebalMemo = new SessionMemo[graft.VectorDB]
  private def vdbMergedRebalancedHandle(s: SparkSession, dir: String) =
    vdbMergedRebalMemo.get(s, dir) {
      val e = emb(s, dir)
      def shard(parity: Int) = {
        val db = graft.VectorDB.fromDataFrame(
          e.filter(col("vec_id") % 2 === parity), dims = 64, P)
        db.buildIndexIvf(numCells = 4, iters = 1)
        db
      }
      val rb = shard(0).mergeWith(shard(1)).rebalance(maxCellSize = 64)
      val st = rb.stats.head()
      rb.nprobe = st.getAs[Long]("n_cells").toInt
      rb.efSearch =
        math.max(4096L, st.getAs[Long]("max_cell") + 1L).min(Int.MaxValue).toInt
      rb
    }

  /** N-WAY handle merge ([[graft.VectorDB.mergeAllWith]] — the
    * hundreds-of-shards form: one corpus union, one index union, one
    * duplicate-id aggregate, one router re-derivation, where a binary
    * fold re-checks the growing union per shard): FOUR id-residue
    * shards, each with its own trained 4-cell router (all four cell-id
    * spaces collide — the re-key is load-bearing ×4), merged in one
    * call. Exhaustive probing ⇒ serving ≡ global brute force. */
  private val vdbMergedManyMemo = new SessionMemo[graft.VectorDB]
  private def vdbMergedManyHandle(s: SparkSession, dir: String) =
    vdbMergedManyMemo.get(s, dir) {
      val e = emb(s, dir)
      def shard(residue: Int) = {
        val db = graft.VectorDB.fromDataFrame(
          e.filter(col("vec_id") % 4 === residue), dims = 64, P)
        db.buildIndexIvf(numCells = 4, iters = 1)
        db
      }
      val m = shard(0).mergeAllWith((1 to 3).map(shard))
      val st = m.stats.head()
      m.nprobe = st.getAs[Long]("n_cells").toInt
      m.efSearch =
        math.max(4096L, st.getAs[Long]("max_cell") + 1L).min(Int.MaxValue).toInt
      m
    }

  /** Compressed CELL SPLIT ([[graft.VectorDB.splitCells]] — compact's
    * mirror on the codes table, and the post-merge-chain maintenance a
    * fixed shared router needs: merging never adds cells, so rows pile
    * into the same L cells and per-probe cost grows with the corpus):
    * a 4-cell SQ handle splits every cell past 64 rows into
    * lowest-id-seeded sub-cells with exact-mean sub-centroids. Codes
    * never change (cell membership is routing metadata), so at
    * exhaustive probing serving ≡ the global SQ ADC ranking — the
    * plain SQ oracle gates that the split lost no row, duplicated
    * none, and left every new cell routable (an unroutable cell's rows
    * would vanish from the probed union). */
  private val vdbSqSplitMemo = new SessionMemo[graft.VectorDB]
  private def vdbSqSplitHandle(s: SparkSession, dir: String) =
    vdbSqSplitMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexSq(numCells = 4, routerIters = 1)
      val sp = db.splitCells(maxCellSize = 64)
      sp.nprobe = sp.stats.head().getAs[Long]("n_cells").toInt
      sp
    }

  /** Post-split RESHARE lifecycle ([[graft.VectorDB.reshare]] —
    * VERDICT r16 item #3, the arm that un-dead-ends a rolling
    * merge pipeline): shards A+B encode against a v1 artifact and
    * merge; the merged handle splits its oversized cells (shared
    * status drops — the split router diverged); `reshare()` mints a
    * v2 artifact from the split router + the carried global bounds
    * (zero jobs, no re-encoding); a LATE shard C encodes against v2
    * and merges in. Codes are global and probing is exhaustive, so
    * the final handle serves the plain full-corpus SQ ADC ranking —
    * the same oracle shape as q_vectordb_sq_split, which is exactly
    * the claim: two more lifecycle stages changed nothing the user
    * can observe. */
  private val vdbResharedMemo = new SessionMemo[graft.VectorDB]
  private def vdbResharedHandle(s: SparkSession, dir: String) =
    vdbResharedMemo.get(s, dir) {
      val e = emb(s, dir)
      val t1 = graft.index.SharedTraining.train(e, dims = 64,
        mode = "sq", metric = graft.operators.Knn.L2,
        numCells = 4, routerIters = 1)
      def shard(pred: org.apache.spark.sql.Column, t: graft.index.SharedTraining) = {
        val db = graft.VectorDB.fromDataFrame(e.filter(pred), dims = 64, P)
        db.buildIndexShared(t)
        db
      }
      val merged = shard(col("vec_id") % 4 < 2, t1)
        .mergeWith(shard(col("vec_id") % 4 === 2, t1))
      val split = merged.splitCells(maxCellSize = 64)
      val v2 = split.reshare()
      val fin = split.mergeAllWith(Seq(shard(col("vec_id") % 4 === 3, v2)))
      fin.nprobe = fin.stats.head().getAs[Long]("n_cells").toInt
      fin
    }

  /** Gate on the split → reshare → merge-more lifecycle — fresh query
    * id (135). */
  def qVectordbReshared(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 135L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbResharedHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Gate on COMPRESSED driver-local point serving (round 16 — the
    * zero-job arm extended to the PQ/SQ/BQ modes: probed cells' CODES
    * cache driver-side and rank through bit-exact ADC-kernel mirrors):
    * dist = the distributed routed ADC path, local = the first
    * driver-local serve (cells load, one narrow pruned job each),
    * warm = the second (zero jobs — pinned by the spec's listener).
    * All three must equal the trained-probe + ADC oracle replay.
    * Fresh query id (134). */
  def qVectordbLocalPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qv = emb(s, dir).filter(col("vec_id") === 134L)
      .select(col("embedding")).head().getSeq[Float](0)
    val db = vdbPqHandle(s, dir)
    val dist = db.search(qv, k = 10).select(col("vec_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .sortBy { case (id, d) => (d, id) }
    val local = db.searchLocal(qv, k = 10)
    val warm = db.searchLocal(qv, k = 10)
    (dist.map { case (id, d) => ("dist", id, d) } ++
      local.map { case (id, d) => ("local", id, d) } ++
      warm.map { case (id, d) => ("warm", id, d) })
      .toDF("mode", "vec_id", "d")
      .orderBy(col("mode"), col("d"), col("vec_id"))
      .select(col("mode"), col("vec_id"), round(col("d"), 3).as("dist"))
  }

  /** Gate on the compressed cell split — fresh query id (133). */
  def qVectordbSqSplit(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 133L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbSqSplitHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Gate on the N-way handle merge — fresh query ids (129-132). */
  def qVectordbMergedMany(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 129 && col("vec_id") < 133)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    vdbMergedManyHandle(s, dir).searchBatch(queries, k = 5)
      .select(col("qid"), col("rank").cast("int").as("rnk"), col("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Gate on the merge → rebalance composition — fresh query ids
    * (125-128). */
  def qVectordbMergedRebalanced(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 125 && col("vec_id") < 129)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    vdbMergedRebalancedHandle(s, dir).searchBatch(queries, k = 5)
      .select(col("qid"), col("rank").cast("int").as("rnk"), col("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Gate on the public rebalance arm — fresh query ids (103-106). */
  def qVectordbRebalanced(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 103 && col("vec_id") < 107)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    vdbRebalancedHandle(s, dir).searchBatch(queries, k = 5)
      .select(col("qid"), col("rank").cast("int").as("rnk"), col("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Batch diversity serving through the handle
    * ([[graft.VectorDB.searchDiverseBatch]] — ONE fetch job for the
    * whole batch, then per-query driver-side MMR picks): every cell
    * probed at exhaustive ef, so each query's fetch is its exact
    * top-16 and the oracle replays the per-qid greedy as unrolled SQL
    * stages. Fresh query ids (96-98). */
  def qMmrBatch(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 96 && col("vec_id") < 99)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    vdbAllCellsHandle(s, dir).searchDiverseBatch(queries, k = 4, fetch = 16)
      .select(col("qid"), col("rank").cast("int").as("rnk"), col("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Per-qid unrolled-greedy MMR oracle (the batch twin of
    * VectorQueries' single-query generator): stage i scores each
    * qid's unpicked candidates against that qid's selected set and
    * picks the max-m (id-asc tie) row per qid. */
  private def mmrBatchOracleSql(qWhere: String, k: Int, fetch: Int): String = {
    import VectorQueries.l2Sql
    val stages = (2 to k).map { i =>
      s"""sc$i AS (SELECT c.qid, c.vec_id,
         |  0.5 * (-c.d) - 0.5 * max(-(${l2Sql("c.embedding", "s.embedding")})) AS m, c.d AS d
         |  FROM cand c JOIN sel${i - 1} s ON s.qid = c.qid
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} x
         |                    WHERE x.qid = c.qid AND x.vec_id = c.vec_id)
         |  GROUP BY c.qid, c.vec_id, c.d),
         |p$i AS (SELECT qid, vec_id, d FROM
         |          (SELECT qid, vec_id, d,
         |             row_number() OVER (PARTITION BY qid ORDER BY m DESC, vec_id) AS rn
         |           FROM sc$i) WHERE rn = 1),
         |sel$i AS (SELECT qid, vec_id, embedding FROM sel${i - 1}
         |          UNION ALL
         |          SELECT c.qid, c.vec_id, c.embedding FROM cand c JOIN p$i USING (qid, vec_id))""".stripMargin
    }.mkString(",\n")
    val ranks = (1 to k)
      .map(i => s"SELECT qid, $i AS rnk, vec_id, d FROM p$i")
      .mkString("\n UNION ALL\n ")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE $qWhere),
       |cand AS (SELECT qid, vec_id, embedding, d FROM
       |           (SELECT q.qid, e.vec_id, e.embedding, ${l2Sql("e.embedding", "q.qv")} AS d,
       |              row_number() OVER (PARTITION BY q.qid
       |                ORDER BY ${l2Sql("e.embedding", "q.qv")}, e.vec_id) AS rn
       |            FROM embeddings e CROSS JOIN q) WHERE rn <= $fetch),
       |sc1 AS (SELECT qid, vec_id, 0.5 * (-d) AS m, d FROM cand),
       |p1 AS (SELECT qid, vec_id, d FROM
       |         (SELECT qid, vec_id, d,
       |            row_number() OVER (PARTITION BY qid ORDER BY m DESC, vec_id) AS rn
       |          FROM sc1) WHERE rn = 1),
       |sel1 AS (SELECT c.qid, c.vec_id, c.embedding FROM cand c JOIN p1 USING (qid, vec_id)),
       |$stages
       |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, round(d, 3) AS dist
       |FROM ($ranks) ORDER BY qid, rnk""".stripMargin
  }

  /** Gate on `VectorDB.add`'s ACCEPT path (ref op 4's happy case,
    * `src/lib.rs:62-72` — q_validate gates the reject case): append a
    * shifted copy of the corpus through the public handle, then exact
    * search over the union. Every hit appears at two ids with equal
    * distance, so the id tiebreak (originals first) is itself under
    * the gate. */
  def qVectordbAdd(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val grown = vdbExactHandle(s, dir).add(
      e.select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
    val qv = e.filter(col("vec_id") === 25L)
      .select(col("embedding")).head().getSeq[Float](0)
    grown.search(qv, k = 5)
      // explicit total order: don't rely on searchKnn's internal
      // orderBy().limit() surviving the outer projection + write
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Cosine-metric handle: trained IVF over the UNIT-normalized corpus,
    * exhaustive ef, nprobe = every cell — the handle-level gate covers
    * the dispatch + normalized-build + raw-cosine re-score path, and
    * with all cells probed ANN ≡ GLOBAL brute-force cosine, so the
    * oracle is the plain cosine kernel (selective-routing replay is
    * q_ann_cosine's job). */
  private val vdbCosMemo = new SessionMemo[graft.VectorDB]
  private def vdbCosineHandle(s: SparkSession, dir: String) =
    vdbCosMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      val built = db.buildIndexIvf(numCells = 16, iters = 1,
        metric = graft.operators.Knn.Cosine)
      db.efSearch = exhaustiveEf(s, dir, "vdb_cos")(built)
      db.nprobe = 16
      db
    }

  /** Gate on the public cosine-metric `VectorDB` serving path (the
    * user-facing composition of VERDICT r5 item #1): open →
    * buildIndexIvf(metric = cosine) → search must equal brute-force
    * cosine over the whole corpus. */
  def qVectordbCosine(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 39L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbCosineHandle(s, dir).search(qv, k = 5)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), (round(col("dist"), 4) + lit(0.0)).as("dist"))
  }

  /** L2 handle probing EVERY trained cell at exhaustive ef, so indexed
    * search ≡ global brute force — the configuration that lets
    * handle-surface gates use plain brute-force oracles (selective
    * routing replay is q_ann_trained / q_vectordb_search's job). */
  private val vdbAllMemo = new SessionMemo[graft.VectorDB]
  private def vdbAllCellsHandle(s: SparkSession, dir: String) =
    vdbAllMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      val built = db.buildIndexIvf(numCells = 16, iters = 1)
      db.efSearch = exhaustiveEf(s, dir, "vdb_all")(built)
      db.nprobe = 16
      db
    }

  /** Gate on the public `VectorDB.searchFiltered` surface (the
    * user-facing mirror of q_ann_filtered): the id predicate must
    * restrict the served set exactly — indexed search over every cell
    * at exhaustive ef ≡ filtered global brute force. */
  def qVectordbFiltered(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 40L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbAllCellsHandle(s, dir).searchFiltered(qv, k = 5, id => pmod(id, lit(3)) === 1)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Gate on the public `VectorDB.remove` surface (the user-facing
    * mirror of q_ann_deleted's index-level removeBatch): drop the
    * `vec_id % 7 == 3` slice through the handle, then exact search over
    * the remainder — a row surviving the anti-join (or a dropped
    * survivor) surfaces as a hash mismatch. Uses a distinct removal
    * predicate and query id from q_ann_deleted so the two rows gate
    * different answers. */
  def qVectordbRemove(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val shrunk = vdbExactHandle(s, dir).remove(
      e.filter(col("vec_id") % 7 === 3).select("vec_id"))
    val qv = e.filter(col("vec_id") === 38L)
      .select(col("embedding")).head().getSeq[Float](0)
    shrunk.search(qv, k = 5)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Full-serving-state persistence (VERDICT r6 item #3): open →
    * buildIndexIvf(16, 1) → tune → `save` → `load` — the LOADED handle
    * is what serves. Restoring from disk must reproduce the trained
    * router bit-exactly (doubles round-trip parquet losslessly), so at
    * nprobe = 3 the probe choice — the part of the answer that depends
    * on the persisted centroids — is decisive, and exhaustive ef makes
    * the within-probed-cells answer brute-force-exact. A restart
    * launches NO corpus-scale job (job-count asserted in ScalaTest). */
  private val vdbPersistMemo = new SessionMemo[graft.VectorDB]
  private def vdbPersistedHandle(s: SparkSession, dir: String) =
    vdbPersistMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      val built = db.buildIndexIvf(numCells = 16, iters = 1)
      db.efSearch = exhaustiveEf(s, dir, "vdb_persist")(built)
      db.nprobe = 3
      val p = java.nio.file.Files.createTempDirectory("graft_vdb_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
      db.save(p.toString)
      graft.VectorDB.load(s, p.toString)
    }

  /** Gate on the save → load → search round trip through the public
    * handle: the loaded handle's routed batch answer must equal the
    * trained-cells oracle — same decimal-exact train, same probe
    * policy — which it can only do if the persisted centroids, metric,
    * and knobs survived the restart bit-for-bit. */
  def qVectordbPersisted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 45 && col("vec_id") < 49)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    vdbPersistedHandle(s, dir).searchBatch(queries, k = 5)
      .select(col("qid"), col("rank").as("rnk"), col("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Payload-carrying L2 handle: trained IVF cells with the fixture's
    * `label` packed as a payload attribute, every cell probed at
    * exhaustive ef — so attribute-filtered serving ≡ attribute-filtered
    * global brute force. */
  private val vdbMetaMemo = new SessionMemo[graft.VectorDB]
  private def vdbMetaHandle(s: SparkSession, dir: String) =
    vdbMetaMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      val built = db.buildIndexIvf(numCells = 16, iters = 1,
        payloadCols = Seq("label"))
      db.efSearch = exhaustiveEf(s, dir, "vdb_meta")(built)
      db.nprobe = 16
      db
    }

  /** Gate on the public `VectorDB.searchWhere` surface (the handle
    * mirror of q_ann_filtered_meta): the predicate reads the `label`
    * attribute from the payload map the build packed — a REAL
    * attribute filter through the public API, equal to label-filtered
    * brute force with all cells probed. */
  def qVectordbMeta(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 59L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbMetaHandle(s, dir)
      .searchWhere(qv, k = 5, element_at(col("payload"), "label").cast("int") <= 4)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Gate on `VectorDB.searchBatchWhere` — the filtered BATCH serving
    * shape (one job, many queries, attribute predicate): same payload
    * handle as q_vectordb_meta, per-qid results must equal
    * label-filtered brute force (all cells probed, exhaustive ef). */
  def qVectordbBatchWhere(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 62 && col("vec_id") < 65)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    vdbMetaHandle(s, dir)
      .searchBatchWhere(queries, k = 5,
        element_at(col("payload"), "label").cast("int") <= 4)
      .select(col("qid"), col("rank").as("rnk"), col("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Gate on the public `VectorDB.searchBatch` surface — the amortized
    * serving shape (one job per BATCH, not per query; the reference
    * loops point queries, `/root/reference/benchmark.py:26-33`, and
    * BASELINE.md measures ~0.2 s scheduling overhead per point query
    * that batching amortizes). The SAME 3-query batch runs through all
    * three dispatch arms — `ann` (all cells probed at exhaustive ef ≡
    * global brute force), `exact` (no index → knnJoin), `cosine`
    * (unit-graph walk + raw re-score, all cells ≡ global brute-force
    * cosine) — so the batch API cannot drift from the gated
    * single-query semantics on any arm. */
  def qVectordbBatch(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 41 && col("vec_id") < 44)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val ann = vdbAllCellsHandle(s, dir).searchBatch(queries, k = 5)
      .select(lit("ann").as("mode"), col("qid"), col("rank").as("rnk"),
        col("vec_id"), round(col("dist"), 3).as("dist"))
    val exact = vdbExactHandle(s, dir).searchBatch(queries, k = 5)
      .select(lit("exact").as("mode"), col("qid"), col("rank").as("rnk"),
        col("vec_id"), round(col("dist"), 3).as("dist"))
    val cos = vdbCosineHandle(s, dir).searchBatch(queries, k = 5)
      .select(lit("cosine").as("mode"), col("qid"), col("rank").as("rnk"),
        col("vec_id"), (round(col("dist"), 4) + lit(0.0)).as("dist"))
    ann.unionByName(exact).unionByName(cos).orderBy("mode", "qid", "rnk")
  }

  /** Compressed-serving handles (VERDICT r6 item #6): the public API
    * now reaches the gated IVF-PQ/SQ paths. The PQ handle routes at
    * nprobe = 3 through the trained router (probe choice under the
    * gate); the SQ handle probes every cell, so its ADC ranking is
    * global and the plain SQ oracle applies. */
  private val vdbPqMemo = new SessionMemo[graft.VectorDB]
  private def vdbPqHandle(s: SparkSession, dir: String) =
    vdbPqMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexPq(numCells = 16, routerIters = 1, numSub = 8,
        codebookK = 16, pqIters = 0)
      db.nprobe = 3
      db
    }

  private val vdbSqMemo = new SessionMemo[graft.VectorDB]
  private def vdbSqHandle(s: SparkSession, dir: String) =
    vdbSqMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexSq(numCells = 16, routerIters = 1)
      db.nprobe = 16
      db
    }

  /** Gate on public IVF-PQ serving: open → buildIndexPq → search must
    * equal the trained-router probe selection + init-codebook ADC
    * ranking the oracle replays (routing AND compression both decisive
    * through the public handle). */
  def qVectordbPq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 53L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbPqHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** OPQ handle ([[graft.VectorDB.buildIndexOpq]]): router, codebooks,
    * and codes trained/served in the energy-balanced permuted space,
    * queries entering it through the handle's own reduction. */
  private val vdbOpqMemo = new SessionMemo[graft.VectorDB]
  private def vdbOpqHandle(s: SparkSession, dir: String) =
    vdbOpqMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexOpq(numCells = 16, routerIters = 1, numSub = 8,
        codebookK = 16, pqIters = 0)
      db.nprobe = 3
      db
    }

  /** Gate on OPQ handle serving: trained-router probes and ADC ranking
    * BOTH replay in the permuted space — a query or code entering the
    * wrong space (or a permutation drifting between router and
    * codebooks) is a hash mismatch. */
  def qVectordbOpq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 45L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbOpqHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Maintained-ADD OPQ handle: 5 shifted twins appended through the
    * public handle — the batch must encode through the STORED
    * permutation + model (nprobe = all cells so the oracle skips probe
    * replay, the add-gate convention). */
  private val vdbOpqAddMemo = new SessionMemo[graft.VectorDB]
  private def vdbOpqAddHandle(s: SparkSession, dir: String) =
    vdbOpqAddMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexOpq(numCells = 16, routerIters = 1, numSub = 8,
        codebookK = 16, pqIters = 0)
      db.nprobe = 16
      val e = emb(s, dir)
      db.add(e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 300000L).as("vec_id"), col("embedding")))
    }

  /** Gate on OPQ maintained-codes ADD: row 3's shifted twin must
    * surface from the APPENDED codes at the identical ADC distance —
    * an added batch bypassing the stored permutation would encode in
    * the wrong space and mismatch. */
  def qVectordbOpqAdd(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 3L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbOpqAddHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Save/load round-trip of the OPQ handle (the permutation rides the
    * manifest; codes + codebooks + router ride parquet). */
  private val vdbOpqPersistMemo = new SessionMemo[graft.VectorDB]
  private def vdbOpqPersistedHandle(s: SparkSession, dir: String) =
    vdbOpqPersistMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexOpq(numCells = 16, routerIters = 1, numSub = 8,
        codebookK = 16, pqIters = 0)
      db.nprobe = 3
      val p = java.nio.file.Files.createTempDirectory("graft_vdb_opq_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
      db.save(p.toString)
      graft.VectorDB.load(s, p.toString)
    }

  /** Gate on persisted OPQ serving: the RESTORED handle must replay
    * the identical permuted-space pipeline — a lost or re-derived
    * permutation, or codes restored into the wrong space, mismatches. */
  def qVectordbOpqPersisted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 46L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbOpqPersistedHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Gate on exact-refined compressed serving — the standard IVFADC
    * re-ranking step through the public handle
    * ([[graft.VectorDB.searchRefined]]): ADC ranks the probed cells to
    * top-(k·refine), then ONLY that bounded set re-scores with exact
    * L2² on the raw vectors. The oracle replays the whole composition
    * (trained probes → init-codebook ADC → candidate cut → exact
    * re-score), so routing, compression, the cut boundary, and the
    * refine pass are ALL decisive. */
  def qVectordbPqRefined(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 78L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbPqHandle(s, dir).searchRefined(qv, k = 5, refine = 4)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Gate on BATCH exact-refined compressed serving
    * ([[graft.VectorDB.searchBatchRefined]]): one ADC job ranks a
    * 3-query batch's probed codes to top-(k·refine), one In(id) scan
    * re-scores the candidate union exactly; the oracle replays the
    * per-qid composition (probes → ADC → cut → exact re-rank). */
  def qVectordbBatchRefined(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 79 && col("vec_id") < 82)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    vdbPqHandle(s, dir).searchBatchRefined(queries, k = 5, refine = 4)
      .select(col("qid"), col("rank").as("rnk"), col("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Gate on exact-refined int8-SQ serving — [[qVectordbPqRefined]]'s
    * contract on the OTHER compressed mode: global SQ ADC ranking
    * (every cell probed) cut at top-(k·refine), then the exact L2²
    * re-rank. */
  def qVectordbSqRefined(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 82L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbSqHandle(s, dir).searchRefined(qv, k = 5, refine = 4)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Cosine compressed handles (VERDICT r8 item #1): the reference's
    * own demo workload is cosine semantic search over normalized text
    * embeddings (`/root/reference/semantic_search.py:29-46`), and until
    * now that workload couldn't use the memory-efficient serving mode.
    * The PQ handle routes at nprobe = 3 through the unit-space trained
    * router (probe choice under the gate); the SQ handle probes every
    * cell, so its unit-space ADC ranking is global. */
  private val vdbPqCosMemo = new SessionMemo[graft.VectorDB]
  private def vdbPqCosHandle(s: SparkSession, dir: String) =
    vdbPqCosMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexPq(numCells = 16, routerIters = 1, numSub = 8,
        codebookK = 16, pqIters = 0, metric = graft.operators.Knn.Cosine)
      db.nprobe = 3
      db
    }

  private val vdbSqCosMemo = new SessionMemo[graft.VectorDB]
  private def vdbSqCosHandle(s: SparkSession, dir: String) =
    vdbSqCosMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexSq(numCells = 16, routerIters = 1,
        metric = graft.operators.Knn.Cosine)
      db.nprobe = 16
      db
    }

  /** Dot-metric SQ handle: bounds train over the norm-AUGMENTED corpus
    * (the same Bachrach reduction the HNSW dot arm uses), every cell
    * probed ⇒ the augmented-space ADC ranking is global and the
    * augmented oracle replays it. */
  private val vdbSqDotMemo = new SessionMemo[graft.VectorDB]
  private def vdbSqDotHandle(s: SparkSession, dir: String) =
    vdbSqDotMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexSq(numCells = 16, routerIters = 1,
        metric = graft.operators.Knn.Dot)
      db.nprobe = 16
      db
    }

  /** Gate on COSINE compressed serving (VERDICT r8 item #1): open →
    * buildIndexPq(metric = cosine) → search must equal the unit-space
    * trained-router probe selection + unit-space init-codebook ADC
    * ranking the oracle replays — the normalize reduction, the
    * routing, and the compression are all decisive through the public
    * handle. */
  def qVectordbPqCosine(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 83L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbPqCosHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Gate on exact-refined COSINE compressed serving: unit-space ADC
    * ranks the probed codes to top-(k·refine), then ONLY that bounded
    * set re-scores with exact 1−cosine on the RAW vectors — the refine
    * pass must re-rank in the handle's metric, not hardwired L2². */
  def qVectordbPqCosineRefined(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 84L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbPqCosHandle(s, dir).searchRefined(qv, k = 5, refine = 4)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), (round(col("dist"), 4) + lit(0.0)).as("dist"))
  }

  /** Gate on COSINE int8-SQ serving: bounds trained over the UNIT
    * corpus, unit-space encode + ADC, all cells probed ≡ global
    * unit-space SQ ranking. */
  def qVectordbSqCosine(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 85L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbSqCosHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Gate on DOT (MIPS) int8-SQ serving: the corpus norm-augments, the
    * query 0-extends, and the augmented-space ADC ranking (all cells
    * probed) must equal the oracle's replay of the same reduction +
    * quantization. */
  def qVectordbSqDot(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 86L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbSqDotHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Cosine PQ handle saved + reloaded: the unit-space codes, the
    * unit-space router, the codebooks, AND the metric must all
    * round-trip disk — a lost metric would serve raw-space ADC against
    * unit-space codes. */
  private val vdbPqCosPersistMemo = new SessionMemo[graft.VectorDB]
  private def vdbPqCosPersistedHandle(s: SparkSession, dir: String) =
    vdbPqCosPersistMemo.get(s, dir) {
      val db = vdbPqCosHandle(s, dir)
      val p = java.nio.file.Files.createTempDirectory("graft_vdb_pqcos_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
      db.save(p.toString)
      graft.VectorDB.load(s, p.toString)
    }

  /** Gate on cosine-compressed persistence: save → load → unit-space
    * routed ADC through the restored state ≡ the same composed oracle
    * as [[qVectordbPqCosine]] at a distinct query id. */
  def qVectordbPqCosPersisted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 89L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbPqCosPersistedHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Gate on exact-refined DOT compressed serving: augmented-space SQ
    * ADC ranks to top-(k·refine), then the bounded set re-scores with
    * exact −dot on the RAW vectors — the metric-aware refine on the
    * third metric. */
  def qVectordbSqDotRefined(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 90L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbSqDotHandle(s, dir).searchRefined(qv, k = 5, refine = 4)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), (round(col("dist"), 3) + lit(0.0)).as("dist"))
  }

  /** Dot-metric PQ handle — the last metric × compressed-mode cell:
    * the corpus norm-augments to 65 dims and zero-pads to 72 (PQ
    * subspaces must divide the width; pads are metric-neutral), giving
    * 8 subspaces of 9 dims. Every cell probed ⇒ the padded
    * augmented-space ADC ranking is global. */
  private val vdbPqDotMemo = new SessionMemo[graft.VectorDB]
  private def vdbPqDotHandle(s: SparkSession, dir: String) =
    vdbPqDotMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexPq(numCells = 16, routerIters = 1, numSub = 8,
        codebookK = 16, pqIters = 0, metric = graft.operators.Knn.Dot)
      db.nprobe = 16
      db
    }

  /** Gate on DOT (MIPS) product-quantized serving: augment → pad →
    * encode → ADC against the 0-extended query, replayed by the oracle
    * over the padded augmented corpus with 9-wide subspace slices. */
  def qVectordbPqDot(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 91L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbPqDotHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Maintained-ADD PQ handle (VERDICT r8 item #3): L2 PQ build, then
    * rows 0-4 re-appended under shifted ids through `VectorDB.add` —
    * the batch encodes with the EXISTING model and its codes rows
    * append; the resident codes never re-encode (plan-asserted in
    * ScalaTest). All cells probed ⇒ ADC ranking over the union codes
    * is global. */
  private val vdbPqAddMemo = new SessionMemo[graft.VectorDB]
  private def vdbPqAddHandle(s: SparkSession, dir: String) =
    vdbPqAddMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexPq(numCells = 16, routerIters = 1, numSub = 8,
        codebookK = 16, pqIters = 0)
      db.nprobe = 16
      val e = emb(s, dir)
      db.add(e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 300000L).as("vec_id"), col("embedding")))
    }

  /** Gate on maintained-codes ADD: the query is row 2's own embedding,
    * so its shifted twin must surface from the APPENDED codes at the
    * identical ADC distance (id tiebreak under the gate) — one
    * appended row keeps ADC serving instead of silently degrading the
    * handle to brute force. */
  def qVectordbPqAdd(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 2L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbPqAddHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Maintained-REMOVE SQ handle: every `vec_id ≡ 7 (mod 11)` removed
    * through the public handle — the codes table anti-joins (bounds
    * stay build-time), serving stays ADC. */
  private val vdbSqRmMemo = new SessionMemo[graft.VectorDB]
  private def vdbSqRemoveHandle(s: SparkSession, dir: String) =
    vdbSqRmMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexSq(numCells = 16, routerIters = 1)
      db.nprobe = 16
      val e = emb(s, dir)
      db.remove(e.filter(col("vec_id") % 11 === 7).select("vec_id"))
    }

  /** Gate on maintained-codes REMOVE: ADC ranking over the pruned
    * codes (build-time bounds, all cells probed) ≡ the global SQ
    * oracle restricted to the surviving rows — a removed id surfacing,
    * or a survivor dropped by the anti-join, is a hash mismatch. */
  def qVectordbSqRemove(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 87L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbSqRemoveHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Upsert on a COMPRESSED handle: rows 0-4 replaced with the
    * embeddings of rows 10-14 through `VectorDB.upsert` — the codes
    * table anti-joins the removed ids, the replacement batch encodes
    * with the BUILD-time model (codebooks/router never retrain on
    * churn), and serving stays ADC end to end. */
  private val vdbPqUpsertMemo = new SessionMemo[graft.VectorDB]
  private def vdbPqUpsertHandle(s: SparkSession, dir: String) =
    vdbPqUpsertMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexPq(numCells = 16, routerIters = 1, numSub = 8,
        codebookK = 16, pqIters = 0)
      db.nprobe = 16
      val e = emb(s, dir)
      val repl = e.filter(col("vec_id") < 5).alias("t")
        .join(e.alias("r"), col("r.vec_id") === col("t.vec_id") + 10L)
        .select(col("t.vec_id"), col("r.embedding"))
      db.upsert(repl)
    }

  /** Gate on replace-or-insert over maintained codes: after the
    * upsert, row 2 carries row 12's embedding, so querying with that
    * embedding must surface BOTH ids at row 12's self-ADC distance —
    * the whole ranking must equal global ADC over the replaced corpus
    * encoded with the build-time codebooks. */
  def qVectordbPqUpsert(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 12L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbPqUpsertHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Live ingest into a COMPRESSED handle — the codes mirror of
    * [[streamedVdbHandle]]: the full fixture opens with IVF-PQ
    * serving, then 20 shifted rows arrive as a 4-file parquet STREAM
    * whose foreachBatch generations land in an ingest log and fold in
    * through `VectorDB.add` — each generation encodes ONLY its batch
    * with the build-time model, appends codes rows, and releases the
    * superseded generation (the cache never stacks across triggers). */
  private val vdbPqStreamMemo = new SessionMemo[graft.VectorDB]
  private def streamedPqHandle(s: SparkSession, dir: String) =
    vdbPqStreamMemo.get(s, dir) {
      val e = emb(s, dir)
      val base = java.nio.file.Files.createTempDirectory("graft_vdb_pq_stream_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
      var db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexPq(numCells = 16, routerIters = 1, numSub = 8,
        codebookK = 16, pqIters = 0)
      db.nprobe = 16
      val stage = s"$base/stage"
      e.filter(col("vec_id") < 20)
        .select((col("vec_id") + 400000L).as("vec_id"), col("embedding"))
        .repartition(4, col("vec_id"))
        .write.mode("overwrite").parquet(stage)
      val schema = s.read.parquet(stage).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], gen: Long) =>
          val p = s"$base/gen_$gen"
          batch.write.mode("overwrite").parquet(p)
          db = db.add(s.read.parquet(p))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      db
    }

  /** Gate on streaming ingest over maintained codes — the composition
    * of the gated pieces (true readStream micro-batches, per-batch
    * codes encode/append, ADC serving): post-stream search must equal
    * global ADC over corpus ∪ streamed rows under the build-time
    * codebooks — a codes row dropped or duplicated by any generation
    * surfaces as a hash mismatch. */
  def qVectordbPqStream(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 7L)
      .select(col("embedding")).head().getSeq[Float](0)
    streamedPqHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Compacted COMPRESSED handle: IVF-PQ build, then
    * `compact(avg-cell-size + 1)` — guaranteed to dissolve at least
    * one below-average cell at every SF. Dissolved cells' rows
    * re-route to surviving centroids (codes unchanged — they encode
    * against global codebooks) and the router restricts to survivors.
    * All surviving cells probed ⇒ ADC ranking is global, so the gate
    * is LOSSLESSNESS: a row lost or duplicated in dissolution is a
    * hash mismatch; the structural shrink is asserted in ScalaTest. */
  private val vdbPqCompactMemo = new SessionMemo[graft.VectorDB]
  private def vdbPqCompactHandle(s: SparkSession, dir: String) =
    vdbPqCompactMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexPq(numCells = 16, routerIters = 1, numSub = 8,
        codebookK = 16, pqIters = 0)
      db.nprobe = 16
      db.compact(minCellSize = (db.len / 16L + 1L).toInt)
    }

  /** Gate on codes-table defrag through the public handle. */
  def qVectordbPqCompact(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 92L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbPqCompactHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Payload-carrying PQ handle (VERDICT r8 item #4): the fixture's
    * `label` packs into the codes rows at encode, so attribute
    * predicates reach compressed serving. All cells probed ⇒ filtered
    * ADC ranking is global. */
  private val vdbPqMetaMemo = new SessionMemo[graft.VectorDB]
  private def vdbPqMetaHandle(s: SparkSession, dir: String) =
    vdbPqMetaMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexPq(numCells = 16, routerIters = 1, numSub = 8,
        codebookK = 16, pqIters = 0, payloadCols = Seq("label"))
      db.nprobe = 16
      db
    }

  /** Gate on `searchWhere` over compressed serving: the predicate
    * reads the `label` attribute from the payload map the codes rows
    * carry — the result must equal label-filtered global ADC
    * ranking. */
  def qVectordbPqMeta(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 88L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbPqMetaHandle(s, dir)
      .searchWhere(qv, k = 10, element_at(col("payload"), "label").cast("int") <= 4)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** PQ handle saved + reloaded: the codes table round-trips CELL-
    * PARTITIONED (probe pruning holds on the restored layout), the
    * codebooks and router reload from their model parquets, and the
    * LOADED handle's routed ADC answer must equal the same composed
    * oracle as [[qVectordbPq]] — decisive on every persisted piece. */
  private val vdbPqPersistMemo = new SessionMemo[graft.VectorDB]
  private def vdbPqPersistedHandle(s: SparkSession, dir: String) =
    vdbPqPersistMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexPq(numCells = 16, routerIters = 1, numSub = 8,
        codebookK = 16, pqIters = 0)
      db.nprobe = 3
      val p = java.nio.file.Files.createTempDirectory("graft_vdb_pq_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
      db.save(p.toString)
      graft.VectorDB.load(s, p.toString)
    }

  /** Gate on compressed-state persistence: save → load → ADC search
    * through the restored codes + codebooks + router. */
  def qVectordbPqPersisted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 60L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbPqPersistedHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Adaptive handle: trained cells, exhaustive ef, nprobe = 3 with
    * the diminishing-returns cutoff alpha = 2 — the handle mirror of
    * q_ann_adaptive on the TRAINED layout. */
  private val vdbAdaptMemo = new SessionMemo[graft.VectorDB]
  private def vdbAdaptiveHandle(s: SparkSession, dir: String) =
    vdbAdaptMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      val built = db.buildIndexIvf(numCells = 16, iters = 1)
      db.efSearch = exhaustiveEf(s, dir, "vdb_adapt")(built)
      db.nprobe = 3
      db.adaptiveAlpha = Some(2.0)
      db
    }

  /** Gate on the public adaptive-probing knob: probes = trained cells
    * closest-first, cut past 2× the nearest centroid distance (max 3),
    * exhaustive ef ⇒ ≡ brute force within the adaptively-probed cells
    * — the oracle replays the identical cutoff over the trained
    * centroids. */
  def qVectordbAdaptive(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 61L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbAdaptiveHandle(s, dir).search(qv, k = 5)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Indexed-ADD handle: trained IVF cells, then rows 0-4 re-appended
    * under shifted ids through `VectorDB.add` — the derived handle's
    * index is MAINTAINED incrementally (`HnswIndex.addBatch`, routed
    * through the trained router; only touched cells rebuild), never
    * rebuilt from the corpus. Exhaustive ef on the grown handle is the
    * parent's derived ef plus the batch size (cells grow by at most
    * the batch). */
  private val vdbAddIdxMemo = new SessionMemo[graft.VectorDB]
  private def vdbAddIndexedHandle(s: SparkSession, dir: String) =
    vdbAddIdxMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      val built = db.buildIndexIvf(numCells = 16, iters = 1)
      db.efSearch = exhaustiveEf(s, dir, "vdb_add_idx")(built) + 5
      db.nprobe = 16
      val e = emb(s, dir)
      db.add(e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 200000L).as("vec_id"), col("embedding")))
    }

  /** Gate on maintained-index ADD through the public handle: the grown
    * handle (all cells probed, exhaustive ef) must equal brute force
    * over corpus ∪ additions — the query is row 2's own embedding, so
    * its shifted twin (dist 0) MUST surface from the maintained index.
    * The dispatch arm itself (index kept, not dropped to exact) is
    * pinned by SparkIndexSpec via [[graft.VectorDB.hasIndex]]. */
  def qVectordbAddIndexed(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 2L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbAddIndexedHandle(s, dir).search(qv, k = 5)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Indexed-REMOVE handle: trained IVF cells, then every `vec_id ≡ 3
    * (mod 7)` removed through `VectorDB.remove` — the derived handle's
    * index is maintained by `HnswIndex.removeBatch` (only cells that
    * held a removed id rebuild). The parent's exhaustive ef still
    * covers the shrunken cells. */
  private val vdbRmIdxMemo = new SessionMemo[graft.VectorDB]
  private def vdbRemoveIndexedHandle(s: SparkSession, dir: String) =
    vdbRmIdxMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      val built = db.buildIndexIvf(numCells = 16, iters = 1)
      db.efSearch = exhaustiveEf(s, dir, "vdb_rm_idx")(built)
      db.nprobe = 16
      val e = emb(s, dir)
      db.remove(e.filter(col("vec_id") % 7 === 3).select("vec_id"))
    }

  /** Gate on maintained-index REMOVE through the public handle: the
    * query is removed row 38's own embedding, so a remove that failed
    * to reach the index would surface 38 at dist 0 — the result must
    * equal brute force over the remainder (decisive on index-side
    * deletion when the index arm serves; the arm is pinned in
    * SparkIndexSpec). */
  def qVectordbRemoveIndexed(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 38L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbRemoveIndexedHandle(s, dir).search(qv, k = 5)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** UPSERT handle: trained IVF cells, then rows 0-4 replaced with the
    * embeddings of rows 10-14 through `VectorDB.upsert` — a
    * remove-then-add composition whose BOTH derivations maintain the
    * index incrementally. */
  private val vdbUpsertMemo = new SessionMemo[graft.VectorDB]
  private def vdbUpsertHandle(s: SparkSession, dir: String) =
    vdbUpsertMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      val built = db.buildIndexIvf(numCells = 16, iters = 1)
      db.efSearch = exhaustiveEf(s, dir, "vdb_upsert")(built) + 5
      db.nprobe = 16
      val e = emb(s, dir)
      val repl = e.filter(col("vec_id") < 5).alias("t")
        .join(e.alias("r"), col("r.vec_id") === col("t.vec_id") + 10L)
        .select(col("t.vec_id"), col("r.embedding"))
      db.upsert(repl)
    }

  /** Gate on replace-or-insert through the public handle: after the
    * upsert, row 2 carries row 12's embedding — querying with that
    * embedding must surface BOTH ids at dist 0 from the maintained
    * index, and the whole result must equal brute force over the
    * replaced corpus. */
  def qVectordbUpsert(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 12L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbUpsertHandle(s, dir).search(qv, k = 5)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Dot-metric (MIPS) handle: trained IVF over the norm-AUGMENTED
    * corpus (`buildIndexIvf(metric = Dot)` — each vector extends with
    * sqrt(M²−‖x‖²) so the L2 graph walk ranks by dot product), every
    * cell probed at exhaustive ef ⇒ indexed search ≡ global
    * brute-force argmax dot, which is exactly what the oracle
    * computes. */
  private val vdbDotMemo = new SessionMemo[graft.VectorDB]
  private def vdbDotHandle(s: SparkSession, dir: String) =
    vdbDotMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      val built = db.buildIndexIvf(numCells = 16, iters = 1,
        metric = graft.operators.Knn.Dot)
      db.efSearch = exhaustiveEf(s, dir, "vdb_dot")(built)
      db.nprobe = 16
      db
    }

  /** Gate on the third standard serving metric (VERDICT r7 item #6):
    * open → buildIndexIvf(metric = dot) → search must equal
    * brute-force maximum-inner-product over the corpus (dist = −dot,
    * ascending). The exact-dot re-score serves the reported
    * distances, so the MIPS→L2 augmentation is rank-only — float
    * reduction noise cannot reach the output. */
  def qVectordbDot(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 70L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbDotHandle(s, dir).search(qv, k = 5)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), (round(col("dist"), 3) + lit(0.0)).as("dist"))
  }

  /** Gate on the BATCH serving arm of the dot metric: one
    * [[graft.VectorDB.searchBatch]] job answers a 3-query batch
    * through the reduced-walk + exact-re-score path; with every cell
    * probed at exhaustive ef the per-query result equals brute-force
    * argmax dot, so the oracle is a per-qid window over the exact dot
    * scores. */
  def qVectordbBatchDot(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 72 && col("vec_id") < 75)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    vdbDotHandle(s, dir).searchBatch(queries, k = 5)
      .select(col("qid"), col("rank").as("rnk"), col("vec_id"),
        (round(col("dist"), 3) + lit(0.0)).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Dot handle saved + reloaded — gates that the MIPS serving state
    * (augmented-space index + router, metric, and the captured max
    * norm the manifest now carries) round-trips disk: the LOADED
    * handle is what serves. */
  private val vdbDotPersistMemo = new SessionMemo[graft.VectorDB]
  private def vdbDotPersistedHandle(s: SparkSession, dir: String) =
    vdbDotPersistMemo.get(s, dir) {
      val db = vdbDotHandle(s, dir)
      val p = java.nio.file.Files.createTempDirectory("graft_vdb_dot_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
      db.save(p.toString)
      graft.VectorDB.load(s, p.toString)
    }

  /** Gate on dot-metric persistence: save → load → search through the
    * restored augmented-space index must still equal brute-force
    * argmax dot (distinct query id from q_vectordb_dot so the two
    * rows gate different answers). */
  def qVectordbDotPersisted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 76L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbDotPersistedHandle(s, dir).search(qv, k = 5)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), (round(col("dist"), 3) + lit(0.0)).as("dist"))
  }

  /** Gate on range search under the cosine metric (q_vectordb_range
    * gates the L2 arm): all rows with 1−cos ≤ 0.9 from the cosine
    * handle's corpus — served as one map-only fused scan whatever the
    * handle's index state. */
  def qVectordbRangeCosine(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 77L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbCosineHandle(s, dir).searchRange(qv, radius = 0.9)
      .select(col("vec_id"), (round(col("dist"), 4) + lit(0.0)).as("dist"))
  }

  /** Churned-then-compacted handle (VERDICT r7 item #5): trained-IVF
    * build, then a remove→add round trip of the `vec_id % 9 == 5`
    * slice (both maintain the index incrementally — dirty cells
    * only), then [[graft.VectorDB.compact]] with an adaptive
    * threshold of avg-cell-size + 1, which guarantees at least one
    * below-average cell dissolves at every SF. The corpus round-trips
    * to exactly the fixture, so brute force over the full table is
    * the oracle; exhaustive ef over every (post-compact) cell makes
    * indexed search equal it. */
  private val vdbCompactMemo = new SessionMemo[graft.VectorDB]
  private def vdbCompactHandle(s: SparkSession, dir: String) =
    vdbCompactMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexIvf(numCells = 16, iters = 1)
      db.nprobe = 16
      val e = emb(s, dir)
      val slice = e.filter(col("vec_id") % 9 === 5).select("vec_id", "embedding")
      val churned = db.remove(slice.select("vec_id")).add(slice)
      val compacted = churned.compact(minCellSize = (churned.len / 16L + 1L).toInt)
      compacted.efSearch =
        math.max(4096L, compacted.len).min(Int.MaxValue.toLong).toInt
      compacted
    }

  /** Gate on defrag through the public handle: search over the
    * compacted serving state must equal brute force over the full
    * corpus — a vector lost in dissolution, a stale router probing a
    * dissolved cell, or corrupted receiver adjacency all surface as a
    * hash mismatch. */
  def qVectordbCompact(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 71L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbCompactHandle(s, dir).search(qv, k = 5)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Hash-partitioned handle for the stats census: `buildIndex(16)`
    * routes by id hash, so all 16 parts are non-empty at every gate SF
    * (≥600 rows) and the cell count is a fixture-independent constant
    * the oracle can state. */
  private val vdbStatsMemo = new SessionMemo[graft.VectorDB]
  private def vdbStatsHandle(s: SparkSession, dir: String) =
    vdbStatsMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndex(numParts = 16)
      db
    }

  /** Gate on the handle observability surface (VERDICT r7 item #7):
    * `stats` for an indexed and an exact handle — corpus count, dims,
    * serving mode, metric, cell census, router flag — projected to
    * the SQL-expressible columns (min/max cell size depend on the
    * Spark id hash, which DuckDB can't replay). */
  def qVectordbStats(s: SparkSession, dir: String): DataFrame =
    vdbStatsHandle(s, dir).stats
      .unionByName(vdbExactHandle(s, dir).stats)
      .select(col("n_vectors"), col("dims"), col("serving"), col("metric"),
        col("n_cells"), col("n_indexed"), col("has_router"))
      .orderBy("serving")

  /** SQ handle saved + reloaded — the int8 mirror of
    * [[vdbPqPersistedHandle]]: codes round-trip cell-partitioned, the
    * per-dimension lo/hi ranges and the router reload from their model
    * parquets. */
  private val vdbSqPersistMemo = new SessionMemo[graft.VectorDB]
  private def vdbSqPersistedHandle(s: SparkSession, dir: String) =
    vdbSqPersistMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexSq(numCells = 16, routerIters = 1)
      db.nprobe = 16
      val p = java.nio.file.Files.createTempDirectory("graft_vdb_sq_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
      db.save(p.toString)
      graft.VectorDB.load(s, p.toString)
    }

  /** Gate on int8-SQ state persistence: save → load → ADC search
    * through the restored codes + ranges + router, all cells probed ≡
    * global SQ ADC ranking (the q_vectordb_sq oracle shape at a
    * distinct query). */
  def qVectordbSqPersisted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 67L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbSqPersistedHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Live-ingest handle: the corpus's even rows open as the serving
    * handle (trained IVF cells), then the odd rows arrive as a 4-file
    * parquet STREAM whose foreachBatch generations land in an ingest
    * log (one parquet dir per generation — the stable-storage hop a
    * real deployment makes before mutating serving state) and fold in
    * through [[graft.VectorDB.add]]: the maintained index rebuilds
    * only the touched cells per generation, and a 1-NN probe inside
    * each batch forces real per-generation materialization. After the
    * stream, exhaustive ef derives from the handle's own row count. */
  private val vdbStreamMemo = new SessionMemo[graft.VectorDB]
  private def streamedVdbHandle(s: SparkSession, dir: String) =
    vdbStreamMemo.get(s, dir) {
      val e = emb(s, dir)
      val base = java.nio.file.Files.createTempDirectory("graft_vdb_stream_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
      e.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$base/corpus")
      var db = graft.VectorDB.open(s, s"$base/corpus", dims = 64, P)
      db.buildIndexIvf(numCells = 16, iters = 1)
      db.nprobe = 16
      val stage = s"$base/stage"
      e.filter(col("vec_id") % 2 === 1).select("vec_id", "embedding")
        .repartition(4, col("vec_id"))
        .write.mode("overwrite").parquet(stage)
      val schema = s.read.parquet(stage).schema
      val probe = e.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0)
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], gen: Long) =>
          val p = s"$base/gen_$gen"
          batch.write.mode("overwrite").parquet(p)
          db = db.add(s.read.parquet(p))
          db.search(probe, 1).count()
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      db.efSearch = math.max(4096L, db.len).min(Int.MaxValue.toLong).toInt
      db
    }

  /** Gate on live ingest through the public handle — the composition
    * of the gated pieces (true readStream micro-batches, maintained-
    * index add, batch serving): post-stream batch search must equal
    * brute force over the WHOLE corpus — a vector dropped or
    * duplicated by any generation surfaces as a hash mismatch. */
  def qVectordbStream(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.filter(col("vec_id") >= 68 && col("vec_id") < 72)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    streamedVdbHandle(s, dir).searchBatch(queries, k = 5)
      .select(col("qid"), col("rank").as("rnk"), col("vec_id"),
        round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rnk")
  }

  /** Gate on range search through the public handle: every row within
    * L2² ≤ 2.0 of row 66's embedding, one map-only corpus scan — the
    * q_range_search semantics behind the handle's metric dispatch. */
  def qVectordbRange(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 66L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbExactHandle(s, dir).searchRange(qv, radius = 2.0)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Gate on public int8-SQ serving: all cells probed ⇒ handle ADC
    * ranking ≡ global SQ ADC ranking (the q_quantized_knn oracle shape
    * at a distinct query). */
  def qVectordbSq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 54L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbSqHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Index structure stats per cell (ref structure/pruning invariants,
    * `src/lib.rs:394-467`): node counts AND layer counts are
    * oracle-able (a node owns exactly level+1 adjacency lists and
    * levels derive deterministically from ids); degree caps are
    * asserted in ScalaTest (graph-construction-dependent, not
    * SQL-expressible). */
  def qHnswStats(s: SparkSession, dir: String): DataFrame = {
    val idx = labelIndex(s, dir)
    idx.toDF()
      .select(col("part"), size(col("layers")).as("n_layers"))
      .groupBy("part")
      .agg(
        count(lit(1)).as("n_nodes"),
        max(col("n_layers")).as("max_layers"))
      .orderBy("part")
  }

  // ---- shared oracle fragments ---------------------------------------
  // One definition per routed-ANN building block; every q_ann_* oracle
  // composes these, so a centroid-construction change can never
  // silently diverge one copy (same policy as VectorQueries.l2Sql).

  /** Decimal-exact label-cell centroids (`cent(label, i, m)`). */
  private val centSql =
    """ex AS (SELECT label, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
      |       FROM embeddings),
      |cent AS (SELECT label, i,
      |           CAST(sum(CAST(x AS DECIMAL(18,12))) AS DOUBLE) / count(*) AS m
      |         FROM ex GROUP BY label, i)""".stripMargin

  /** Single-query probe set: the 3 nearest label cells to `q.qv`. */
  private val probesSingleSql =
    """cd AS (SELECT c.label, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
      |       FROM cent c, q GROUP BY c.label),
      |probes AS (SELECT label FROM cd ORDER BY d, label LIMIT 3)""".stripMargin

  /** Per-qid centroid distances for a multi-query table `q(qid, qv)`. */
  private val cdPerQidSql =
    """cd AS (SELECT q.qid, c.label, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
      |       FROM cent c, q GROUP BY q.qid, c.label)""".stripMargin

  /** Fixed nprobe=3 probe set per qid. */
  private val probesFixedSql =
    """probes AS (SELECT qid, label FROM
      |             (SELECT qid, label, row_number() OVER (PARTITION BY qid ORDER BY d, label) AS rn
      |              FROM cd) WHERE rn <= 3)""".stripMargin

  /** Adaptive probe set: closest-first, stop past 2× the nearest cell
    * distance, max 3 (mirror of [[IvfIndex.Model.probeAdaptive]]). */
  private val probesAdaptiveSql =
    """rcd AS (SELECT qid, label, d,
      |               row_number() OVER (PARTITION BY qid ORDER BY d, label) AS rn,
      |               min(d) OVER (PARTITION BY qid) AS d0
      |        FROM cd),
      |probes AS (SELECT qid, label FROM rcd WHERE rn <= 3 AND d <= d0 * 2.0)""".stripMargin

  /** Rank the probed cells' vectors per qid, keep top-5. `candWhere`
    * restricts the candidate rows (filtered ANN / deletes). */
  private def rankedTailSql(candWhere: String = "TRUE"): String =
    s"""scored AS (SELECT q.qid, e.vec_id, ${VectorQueries.l2Sql("e.embedding", "q.qv")} AS d
       |           FROM embeddings e JOIN probes p ON e.label = p.label JOIN q ON q.qid = p.qid
       |           WHERE $candWhere),
       |ranked AS (SELECT qid, vec_id, d,
       |                  row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rnk
       |           FROM scored)
       |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, round(d, 3) AS dist
       |FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  /** Full routed-search oracle: queries selected by `qWhere`, label
    * centroids, a probe policy, brute force within probed cells over
    * the candidates selected by `candWhere`. */
  private def routedOracleSql(qWhere: String, probes: String,
      candWhere: String = "TRUE"): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE $qWhere),
       |$centSql,
       |$cdPerQidSql,
       |$probes,
       |${rankedTailSql(candWhere)}""".stripMargin

  /** Exhaustive (unrouted) top-5 oracle — exact brute force over the
    * corpus rows selected by `candWhere` for queries selected by
    * `qWhere`. */
  private def bruteOracleSql(qWhere: String, candWhere: String = "TRUE"): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE $qWhere),
       |scored AS (SELECT q.qid, e.vec_id, ${VectorQueries.l2Sql("e.embedding", "q.qv")} AS d
       |           FROM embeddings e CROSS JOIN q WHERE $candWhere),
       |ranked AS (SELECT qid, vec_id, d,
       |                  row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rnk
       |           FROM scored)
       |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, round(d, 3) AS dist
       |FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  /** Cosine-routed oracle (mirror of [[qAnnCosine]]): normalize each
    * vector to unit length THROUGH a float cast (DuckDB `REAL` =
    * Spark `float` — IEEE round-half-even double→float rounding, so
    * the unit vectors are bit-identical across engines and the
    * decimal-exact unit-space centroids replay exactly), route each
    * query to its 3 nearest unit-space cells, then brute-force cosine
    * on the RAW vectors within the probed cells. The zero-norm CASE
    * mirrors [[graft.functions.VectorFunctions.l2Normalize]]'s
    * pass-through. */
  private def cosineOracleSql(qWhere: String): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE $qWhere),
       |nn AS (SELECT vec_id, label, embedding,
       |         sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS nrm
       |       FROM embeddings),
       |nv AS (SELECT vec_id, label,
       |         list_transform(embedding, x -> CAST(CASE WHEN nrm = 0 THEN CAST(x AS DOUBLE)
       |                                                  ELSE CAST(x AS DOUBLE) / nrm END AS REAL)) AS uv
       |       FROM nn),
       |ex AS (SELECT label, generate_subscripts(uv, 1) AS i, unnest(uv) AS x FROM nv),
       |cent AS (SELECT label, i,
       |           CAST(sum(CAST(x AS DECIMAL(18,12))) AS DOUBLE) / count(*) AS m
       |         FROM ex GROUP BY label, i),
       |qn AS (SELECT q.qid, n.uv FROM q JOIN nv n ON n.vec_id = q.qid),
       |cd AS (SELECT qn.qid, c.label, sum((c.m - CAST(qn.uv[c.i] AS DOUBLE))^2) AS d
       |       FROM cent c, qn GROUP BY qn.qid, c.label),
       |probes AS (SELECT qid, label FROM
       |             (SELECT qid, label, row_number() OVER (PARTITION BY qid ORDER BY d, label) AS rn
       |              FROM cd) WHERE rn <= 3),
       |scored AS (SELECT q.qid, e.vec_id, 1.0 - ${VectorQueries.cosSql("e.embedding", "q.qv")} AS d
       |           FROM embeddings e JOIN probes p ON e.label = p.label JOIN q ON q.qid = p.qid),
       |ranked AS (SELECT qid, vec_id, d,
       |                  row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rnk
       |           FROM scored)
       |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, round(d, 4) + CAST(0.0 AS DOUBLE) AS dist
       |FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  /** One decimal-exact Lloyd's iteration at k=16 in SQL (mirror of
    * `IvfIndex.train(k = 16, iters = 1)` over the `src` relation —
    * "embeddings" for raw-space handles, the normalized/augmented CTE
    * for metric-reduced ones): init = the 16 lowest-id vectors, assign
    * under the init centroids, update = per-cell decimal-exact means
    * (empty cells keep their init centroid), plus the final corpus
    * assignment `a1(vec_id, cell)` under the trained centroids
    * `c1(cell, i, m)`. */
  private[queries] def trainedCellsSqlFrom(src: String): String =
    s"""init AS (SELECT cell, cv FROM (
       |           SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
       |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
       |           FROM $src) WHERE cell < 16),
       |c0 AS (SELECT cell, generate_subscripts(cv, 1) AS i, unnest(cv) AS m FROM init),
       |a0d AS (SELECT e.vec_id, c.cell, sum((c.m - CAST(e.embedding[c.i] AS DOUBLE))^2) AS d
       |        FROM c0 c, $src e GROUP BY e.vec_id, c.cell),
       |a0 AS (SELECT vec_id, cell FROM
       |         (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
       |          FROM a0d) WHERE rn = 1),
       |ex1 AS (SELECT a0.cell, generate_subscripts(e.embedding, 1) AS i, unnest(e.embedding) AS x
       |        FROM $src e JOIN a0 ON a0.vec_id = e.vec_id),
       |mu AS (SELECT cell, i, CAST(sum(CAST(x AS DECIMAL(18,12))) AS DOUBLE) / count(*) AS m
       |       FROM ex1 GROUP BY cell, i),
       |c1 AS (SELECT c0.cell, c0.i, coalesce(mu.m, c0.m) AS m
       |       FROM c0 LEFT JOIN mu ON mu.cell = c0.cell AND mu.i = c0.i),
       |a1d AS (SELECT e.vec_id, c.cell, sum((c.m - CAST(e.embedding[c.i] AS DOUBLE))^2) AS d
       |        FROM c1 c, $src e GROUP BY e.vec_id, c.cell),
       |a1 AS (SELECT vec_id, cell FROM
       |         (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
       |          FROM a1d) WHERE rn = 1)""".stripMargin

  private val trainedCellsSql = trainedCellsSqlFrom("embeddings")

  /** Unit-normalized corpus THROUGH a float cast (DuckDB `REAL` =
    * Spark `float` — IEEE round-half-even, so the unit vectors are
    * bit-identical across engines), exposed under the same
    * (vec_id, label, embedding) shape as `embeddings` so the
    * trained-cell and ADC fragments compose over it unchanged — the
    * oracle-side twin of the cosine reduction `buildIndexPq`/
    * `buildIndexSq(metric = cosine)` apply before train/encode. */
  private val nvSql =
    """nn AS (SELECT vec_id, label, embedding,
      |         sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS nrm
      |       FROM embeddings),
      |nv AS (SELECT vec_id, label,
      |         list_transform(embedding, x -> CAST(CASE WHEN nrm = 0 THEN CAST(x AS DOUBLE)
      |                                                  ELSE CAST(x AS DOUBLE) / nrm END AS REAL)) AS embedding
      |       FROM nn)""".stripMargin

  /** Norm-AUGMENTED corpus (the Bachrach MIPS→L2 reduction the dot
    * handles apply): each vector extends with
    * sqrt(max(0, M² − ‖v‖²)) through a float cast, M² = the corpus max
    * squared norm — same (vec_id, label, embedding) shape. */
  private val avSql =
    s"""n2 AS (SELECT vec_id, ${VectorQueries.dotSql("embedding", "embedding")} AS nsq FROM embeddings),
       |mx AS (SELECT max(nsq) AS m2 FROM n2),
       |av AS (SELECT e.vec_id, e.label,
       |         list_append(e.embedding,
       |                     CAST(sqrt(greatest(CAST(0.0 AS DOUBLE), mx.m2 - n2.nsq)) AS REAL)) AS embedding
       |       FROM embeddings e JOIN n2 USING (vec_id) CROSS JOIN mx)""".stripMargin

  /** Int8-SQ ADC oracle (mirror of [[qQuantizedKnn]] /
    * [[qVectordbSq]]): per-dim min/max bounds, 255-step encode, decode
    * to the bucket floor, full-precision query — one definition for
    * every SQ gate. */
  /** The SQ ADC scoring pipeline through the `scored` CTE — callers
    * append the final SELECT (ADC top-10, or the candidate cut for the
    * exact-refine composition). `src` supplies the corpus relation
    * (bounds train over it AND candidates score from it — codes bounds
    * are build-time, so callers whose candidate set shrank post-build
    * restrict with `candWhere` instead of swapping `src`); `pre`
    * prepends reduction CTEs (normalize/augment), `qCte` the full
    * `q AS (...)` query CTE in the reduced space. */
  private def sqAdcCoreSql(qCte: String, src: String = "embeddings",
      pre: String = "", candWhere: String = "TRUE"): String =
    s"""WITH ${pre}b AS (SELECT i AS pos, CAST(min(x) AS DOUBLE) AS lo, CAST(max(x) AS DOUBLE) AS hi
       |           FROM (SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
       |                 FROM $src) GROUP BY 1),
       |bl AS (SELECT list(lo ORDER BY pos) AS los, list(hi ORDER BY pos) AS his FROM b),
       |$qCte,
       |scored AS (
       |  SELECT e.vec_id,
       |    list_sum(list_transform(range(1, len(e.embedding) + 1), i ->
       |      (CASE WHEN bl.his[i] - bl.los[i] = 0.0 THEN bl.los[i]
       |            ELSE bl.los[i] + CAST(floor(least(greatest(
       |                   (CAST(e.embedding[i] AS DOUBLE) - bl.los[i]) / (bl.his[i] - bl.los[i]),
       |                   0.0), 1.0) * 255.0) AS INT) / 255.0 * (bl.his[i] - bl.los[i])
       |       END - CAST(q.qv[i] AS DOUBLE))
       |      * (CASE WHEN bl.his[i] - bl.los[i] = 0.0 THEN bl.los[i]
       |            ELSE bl.los[i] + CAST(floor(least(greatest(
       |                   (CAST(e.embedding[i] AS DOUBLE) - bl.los[i]) / (bl.his[i] - bl.los[i]),
       |                   0.0), 1.0) * 255.0) AS INT) / 255.0 * (bl.his[i] - bl.los[i])
       |       END - CAST(q.qv[i] AS DOUBLE)))) AS d
       |  FROM $src e, bl, q WHERE $candWhere)""".stripMargin

  private def sqAdcCoreSql(qid: Long): String =
    sqAdcCoreSql(s"q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $qid)")

  private def sqOracleSql(qid: Long): String =
    s"""${sqAdcCoreSql(qid)}
       |SELECT vec_id, round(d, 3) AS dist FROM scored
       |ORDER BY d, vec_id LIMIT 10""".stripMargin

  /** Int8-SQ + exact-refine oracle: the ADC ranking cut at
    * top-(k·refine), then exact L2² re-scored — the SQ twin of
    * [[pqRefinedOracleSql]] (the SQ handle probes every cell, so the
    * ADC scan is global). */
  private def sqRefinedOracleSql(qid: Long, k: Int, refine: Int): String =
    s"""${sqAdcCoreSql(qid)},
       |cand AS (SELECT vec_id FROM scored ORDER BY d, vec_id LIMIT ${k * refine})
       |SELECT e.vec_id, round(${VectorQueries.l2Sql("e.embedding", "q.qv")}, 3) AS dist
       |FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
       |ORDER BY ${VectorQueries.l2Sql("e.embedding", "q.qv")}, e.vec_id LIMIT $k""".stripMargin

  /** PQ init-codebook ADC pipeline (encode candidates, rank by
    * asymmetric distance, top-10): `subFrom` supplies the FROM/JOIN
    * clause selecting the candidate rows `e`. ONE definition for every
    * PQ gate (q_pq_knn = whole corpus, q_ann_ivfpq = label probes,
    * q_vectordb_pq = trained-cell probes) — the repo's
    * shared-oracle-fragment rule. Expects `ms` (subspace ordinals) and
    * `q` (the query) to be in scope. */
  /** The ADC scoring pipeline only, through the `dist` CTE — callers
    * append their own final SELECT (top-10 ADC ranking, or a bounded
    * candidate cut for the exact-refine oracle). `cwFrom` supplies the
    * codebook-source relation aliased `e` (the 16 lowest-id rows of it
    * are the iters=0 init codewords) — the normalized CTE for cosine
    * handles, the union corpus for maintained-add gates. */
  private def pqAdcCoreSql(subFrom: String, cwFrom: String = "embeddings e",
      subDim: Int = 8): String =
    s"""cw AS (SELECT e.vec_id AS j, ms.m,
       |         list_transform(e.embedding[ms.m*$subDim+1 : ms.m*$subDim+$subDim], x -> CAST(x AS DOUBLE)) AS v
       |       FROM $cwFrom, ms WHERE e.vec_id < 16),
       |sub AS (SELECT e.vec_id, ms.m,
       |          list_transform(e.embedding[ms.m*$subDim+1 : ms.m*$subDim+$subDim], x -> CAST(x AS DOUBLE)) AS v
       |        FROM $subFrom, ms),
       |dd AS (SELECT s.vec_id, s.m, c.j,
       |         list_sum(list_transform(list_zip(c.v, s.v), p -> (p[1] - p[2])^2)) AS d
       |       FROM sub s JOIN cw c ON s.m = c.m),
       |code AS (SELECT vec_id, m, j FROM
       |           (SELECT vec_id, m, j, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
       |            FROM dd) WHERE rn = 1),
       |qsub AS (SELECT ms.m, list_transform(q.qv[ms.m*$subDim+1 : ms.m*$subDim+$subDim], x -> CAST(x AS DOUBLE)) AS v
       |         FROM q, ms),
       |dist AS (SELECT code.vec_id,
       |           sum(list_sum(list_transform(list_zip(cw.v, qsub.v), p -> (p[1] - p[2])^2))) AS d
       |         FROM code JOIN cw ON code.m = cw.m AND code.j = cw.j
       |         JOIN qsub ON qsub.m = code.m
       |         GROUP BY code.vec_id)""".stripMargin

  /** OPQ permutation replay ([[graft.index.Opq.energyBalancedPerm]]):
    * exact integer-unit energy census over `src` → (energy DESC, dim
    * ASC) rank → closed-form snake block → `ord(i, np)` mapping
    * original dim `i` to 1-based permuted position `np`. */
  private def opqOrdSqlFrom(src: String): String =
    s"""en AS (SELECT u.i AS i,
       |         sum(CAST(floor(CAST(e.embedding[u.i] AS DOUBLE) *
       |                        CAST(e.embedding[u.i] AS DOUBLE) * 1e12) AS BIGINT)) AS en
       |       FROM $src e, unnest(range(1, ${VectorQueries.Dim + 1})) AS u(i)
       |       GROUP BY u.i),
       |rk AS (SELECT i, CAST(row_number() OVER (ORDER BY en DESC, i) AS INT) - 1 AS r
       |       FROM en),
       |ord AS (SELECT i,
       |          row_number() OVER (ORDER BY
       |            CASE WHEN (r // 8) % 2 = 0 THEN r % 8 ELSE 7 - (r % 8) END, r) AS np
       |        FROM rk)""".stripMargin

  /** `out(vec_id, embedding)` = `src` with every vector re-ordered by
    * the [[opqOrdSqlFrom]] permutation (requires its `ord` CTE). */
  private def opqPermutedSqlFrom(src: String, out: String): String =
    s"""px_$out AS (SELECT e.vec_id, o.np, e.embedding[o.i] AS x
       |        FROM $src e, ord o),
       |$out AS (SELECT vec_id, list(x ORDER BY np) AS embedding
       |       FROM px_$out GROUP BY vec_id)""".stripMargin

  private def pqAdcSql(subFrom: String, cwFrom: String = "embeddings e",
      subDim: Int = 8): String =
    s"""${pqAdcCoreSql(subFrom, cwFrom, subDim)}
       |SELECT vec_id, round(d, 3) AS dist FROM dist ORDER BY d, vec_id LIMIT 10""".stripMargin

  /** IVF-PQ over TRAINED cells oracle (mirror of [[qVectordbPq]]):
    * trained-router probe selection ([[trainedCellsSql]]'s `c1`/`a1`)
    * composed with [[pqAdcSql]] restricted to probed cells. */
  private def pqTrainedOracleSql(qid: Long): String =
    s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $qid),
       |$trainedCellsSql,
       |cd AS (SELECT c.cell, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
       |       FROM c1 c, q GROUP BY c.cell),
       |probes AS (SELECT cell FROM
       |             (SELECT cell, row_number() OVER (ORDER BY d, cell) AS rn FROM cd)
       |           WHERE rn <= 3),
       |${pqAdcSql("embeddings e JOIN a1 ON a1.vec_id = e.vec_id JOIN probes p ON a1.cell = p.cell")}""".stripMargin

  /** OPQ handle oracle (mirror of [[qVectordbOpq]]): the whole
    * trained-probe + ADC pipeline of [[pqTrainedOracleSql]] replayed
    * INSIDE the permuted space — permutation census, permuted corpus,
    * permuted query, router trained on permuted vectors. */
  private def opqTrainedOracleSql(qid: Long): String =
    s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
       |${opqOrdSqlFrom("embeddings")},
       |${opqPermutedSqlFrom("embeddings", "pe")},
       |q AS (SELECT embedding AS qv FROM pe WHERE vec_id = $qid),
       |${trainedCellsSqlFrom("pe")},
       |cd AS (SELECT c.cell, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
       |       FROM c1 c, q GROUP BY c.cell),
       |probes AS (SELECT cell FROM
       |             (SELECT cell, row_number() OVER (ORDER BY d, cell) AS rn FROM cd)
       |           WHERE rn <= 3),
       |${pqAdcSql("pe e JOIN a1 ON a1.vec_id = e.vec_id JOIN probes p ON a1.cell = p.cell",
                   cwFrom = "pe e")}""".stripMargin

  /** IVF-PQ + exact-refine oracle: the [[pqTrainedOracleSql]] ADC
    * pipeline cut at the top-(k·refine) candidate set, then exact L2²
    * re-scored on the raw vectors — the composed replay of
    * [[graft.VectorDB.searchRefined]]. */
  private def pqRefinedOracleSql(qid: Long, k: Int, refine: Int): String =
    s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $qid),
       |$trainedCellsSql,
       |cd AS (SELECT c.cell, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
       |       FROM c1 c, q GROUP BY c.cell),
       |probes AS (SELECT cell FROM
       |             (SELECT cell, row_number() OVER (ORDER BY d, cell) AS rn FROM cd)
       |           WHERE rn <= 3),
       |${pqAdcCoreSql("embeddings e JOIN a1 ON a1.vec_id = e.vec_id JOIN probes p ON a1.cell = p.cell")},
       |cand AS (SELECT vec_id FROM dist ORDER BY d, vec_id LIMIT ${k * refine})
       |SELECT e.vec_id, round(${VectorQueries.l2Sql("e.embedding", "q.qv")}, 3) AS dist
       |FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
       |ORDER BY ${VectorQueries.l2Sql("e.embedding", "q.qv")}, e.vec_id LIMIT $k""".stripMargin

  /** Batched IVF-PQ + exact-refine oracle: [[pqRefinedOracleSql]]'s
    * composition carried per-qid — probes, ADC codeword assignment,
    * candidate cut, and the exact re-rank all PARTITION BY qid. The
    * codeword argmin is q-independent; replaying it per qid duplicates
    * a little oracle work but keeps the SQL mechanical. */
  private def pqBatchRefinedOracleSql(qWhere: String, k: Int, refine: Int): String =
    s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE $qWhere),
       |$trainedCellsSql,
       |cd AS (SELECT q.qid, c.cell, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
       |       FROM c1 c, q GROUP BY q.qid, c.cell),
       |probes AS (SELECT qid, cell FROM
       |             (SELECT qid, cell, row_number() OVER (PARTITION BY qid ORDER BY d, cell) AS rn
       |              FROM cd) WHERE rn <= 3),
       |cw AS (SELECT e.vec_id AS j, ms.m,
       |         list_transform(e.embedding[ms.m*8+1 : ms.m*8+8], x -> CAST(x AS DOUBLE)) AS v
       |       FROM embeddings e, ms WHERE e.vec_id < 16),
       |sub AS (SELECT p.qid, e.vec_id, ms.m,
       |          list_transform(e.embedding[ms.m*8+1 : ms.m*8+8], x -> CAST(x AS DOUBLE)) AS v
       |        FROM embeddings e JOIN a1 ON a1.vec_id = e.vec_id
       |        JOIN probes p ON a1.cell = p.cell, ms),
       |dd AS (SELECT s.qid, s.vec_id, s.m, c.j,
       |         list_sum(list_transform(list_zip(c.v, s.v), p -> (p[1] - p[2])^2)) AS d
       |       FROM sub s JOIN cw c ON s.m = c.m),
       |code AS (SELECT qid, vec_id, m, j FROM
       |           (SELECT qid, vec_id, m, j,
       |              row_number() OVER (PARTITION BY qid, vec_id, m ORDER BY d, j) AS rn
       |            FROM dd) WHERE rn = 1),
       |qsub AS (SELECT q.qid, ms.m,
       |           list_transform(q.qv[ms.m*8+1 : ms.m*8+8], x -> CAST(x AS DOUBLE)) AS v
       |         FROM q, ms),
       |dist AS (SELECT code.qid, code.vec_id,
       |           sum(list_sum(list_transform(list_zip(cw.v, qsub.v), p -> (p[1] - p[2])^2))) AS d
       |         FROM code JOIN cw ON code.m = cw.m AND code.j = cw.j
       |         JOIN qsub ON qsub.m = code.m AND qsub.qid = code.qid
       |         GROUP BY code.qid, code.vec_id),
       |cand AS (SELECT qid, vec_id FROM
       |           (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rn
       |            FROM dist) WHERE rn <= ${k * refine}),
       |rs AS (SELECT c.qid, e.vec_id, ${VectorQueries.l2Sql("e.embedding", "q.qv")} AS d
       |       FROM cand c JOIN embeddings e USING (vec_id) JOIN q ON q.qid = c.qid),
       |rr AS (SELECT qid, vec_id, d,
       |         row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rnk
       |       FROM rs)
       |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, round(d, 3) AS dist
       |FROM rr WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin

  /** Routed search over the TRAINED cells: queries route to their 3
    * nearest trained centroids, brute force among vectors whose trained
    * cell is probed. */
  private def trainedOracleSql(qWhere: String): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE $qWhere),
       |$trainedCellsSql,
       |cd AS (SELECT q.qid, c.cell, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
       |       FROM c1 c, q GROUP BY q.qid, c.cell),
       |probes AS (SELECT qid, cell FROM
       |             (SELECT qid, cell, row_number() OVER (PARTITION BY qid ORDER BY d, cell) AS rn
       |              FROM cd) WHERE rn <= 3),
       |scored AS (SELECT q.qid, e.vec_id, ${VectorQueries.l2Sql("e.embedding", "q.qv")} AS d
       |           FROM embeddings e JOIN a1 ON a1.vec_id = e.vec_id
       |           JOIN probes p ON a1.cell = p.cell JOIN q ON q.qid = p.qid),
       |ranked AS (SELECT qid, vec_id, d,
       |                  row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rnk
       |           FROM scored)
       |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, round(d, 3) AS dist
       |FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_hnsw_levels", qHnswLevels, Some(
      """SELECT CAST(least(62, CAST(floor(-ln(
        |  ((((vec_id * CAST(2654435761 AS BIGINT)) % 1000003) + 1000003) % 1000003 + 1) / 1000003.0)
        |  * (1.0 / ln(16.0))) AS INT)) AS INT) AS level, count(*) AS n
        |FROM embeddings GROUP BY 1 ORDER BY level""".stripMargin)),
    QueryDef("q_ann_ivf", qAnnIvf, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |$centSql,
         |$probesSingleSql
         |SELECT e.vec_id, round(${VectorQueries.l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM embeddings e JOIN probes USING (label), q
         |ORDER BY ${VectorQueries.l2Sql("e.embedding", "q.qv")}, e.vec_id LIMIT 10""".stripMargin)),
    QueryDef("q_ann_hnsw", qAnnHnsw, Some(bruteOracleSql("vec_id < 4"))),
    QueryDef("q_ann_routed", qAnnRouted,
      Some(routedOracleSql("vec_id < 4", probesFixedSql))),
    QueryDef("q_ann_adaptive", qAnnAdaptive,
      Some(routedOracleSql("vec_id < 4", probesAdaptiveSql))),
    QueryDef("q_ann_bigroute", qAnnBigroute,
      Some(routedOracleSql("vec_id >= 110 AND vec_id < 114", probesFixedSql))),
    QueryDef("q_vectordb_bigroute", qVectordbBigroute,
      Some(trainedOracleSql("vec_id = 95"))),
    QueryDef("q_ann_persisted", qAnnPersisted,
      Some(routedOracleSql("vec_id >= 4 AND vec_id < 8", probesFixedSql))),
    QueryDef("q_ann_compacted", qAnnCompacted,
      Some(bruteOracleSql("vec_id >= 8 AND vec_id < 12"))),
    QueryDef("q_ann_capped", qAnnCapped,
      Some(bruteOracleSql("vec_id >= 83 AND vec_id < 87"))),
    QueryDef("q_ann_rebalanced", qAnnRebalanced,
      Some(bruteOracleSql("vec_id >= 99 AND vec_id < 103"))),
    QueryDef("q_ann_merged", qAnnMerged,
      Some(bruteOracleSql("vec_id >= 114 AND vec_id < 118"))),
    QueryDef("q_vectordb_merged", qVectordbMerged,
      Some(bruteOracleSql("vec_id >= 118 AND vec_id < 122"))),
    // merged shared-artifact handles serve exactly what one shared
    // build over the union corpus serves: the pq oracle is the same
    // trained-probe + ADC replay as q_vectordb_pq; the dot oracle is
    // brute-force MIPS (exhaustive probing)
    QueryDef("q_vectordb_pq_merged", qVectordbPqMerged,
      Some(pqTrainedOracleSql(123))),
    QueryDef("q_vectordb_dot_merged", qVectordbDotMerged, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 124)
         |SELECT e.vec_id,
         |  round(-(${VectorQueries.dotSql("e.embedding", "q.qv")}), 3) + CAST(0.0 AS DOUBLE) AS dist
         |FROM embeddings e CROSS JOIN q
         |ORDER BY -(${VectorQueries.dotSql("e.embedding", "q.qv")}), e.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_rebalanced", qVectordbRebalanced,
      Some(bruteOracleSql("vec_id >= 103 AND vec_id < 107"))),
    QueryDef("q_vectordb_merged_rebalanced", qVectordbMergedRebalanced,
      Some(bruteOracleSql("vec_id >= 125 AND vec_id < 129"))),
    QueryDef("q_vectordb_merged_many", qVectordbMergedMany,
      Some(bruteOracleSql("vec_id >= 129 AND vec_id < 133"))),
    // the split is routing metadata only: exhaustive probing serves the
    // global SQ ADC ranking, so the plain SQ oracle gates conservation
    QueryDef("q_vectordb_sq_split", qVectordbSqSplit, Some(sqOracleSql(133))),
    // split → reshare → merge-more: codes stay global through the v2
    // artifact, so the exhaustive-probe union serves the same plain
    // SQ ADC ranking — the oracle IS the lifecycle-neutrality claim
    QueryDef("q_vectordb_reshared", qVectordbReshared, Some(sqOracleSql(135))),
    QueryDef("q_vectordb_local_pq", qVectordbLocalPq, Some(
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 134),
         |$trainedCellsSql,
         |cd AS (SELECT c.cell, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
         |       FROM c1 c, q GROUP BY c.cell),
         |probes AS (SELECT cell FROM
         |             (SELECT cell, row_number() OVER (ORDER BY d, cell) AS rn FROM cd)
         |           WHERE rn <= 3),
         |${pqAdcCoreSql("embeddings e JOIN a1 ON a1.vec_id = e.vec_id JOIN probes p ON a1.cell = p.cell")},
         |top AS (SELECT vec_id, d FROM dist ORDER BY d, vec_id LIMIT 10),
         |u AS (SELECT 'dist' AS mode, vec_id, d FROM top
         |      UNION ALL SELECT 'local' AS mode, vec_id, d FROM top
         |      UNION ALL SELECT 'warm' AS mode, vec_id, d FROM top)
         |SELECT mode, vec_id, round(d, 3) AS dist FROM u ORDER BY mode, d, vec_id""".stripMargin)),
    QueryDef("q_ann_trained", qAnnTrained,
      Some(trainedOracleSql("vec_id >= 16 AND vec_id < 20"))),
    QueryDef("q_ann_incremental", qAnnIncremental,
      Some(bruteOracleSql("vec_id >= 20 AND vec_id < 24"))),
    QueryDef("q_stream_index", qStreamIndex,
      Some(bruteOracleSql("vec_id >= 55 AND vec_id < 59"))),
    QueryDef("q_ann_cosine", qAnnCosine,
      Some(cosineOracleSql("vec_id >= 26 AND vec_id < 30"))),
    QueryDef("q_ann_filtered", qAnnFiltered,
      Some(routedOracleSql("vec_id >= 30 AND vec_id < 34", probesFixedSql,
        candWhere = "e.vec_id % 2 = 0"))),
    QueryDef("q_ann_filtered_meta", qAnnFilteredMeta,
      Some(routedOracleSql("vec_id >= 49 AND vec_id < 53", probesFixedSql,
        candWhere = "e.vec_id % 3 = 1"))),
    QueryDef("q_ann_deleted", qAnnDeleted,
      Some(bruteOracleSql("vec_id >= 34 AND vec_id < 38",
        candWhere = "NOT (e.vec_id % 5 = 2 AND e.label < 4)"))),
    QueryDef("q_vectordb_add", qVectordbAdd, Some(
      s"""WITH u AS (SELECT vec_id, embedding FROM embeddings
         |           UNION ALL
         |           SELECT vec_id + 100000, embedding FROM embeddings),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 25)
         |SELECT u.vec_id, round(${VectorQueries.l2Sql("u.embedding", "q.qv")}, 3) AS dist
         |FROM u, q
         |ORDER BY ${VectorQueries.l2Sql("u.embedding", "q.qv")}, u.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_filtered", qVectordbFiltered, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 40)
         |SELECT e.vec_id, round(${VectorQueries.l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM embeddings e CROSS JOIN q
         |WHERE e.vec_id % 3 = 1
         |ORDER BY ${VectorQueries.l2Sql("e.embedding", "q.qv")}, e.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_cosine", qVectordbCosine, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 39),
         |scored AS (SELECT e.vec_id, 1.0 - ${VectorQueries.cosSql("e.embedding", "q.qv")} AS d
         |           FROM embeddings e CROSS JOIN q)
         |SELECT vec_id, round(d, 4) + CAST(0.0 AS DOUBLE) AS dist FROM scored
         |ORDER BY d, vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_remove", qVectordbRemove, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 38)
         |SELECT e.vec_id, round(${VectorQueries.l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM embeddings e CROSS JOIN q
         |WHERE NOT (e.vec_id % 7 = 3)
         |ORDER BY ${VectorQueries.l2Sql("e.embedding", "q.qv")}, e.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_search", qVectordbSearch, Some(
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id = 24),
         |$trainedCellsSql,
         |cd AS (SELECT q.qid, c.cell, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
         |       FROM c1 c, q GROUP BY q.qid, c.cell),
         |probes AS (SELECT qid, cell FROM
         |             (SELECT qid, cell, row_number() OVER (PARTITION BY qid ORDER BY d, cell) AS rn
         |              FROM cd) WHERE rn <= 3),
         |annscored AS (SELECT e.vec_id, ${VectorQueries.l2Sql("e.embedding", "q.qv")} AS d
         |              FROM embeddings e JOIN a1 ON a1.vec_id = e.vec_id
         |              JOIN probes p ON a1.cell = p.cell CROSS JOIN q),
         |annranked AS (SELECT vec_id, d, row_number() OVER (ORDER BY d, vec_id) AS rnk
         |              FROM annscored),
         |exscored AS (SELECT e.vec_id, ${VectorQueries.l2Sql("e.embedding", "q.qv")} AS d
         |             FROM embeddings e CROSS JOIN q),
         |exranked AS (SELECT vec_id, d, row_number() OVER (ORDER BY d, vec_id) AS rnk
         |             FROM exscored),
         |u AS (SELECT 'ann' AS mode, vec_id, d FROM annranked WHERE rnk <= 5
         |      UNION ALL
         |      SELECT 'exact' AS mode, vec_id, d FROM exranked WHERE rnk <= 5)
         |SELECT mode, vec_id, round(d, 3) AS dist FROM u ORDER BY mode, d, vec_id""".stripMargin)),
    QueryDef("q_mmr_batch", qMmrBatch,
      Some(mmrBatchOracleSql("vec_id >= 96 AND vec_id < 99", k = 4, fetch = 16))),
    QueryDef("q_vectordb_local", qVectordbLocal, Some(
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id = 87),
         |$trainedCellsSql,
         |cd AS (SELECT q.qid, c.cell, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
         |       FROM c1 c, q GROUP BY q.qid, c.cell),
         |probes AS (SELECT qid, cell FROM
         |             (SELECT qid, cell, row_number() OVER (PARTITION BY qid ORDER BY d, cell) AS rn
         |              FROM cd) WHERE rn <= 3),
         |scored AS (SELECT e.vec_id, ${VectorQueries.l2Sql("e.embedding", "q.qv")} AS d
         |           FROM embeddings e JOIN a1 ON a1.vec_id = e.vec_id
         |           JOIN probes p ON a1.cell = p.cell CROSS JOIN q),
         |top AS (SELECT vec_id, d FROM scored ORDER BY d, vec_id LIMIT 5),
         |u AS (SELECT 'cold' AS mode, vec_id, d FROM top
         |      UNION ALL
         |      SELECT 'warm' AS mode, vec_id, d FROM top)
         |SELECT mode, vec_id, round(d, 3) AS dist FROM u ORDER BY mode, d, vec_id""".stripMargin)),
    QueryDef("q_vectordb_local_cosine", qVectordbLocalCosine, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 94),
         |scored AS (SELECT e.vec_id, 1.0 - ${VectorQueries.cosSql("e.embedding", "q.qv")} AS d
         |           FROM embeddings e CROSS JOIN q),
         |top AS (SELECT vec_id, d FROM scored ORDER BY d, vec_id LIMIT 5),
         |u AS (SELECT 'dist' AS mode, vec_id, d FROM top
         |      UNION ALL SELECT 'local' AS mode, vec_id, d FROM top
         |      UNION ALL SELECT 'warm' AS mode, vec_id, d FROM top)
         |SELECT mode, vec_id, round(d, 3) AS dist FROM u ORDER BY mode, d, vec_id""".stripMargin)),
    QueryDef("q_vectordb_local_dot", qVectordbLocalDot, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 101),
         |scored AS (SELECT e.vec_id, -(${VectorQueries.dotSql("e.embedding", "q.qv")}) AS d
         |           FROM embeddings e CROSS JOIN q),
         |top AS (SELECT vec_id, d FROM scored ORDER BY d, vec_id LIMIT 5),
         |u AS (SELECT 'dist' AS mode, vec_id, d FROM top
         |      UNION ALL SELECT 'local' AS mode, vec_id, d FROM top
         |      UNION ALL SELECT 'warm' AS mode, vec_id, d FROM top)
         |SELECT mode, vec_id, round(d, 3) + CAST(0.0 AS DOUBLE) AS dist
         |FROM u ORDER BY mode, d, vec_id""".stripMargin)),
    QueryDef("q_vectordb_meta", qVectordbMeta, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 59)
         |SELECT e.vec_id, round(${VectorQueries.l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM embeddings e CROSS JOIN q
         |WHERE e.label <= 4
         |ORDER BY ${VectorQueries.l2Sql("e.embedding", "q.qv")}, e.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_batch_where", qVectordbBatchWhere,
      Some(bruteOracleSql("vec_id >= 62 AND vec_id < 65",
        candWhere = "e.label <= 4"))),
    QueryDef("q_vectordb_add_indexed", qVectordbAddIndexed, Some(
      s"""WITH u AS (SELECT vec_id, embedding FROM embeddings
         |           UNION ALL
         |           SELECT vec_id + 200000 AS vec_id, embedding
         |           FROM embeddings WHERE vec_id < 5),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 2)
         |SELECT u.vec_id, round(${VectorQueries.l2Sql("u.embedding", "q.qv")}, 3) AS dist
         |FROM u CROSS JOIN q
         |ORDER BY ${VectorQueries.l2Sql("u.embedding", "q.qv")}, u.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_remove_indexed", qVectordbRemoveIndexed, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 38)
         |SELECT e.vec_id, round(${VectorQueries.l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM embeddings e CROSS JOIN q
         |WHERE e.vec_id % 7 <> 3
         |ORDER BY ${VectorQueries.l2Sql("e.embedding", "q.qv")}, e.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_upsert", qVectordbUpsert, Some(
      s"""WITH u AS (SELECT t.vec_id, r.embedding
         |           FROM embeddings t JOIN embeddings r ON r.vec_id = t.vec_id + 10
         |           WHERE t.vec_id < 5
         |           UNION ALL
         |           SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 12)
         |SELECT u.vec_id, round(${VectorQueries.l2Sql("u.embedding", "q.qv")}, 3) AS dist
         |FROM u CROSS JOIN q
         |ORDER BY ${VectorQueries.l2Sql("u.embedding", "q.qv")}, u.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_dot", qVectordbDot, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 70)
         |SELECT e.vec_id,
         |  round(-(${VectorQueries.dotSql("e.embedding", "q.qv")}), 3) + CAST(0.0 AS DOUBLE) AS dist
         |FROM embeddings e CROSS JOIN q
         |ORDER BY -(${VectorQueries.dotSql("e.embedding", "q.qv")}), e.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_batch_dot", qVectordbBatchDot, Some(
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |           WHERE vec_id >= 72 AND vec_id < 75),
         |s AS (SELECT q.qid, e.vec_id,
         |        -(${VectorQueries.dotSql("e.embedding", "q.qv")}) AS d
         |      FROM embeddings e CROSS JOIN q),
         |r AS (SELECT qid, vec_id, d,
         |        row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rnk
         |      FROM s)
         |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id,
         |  round(d, 3) + CAST(0.0 AS DOUBLE) AS dist
         |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),
    QueryDef("q_vectordb_dot_persisted", qVectordbDotPersisted, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 76)
         |SELECT e.vec_id,
         |  round(-(${VectorQueries.dotSql("e.embedding", "q.qv")}), 3) + CAST(0.0 AS DOUBLE) AS dist
         |FROM embeddings e CROSS JOIN q
         |ORDER BY -(${VectorQueries.dotSql("e.embedding", "q.qv")}), e.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_range_cosine", qVectordbRangeCosine, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 77),
         |scored AS (SELECT e.vec_id, 1.0 - ${VectorQueries.cosSql("e.embedding", "q.qv")} AS d
         |           FROM embeddings e CROSS JOIN q)
         |SELECT vec_id, round(d, 4) + CAST(0.0 AS DOUBLE) AS dist FROM scored
         |WHERE d <= 0.9 ORDER BY d, vec_id""".stripMargin)),
    QueryDef("q_vectordb_compact", qVectordbCompact, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 71)
         |SELECT e.vec_id, round(${VectorQueries.l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM embeddings e CROSS JOIN q
         |ORDER BY ${VectorQueries.l2Sql("e.embedding", "q.qv")}, e.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_stats", qVectordbStats, Some(
      s"""WITH c AS (SELECT count(*) AS n FROM embeddings)
         |SELECT n AS n_vectors, CAST(64 AS INT) AS dims, 'exact' AS serving,
         |  'l2' AS metric, CAST(0 AS BIGINT) AS n_cells,
         |  CAST(0 AS BIGINT) AS n_indexed, false AS has_router FROM c
         |UNION ALL
         |SELECT n, CAST(64 AS INT), 'hnsw', 'l2', CAST(16 AS BIGINT), n, false FROM c
         |ORDER BY serving""".stripMargin)),
    QueryDef("q_vectordb_range", qVectordbRange, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 66)
         |SELECT e.vec_id, round(${VectorQueries.l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM embeddings e CROSS JOIN q
         |WHERE ${VectorQueries.l2Sql("e.embedding", "q.qv")} <= 2.0
         |ORDER BY ${VectorQueries.l2Sql("e.embedding", "q.qv")}, e.vec_id""".stripMargin)),
    QueryDef("q_vectordb_persisted", qVectordbPersisted,
      Some(trainedOracleSql("vec_id >= 45 AND vec_id < 49"))),
    QueryDef("q_vectordb_batch", qVectordbBatch, Some(
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |           WHERE vec_id >= 41 AND vec_id < 44),
         |l2s AS (SELECT q.qid, e.vec_id, ${VectorQueries.l2Sql("e.embedding", "q.qv")} AS d
         |        FROM embeddings e CROSS JOIN q),
         |l2r AS (SELECT qid, vec_id, d,
         |               row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rnk
         |        FROM l2s),
         |css AS (SELECT q.qid, e.vec_id, 1.0 - ${VectorQueries.cosSql("e.embedding", "q.qv")} AS d
         |        FROM embeddings e CROSS JOIN q),
         |csr AS (SELECT qid, vec_id, d,
         |               row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rnk
         |        FROM css),
         |u AS (SELECT 'ann' AS mode, qid, rnk, vec_id, round(d, 3) AS dist
         |      FROM l2r WHERE rnk <= 5
         |      UNION ALL
         |      SELECT 'exact' AS mode, qid, rnk, vec_id, round(d, 3) AS dist
         |      FROM l2r WHERE rnk <= 5
         |      UNION ALL
         |      SELECT 'cosine' AS mode, qid, rnk, vec_id, round(d, 4) + CAST(0.0 AS DOUBLE) AS dist
         |      FROM csr WHERE rnk <= 5)
         |SELECT mode, qid, CAST(rnk AS INT) AS rnk, vec_id, dist
         |FROM u ORDER BY mode, qid, rnk""".stripMargin)),
    QueryDef("q_hnsw_stats", qHnswStats, Some(
      """SELECT CAST(label AS INT) AS part, count(*) AS n_nodes,
        |  CAST(max(least(62, CAST(floor(-ln(
        |    ((((vec_id * CAST(2654435761 AS BIGINT)) % 1000003) + 1000003) % 1000003 + 1) / 1000003.0)
        |    * (1.0 / ln(16.0))) AS INT)) + 1) AS INT) AS max_layers
        |FROM embeddings GROUP BY 1 ORDER BY part""".stripMargin)),
    QueryDef("q_ann_cells", qAnnCells, Some(
      """SELECT CAST(label AS INT) AS part, count(*) AS n_nodes
        |FROM embeddings GROUP BY 1 ORDER BY part""".stripMargin)),
    // router-staleness drift: full assignment replay (argmin over the
    // label-mean centroids, ties to the lowest cell) for both epochs,
    // per-cell census, then the q_psi_drift exact-integer assembly
    QueryDef("q_router_drift", qRouterDrift, Some(
      s"""WITH $centSql,
         |va AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |         CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
         |vb AS (SELECT vec_id, i,
         |         CASE WHEN vec_id % 5 = 0 AND i = 1
         |              THEN CAST(CAST(x + 0.5 AS REAL) AS DOUBLE) ELSE x END AS x
         |       FROM va),
         |da AS (SELECT v.vec_id, c.label, sum((c.m - v.x)^2) AS d
         |       FROM va v JOIN cent c USING (i) GROUP BY 1, 2),
         |aa AS (SELECT vec_id, label FROM
         |        (SELECT vec_id, label,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d, label) AS rn
         |         FROM da) WHERE rn = 1),
         |db AS (SELECT v.vec_id, c.label, sum((c.m - v.x)^2) AS d
         |       FROM vb v JOIN cent c USING (i) GROUP BY 1, 2),
         |ab AS (SELECT vec_id, label FROM
         |        (SELECT vec_id, label,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d, label) AS rn
         |         FROM db) WHERE rn = 1),
         |cca AS (SELECT label AS cell, CAST(count(*) AS BIGINT) AS ca FROM aa GROUP BY 1),
         |ccb AS (SELECT label AS cell, CAST(count(*) AS BIGINT) AS cb FROM ab GROUP BY 1),
         |r AS (SELECT coalesce(cca.ca, 0) AS ca, coalesce(ccb.cb, 0) AS cb
         |      FROM cca FULL OUTER JOIN ccb ON cca.cell = ccb.cell),
         |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
         |          CAST(count(*) AS BIGINT) AS n_bins FROM r),
         |t AS (SELECT n_a, n_b, n_bins,
         |        (ca + 1) * (n_b + n_bins) - (cb + 1) * (n_a + n_bins) AS dn,
         |        CAST(CAST(ln(CAST((ca + 1) * (n_b + n_bins) AS DOUBLE)
         |                     / ((cb + 1) * (n_a + n_bins))) AS DECIMAL(18,6))
         |             * 1000000 AS BIGINT) AS lnr
         |      FROM r, tot)
         |SELECT n_a, n_b, n_bins,
         |  CAST(sum(CAST(dn AS HUGEINT) * lnr)
         |       // (CAST(n_a + n_bins AS HUGEINT) * (n_b + n_bins)) AS BIGINT) AS psi_micro
         |FROM t GROUP BY 1, 2, 3""".stripMargin)),
    QueryDef("q_quantized_knn", qQuantizedKnn, Some(sqOracleSql(0))),
    QueryDef("q_bq_knn", qBqKnn, Some(
      s"""WITH $bqBaseSql
         |SELECT qid, CAST(rnk AS INT) AS rank, vec_id, CAST(h AS INT) AS hamming
         |FROM r WHERE rnk <= 10 ORDER BY qid, rank""".stripMargin)),
    QueryDef("q_rank_eval", qRankEval, Some {
      val gains = graft.operators.RankEval.gainTable(10)
        .map(_.toString).mkString("[", ", ", "]")
      val ideal10 = graft.operators.RankEval.idealDcg(10)(9).toString
      s"""WITH $bqBaseSql,
         |res AS (SELECT qid, vec_id, rnk FROM r WHERE rnk <= 10),
         |tb AS (SELECT q2.qid, e.vec_id,
         |         row_number() OVER (PARTITION BY q2.qid
         |           ORDER BY ${VectorQueries.l2Sql("e.embedding", "q2.qv")}, e.vec_id) AS trnk
         |       FROM embeddings e CROSS JOIN
         |         (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 4) q2),
         |tr AS (SELECT qid, vec_id FROM tb WHERE trnk <= 10),
         |hits AS (SELECT res.qid, res.rnk,
         |           CASE WHEN tr.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rel
         |         FROM res LEFT JOIN tr ON tr.qid = res.qid AND tr.vec_id = res.vec_id),
         |perq AS (SELECT qid, sum(rel) AS n_hit,
         |           min(CASE WHEN rel = 1 THEN rnk END) AS frst,
         |           CAST(sum(CASE WHEN rel = 1 THEN CAST(($gains)[rnk] AS DECIMAL(18,12))
         |                         ELSE CAST(0 AS DECIMAL(18,12)) END) AS DOUBLE) AS dcg
         |         FROM hits GROUP BY qid)
         |SELECT qid, CAST(n_hit AS BIGINT) AS n_hit,
         |  round(n_hit / 10.0, 4) AS recall,
         |  round(coalesce(1.0 / frst, 0.0), 4) AS mrr,
         |  round(dcg / $ideal10, 4) AS ndcg
         |FROM perq ORDER BY qid""".stripMargin
    }),
    QueryDef("q_vectordb_bq", qVectordbBq, Some(bqHandleOracleSql(96))),
    QueryDef("q_vectordb_bq_refined", qVectordbBqRefined,
      Some(bqRefinedOracleSql(97, k = 5, refine = 4))),
    QueryDef("q_vectordb_bq_add", qVectordbBqAdd, Some(bqHandleOracleSql(2,
      """(SELECT vec_id, embedding FROM embeddings
        | UNION ALL SELECT vec_id + 400000, list_transform(embedding, x -> -x)
        | FROM embeddings WHERE vec_id < 5)""".stripMargin.replaceAll("\\s+", " ")))),
    QueryDef("q_vectordb_bq_persisted", qVectordbBqPersisted,
      Some(bqHandleOracleSql(98))),
    QueryDef("q_bq_refined", qBqRefined, Some(
      s"""WITH $bqBaseSql,
         |sl AS (SELECT qid, vec_id FROM r WHERE rnk <= 32),
         |x AS (SELECT sl.qid, sl.vec_id,
         |        ${VectorQueries.l2Sql("c.embedding", "qe.embedding")} AS dd
         |      FROM sl JOIN embeddings c ON c.vec_id = sl.vec_id
         |              JOIN embeddings qe ON qe.vec_id = sl.qid),
         |f AS (SELECT qid, vec_id, dd,
         |        row_number() OVER (PARTITION BY qid ORDER BY dd, vec_id) AS rnk
         |      FROM x)
         |SELECT qid, CAST(rnk AS INT) AS rank, vec_id, round(dd, 3) AS dist
         |FROM f WHERE rnk <= 10 ORDER BY qid, rank""".stripMargin)),
    QueryDef("q_vectordb_pq", qVectordbPq, Some(pqTrainedOracleSql(53))),
    QueryDef("q_vectordb_opq", qVectordbOpq, Some(opqTrainedOracleSql(45))),
    QueryDef("q_vectordb_opq_persisted", qVectordbOpqPersisted,
      Some(opqTrainedOracleSql(46))),
    QueryDef("q_vectordb_opq_add", qVectordbOpqAdd, Some(
      s"""WITH u AS (SELECT vec_id, embedding FROM embeddings
         |           UNION ALL
         |           SELECT vec_id + 300000 AS vec_id, embedding
         |           FROM embeddings WHERE vec_id < 5),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |${opqOrdSqlFrom("embeddings")},
         |${opqPermutedSqlFrom("u", "pe")},
         |q AS (SELECT embedding AS qv FROM pe WHERE vec_id = 3),
         |${pqAdcSql("pe e", cwFrom = "pe e")}""".stripMargin)),
    QueryDef("q_vectordb_pq_refined", qVectordbPqRefined,
      Some(pqRefinedOracleSql(78, k = 5, refine = 4))),
    QueryDef("q_vectordb_batch_refined", qVectordbBatchRefined,
      Some(pqBatchRefinedOracleSql("vec_id >= 79 AND vec_id < 82", k = 5, refine = 4))),
    QueryDef("q_vectordb_sq_refined", qVectordbSqRefined,
      Some(sqRefinedOracleSql(82, k = 5, refine = 4))),
    QueryDef("q_vectordb_sq", qVectordbSq, Some(sqOracleSql(54))),
    QueryDef("q_vectordb_pq_persisted", qVectordbPqPersisted,
      Some(pqTrainedOracleSql(60))),
    QueryDef("q_vectordb_sq_persisted", qVectordbSqPersisted,
      Some(sqOracleSql(67))),
    QueryDef("q_vectordb_pq_cosine", qVectordbPqCosine, Some(
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |$nvSql,
         |q AS (SELECT embedding AS qv FROM nv WHERE vec_id = 83),
         |${trainedCellsSqlFrom("nv")},
         |cd AS (SELECT c.cell, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
         |       FROM c1 c, q GROUP BY c.cell),
         |probes AS (SELECT cell FROM
         |             (SELECT cell, row_number() OVER (ORDER BY d, cell) AS rn FROM cd)
         |           WHERE rn <= 3),
         |${pqAdcSql("nv e JOIN a1 ON a1.vec_id = e.vec_id JOIN probes p ON a1.cell = p.cell",
                     cwFrom = "nv e")}""".stripMargin)),
    QueryDef("q_vectordb_pq_cosine_refined", qVectordbPqCosineRefined, Some(
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |$nvSql,
         |q AS (SELECT embedding AS qv FROM nv WHERE vec_id = 84),
         |${trainedCellsSqlFrom("nv")},
         |cd AS (SELECT c.cell, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
         |       FROM c1 c, q GROUP BY c.cell),
         |probes AS (SELECT cell FROM
         |             (SELECT cell, row_number() OVER (ORDER BY d, cell) AS rn FROM cd)
         |           WHERE rn <= 3),
         |${pqAdcCoreSql("nv e JOIN a1 ON a1.vec_id = e.vec_id JOIN probes p ON a1.cell = p.cell",
                         cwFrom = "nv e")},
         |cand AS (SELECT vec_id FROM dist ORDER BY d, vec_id LIMIT 20),
         |qr AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 84)
         |SELECT e.vec_id,
         |  round(1.0 - ${VectorQueries.cosSql("e.embedding", "qr.qv")}, 4) + CAST(0.0 AS DOUBLE) AS dist
         |FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN qr
         |ORDER BY 1.0 - ${VectorQueries.cosSql("e.embedding", "qr.qv")}, e.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_sq_cosine", qVectordbSqCosine, Some(
      s"""${sqAdcCoreSql(
             qCte = "q AS (SELECT embedding AS qv FROM nv WHERE vec_id = 85)",
             src = "nv", pre = nvSql + ",\n")}
         |SELECT vec_id, round(d, 3) AS dist FROM scored
         |ORDER BY d, vec_id LIMIT 10""".stripMargin)),
    QueryDef("q_vectordb_sq_dot", qVectordbSqDot, Some(
      s"""${sqAdcCoreSql(
             qCte = "q AS (SELECT list_append(embedding, CAST(0.0 AS REAL)) AS qv FROM embeddings WHERE vec_id = 86)",
             src = "av", pre = avSql + ",\n")}
         |SELECT vec_id, round(d, 3) AS dist FROM scored
         |ORDER BY d, vec_id LIMIT 10""".stripMargin)),
    QueryDef("q_vectordb_pq_add", qVectordbPqAdd, Some(
      s"""WITH u AS (SELECT vec_id, embedding FROM embeddings
         |           UNION ALL
         |           SELECT vec_id + 300000 AS vec_id, embedding
         |           FROM embeddings WHERE vec_id < 5),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 2),
         |${pqAdcSql("u e", cwFrom = "u e")}""".stripMargin)),
    QueryDef("q_vectordb_sq_remove", qVectordbSqRemove, Some(
      s"""${sqAdcCoreSql(
             qCte = "q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 87)",
             candWhere = "e.vec_id % 11 <> 7")}
         |SELECT vec_id, round(d, 3) AS dist FROM scored
         |ORDER BY d, vec_id LIMIT 10""".stripMargin)),
    QueryDef("q_vectordb_pq_meta", qVectordbPqMeta, Some(
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 88),
         |${pqAdcSql("(SELECT * FROM embeddings WHERE label <= 4) e")}""".stripMargin)),
    QueryDef("q_vectordb_pq_compact", qVectordbPqCompact, Some(
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 92),
         |${pqAdcSql("embeddings e")}""".stripMargin)),
    QueryDef("q_vectordb_pq_upsert", qVectordbPqUpsert, Some(
      s"""WITH u AS (SELECT t.vec_id, r.embedding
         |           FROM embeddings t JOIN embeddings r ON r.vec_id = t.vec_id + 10
         |           WHERE t.vec_id < 5
         |           UNION ALL
         |           SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 12),
         |${pqAdcSql("u e", cwFrom = "embeddings e")}""".stripMargin)),
    QueryDef("q_vectordb_pq_stream", qVectordbPqStream, Some(
      s"""WITH u AS (SELECT vec_id, embedding FROM embeddings
         |           UNION ALL
         |           SELECT vec_id + 400000 AS vec_id, embedding
         |           FROM embeddings WHERE vec_id < 20),
         |ms AS (SELECT unnest(range(0, 8)) AS m),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
         |${pqAdcSql("u e", cwFrom = "u e")}""".stripMargin)),
    QueryDef("q_vectordb_pq_cos_persisted", qVectordbPqCosPersisted, Some(
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |$nvSql,
         |q AS (SELECT embedding AS qv FROM nv WHERE vec_id = 89),
         |${trainedCellsSqlFrom("nv")},
         |cd AS (SELECT c.cell, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
         |       FROM c1 c, q GROUP BY c.cell),
         |probes AS (SELECT cell FROM
         |             (SELECT cell, row_number() OVER (ORDER BY d, cell) AS rn FROM cd)
         |           WHERE rn <= 3),
         |${pqAdcSql("nv e JOIN a1 ON a1.vec_id = e.vec_id JOIN probes p ON a1.cell = p.cell",
                     cwFrom = "nv e")}""".stripMargin)),
    QueryDef("q_vectordb_pq_dot", qVectordbPqDot, Some(
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |$avSql,
         |av72 AS (SELECT vec_id, label,
         |           list_concat(embedding, list_transform(range(0, 7), x -> CAST(0.0 AS REAL))) AS embedding
         |         FROM av),
         |q AS (SELECT list_concat(embedding, list_transform(range(0, 8), x -> CAST(0.0 AS REAL))) AS qv
         |      FROM embeddings WHERE vec_id = 91),
         |${pqAdcSql("av72 e", cwFrom = "av72 e", subDim = 9)}""".stripMargin)),
    QueryDef("q_vectordb_sq_dot_refined", qVectordbSqDotRefined, Some(
      s"""${sqAdcCoreSql(
             qCte = "q AS (SELECT list_append(embedding, CAST(0.0 AS REAL)) AS qv FROM embeddings WHERE vec_id = 90)",
             src = "av", pre = avSql + ",\n")},
         |cand AS (SELECT vec_id FROM scored ORDER BY d, vec_id LIMIT 20),
         |qr AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 90)
         |SELECT e.vec_id,
         |  round(-(${VectorQueries.dotSql("e.embedding", "qr.qv")}), 3) + CAST(0.0 AS DOUBLE) AS dist
         |FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN qr
         |ORDER BY -(${VectorQueries.dotSql("e.embedding", "qr.qv")}), e.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_vectordb_stream", qVectordbStream,
      Some(bruteOracleSql("vec_id >= 68 AND vec_id < 72"))),
    QueryDef("q_vectordb_adaptive", qVectordbAdaptive, Some(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 61),
         |$trainedCellsSql,
         |cd AS (SELECT c.cell, sum((c.m - CAST(q.qv[c.i] AS DOUBLE))^2) AS d
         |       FROM c1 c, q GROUP BY c.cell),
         |rcd AS (SELECT cell, d, row_number() OVER (ORDER BY d, cell) AS rn,
         |               min(d) OVER () AS d0
         |        FROM cd),
         |probes AS (SELECT cell FROM rcd WHERE rn <= 3 AND d <= d0 * 2.0)
         |SELECT e.vec_id, round(${VectorQueries.l2Sql("e.embedding", "q.qv")}, 3) AS dist
         |FROM embeddings e JOIN a1 ON a1.vec_id = e.vec_id
         |JOIN probes p ON a1.cell = p.cell CROSS JOIN q
         |ORDER BY ${VectorQueries.l2Sql("e.embedding", "q.qv")}, e.vec_id LIMIT 5""".stripMargin)),
    QueryDef("q_pq_knn", qPqKnn, Some(
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |${pqAdcSql("embeddings e")}""".stripMargin)),
    QueryDef("q_ann_opq", qAnnOpq, Some(
      // full replay of the OPQ-permuted serving pipeline: permutation
      // census/rank/snake -> permuted lists -> PQ init + ADC in
      // permuted space -> exact refine on the raw vectors
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |${opqOrdSqlFrom("embeddings")},
         |${opqPermutedSqlFrom("embeddings", "pe")},
         |q AS (SELECT embedding AS qv FROM pe WHERE vec_id = 33),
         |${pqAdcCoreSql("pe e", cwFrom = "pe e")},
         |cand AS (SELECT vec_id FROM dist ORDER BY d, vec_id LIMIT 20),
         |qr AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 33)
         |SELECT e.vec_id, round(${VectorQueries.l2Sql("e.embedding", "qr.qv")}, 3) AS dist
         |FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN qr
         |ORDER BY ${VectorQueries.l2Sql("e.embedding", "qr.qv")}, e.vec_id LIMIT 10""".stripMargin)),
    QueryDef("q_ann_ivfpq", qAnnIvfPq, Some(
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 12),
         |$centSql,
         |$probesSingleSql,
         |${pqAdcSql("embeddings e JOIN probes USING (label)")}""".stripMargin)),
    QueryDef("q_ann_ivfpq_res", qAnnIvfPqRes, Some(
      s"""WITH ms AS (SELECT unnest(range(0, 8)) AS m),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 28),
         |$centSql,
         |$probesSingleSql,
         |resx AS (SELECT e.vec_id, e.label, c.i,
         |           CAST(CAST(e.embedding[c.i] AS DOUBLE) - c.m AS FLOAT) AS r
         |         FROM embeddings e JOIN cent c ON c.label = e.label),
         |res AS (SELECT vec_id, label, list(r ORDER BY i) AS embedding
         |        FROM resx GROUP BY vec_id, label),
         |qresx AS (SELECT c.label, c.i,
         |            CAST(CAST(q.qv[c.i] AS DOUBLE) - c.m AS FLOAT) AS r
         |          FROM cent c JOIN probes p ON p.label = c.label, q),
         |qres AS (SELECT label, list(r ORDER BY i) AS qv FROM qresx GROUP BY label),
         |cw AS (SELECT e.vec_id AS j, ms.m,
         |         list_transform(e.embedding[ms.m*8+1 : ms.m*8+8], x -> CAST(x AS DOUBLE)) AS v
         |       FROM res e, ms WHERE e.vec_id < 16),
         |sub AS (SELECT e.vec_id, e.label, ms.m,
         |          list_transform(e.embedding[ms.m*8+1 : ms.m*8+8], x -> CAST(x AS DOUBLE)) AS v
         |        FROM res e JOIN probes USING (label), ms),
         |dd AS (SELECT s.vec_id, s.label, s.m, c.j,
         |         list_sum(list_transform(list_zip(c.v, s.v), p -> (p[1] - p[2])^2)) AS d
         |       FROM sub s JOIN cw c ON s.m = c.m),
         |code AS (SELECT vec_id, label, m, j FROM
         |           (SELECT vec_id, label, m, j,
         |              row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
         |            FROM dd) WHERE rn = 1),
         |qsub AS (SELECT qres.label, ms.m,
         |           list_transform(qres.qv[ms.m*8+1 : ms.m*8+8], x -> CAST(x AS DOUBLE)) AS v
         |         FROM qres, ms),
         |dist AS (SELECT code.vec_id,
         |           sum(list_sum(list_transform(list_zip(cw.v, qsub.v), p -> (p[1] - p[2])^2))) AS d
         |         FROM code JOIN cw ON code.m = cw.m AND code.j = cw.j
         |         JOIN qsub ON qsub.m = code.m AND qsub.label = code.label
         |         GROUP BY code.vec_id)
         |SELECT vec_id, round(d, 3) AS dist FROM dist
         |ORDER BY d, vec_id LIMIT 10""".stripMargin)),
    QueryDef("q_build_range", qBuildRange, Some(
      """SELECT CAST(label AS INT) AS part, count(*) AS n_nodes,
        |  min(vec_id) AS min_id, max(vec_id) AS max_id
        |FROM embeddings WHERE vec_id >= 0 AND vec_id < 250
        |GROUP BY 1 ORDER BY part""".stripMargin)),
  )

  /** Structural invariant: the index holds exactly one row per input
    * vector per cell — node counts equal the source's label counts. */
  def qAnnCells(s: SparkSession, dir: String): DataFrame = {
    val idx = labelIndex(s, dir)
    idx.toDF().groupBy("part").agg(count(lit(1)).as("n_nodes")).orderBy("part")
  }

  /** Router-staleness drift gate
    * ([[graft.index.IvfIndex.cellDrift]] ∘
    * [[graft.operators.Profile.psiFromCensus]] — the monitoring
    * counterpart to the shared-training retrain contract: population
    * shift against a FIXED router is recall erosion in the making,
    * and this census is what tells an operator to retrain BEFORE the
    * bound-expansion failures start): epoch A is the corpus the
    * label router was derived from; epoch B shifts every 5th
    * vector's first coordinate by +0.5 (exact in float — the double
    * sum is representable, so the SQL replay is bit-identical),
    * moving a deterministic slice across cell boundaries. Output is
    * the exact-integer PSI over the per-cell populations — the
    * q_psi_drift assembly on cells instead of value bins. Two
    * map-only assignment passes (codegen kernel), one O(#cells)
    * census, checkpointed for the assembly's double read. */
  def qRouterDrift(s: SparkSession, dir: String): DataFrame = {
    val model = labelRouter(s, dir)
    val a = emb(s, dir)
    val b = a.withColumn("embedding",
      when(col("vec_id") % 5 === 0,
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + lit(0.5f)).otherwise(x)))
        .otherwise(col("embedding")))
    graft.operators.Profile.psiFromCensus(
      graft.index.IvfIndex.cellDrift(model, a, b).localCheckpoint())
  }

  /** Shared binary-quantization oracle base: pack both 32-bit sign
    * words per vector, Hamming-rank every corpus row against the 4
    * query rows, and rank with the (hamming, id) total order — the
    * bit-for-bit replay of [[graft.index.BinaryQuant]]. */
  /** Packed 32-bit sign words of `src` (aliased `p`) — the shared CTE
    * of every binary-quantization oracle. */
  private def bqPackCte(src: String): String = {
    val pack = (0 until 2).map { w =>
      s"CAST(list_sum(list_transform(range(0, 32), i -> CASE WHEN embedding[${w * 32} + i + 1] > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS w$w"
    }.mkString(", ")
    s"p AS (SELECT vec_id, $pack FROM $src)"
  }

  private lazy val bqBaseSql: String =
    s"""${bqPackCte("embeddings")},
       |q AS (SELECT vec_id AS qid, w0 AS q0, w1 AS q1 FROM p WHERE vec_id < 4),
       |d AS (SELECT q.qid, c.vec_id,
       |        bit_count(xor(q.q0, c.w0)) + bit_count(xor(q.q1, c.w1)) AS h
       |      FROM q CROSS JOIN p c),
       |r AS (SELECT qid, vec_id, h,
       |        row_number() OVER (PARTITION BY qid ORDER BY h, vec_id) AS rnk
       |      FROM d)""".stripMargin

  /** Global Hamming ranking oracle for the BQ handle gates (the handle
    * probes every cell at nprobe=16, so handle ADC ≡ global ranking —
    * the q_vectordb_sq convention at 1 bit). `src` supplies the corpus
    * (the union relation for the maintained-add gate). */
  private def bqHandleOracleSql(qid: Long, src: String = "embeddings"): String =
    s"""WITH ${bqPackCte(src)},
       |q AS (SELECT w0 AS q0, w1 AS q1 FROM p WHERE vec_id = $qid)
       |SELECT c.vec_id,
       |  CAST(bit_count(xor(q.q0, c.w0)) + bit_count(xor(q.q1, c.w1)) AS INT) AS hamming
       |FROM p c CROSS JOIN q
       |ORDER BY bit_count(xor(q.q0, c.w0)) + bit_count(xor(q.q1, c.w1)), c.vec_id
       |LIMIT 10""".stripMargin

  /** BQ + exact-refine oracle: the Hamming shortlist cut at
    * top-(k·refine), then exact L2² re-scored — [[sqRefinedOracleSql]]
    * at 1 bit. */
  private def bqRefinedOracleSql(qid: Long, k: Int, refine: Int): String =
    s"""WITH ${bqPackCte("embeddings")},
       |q AS (SELECT w0 AS q0, w1 AS q1 FROM p WHERE vec_id = $qid),
       |h AS (SELECT c.vec_id,
       |        bit_count(xor(q.q0, c.w0)) + bit_count(xor(q.q1, c.w1)) AS hm
       |      FROM p c CROSS JOIN q),
       |cand AS (SELECT vec_id FROM h ORDER BY hm, vec_id LIMIT ${k * refine}),
       |qe AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $qid)
       |SELECT e.vec_id, round(${VectorQueries.l2Sql("e.embedding", "qe.qv")}, 3) AS dist
       |FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN qe
       |ORDER BY ${VectorQueries.l2Sql("e.embedding", "qe.qv")}, e.vec_id LIMIT $k""".stripMargin

  /** Public binary-quantized serving: open → buildIndexBq → every cell
    * probed, so handle Hamming ranking ≡ the global oracle. */
  private val vdbBqMemo = new SessionMemo[graft.VectorDB]
  private def vdbBqHandle(s: SparkSession, dir: String) =
    vdbBqMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexBq(numCells = 16, routerIters = 1)
      db.nprobe = 16
      db
    }

  /** Maintained-ADD BQ handle: 5 negated twins appended through the
    * public handle — the stateless pack encodes the batch, resident
    * codes never re-encode. */
  private val vdbBqAddMemo = new SessionMemo[graft.VectorDB]
  private def vdbBqAddHandle(s: SparkSession, dir: String) =
    vdbBqAddMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexBq(numCells = 16, routerIters = 1)
      db.nprobe = 16
      val e = emb(s, dir)
      db.add(e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 400000L).as("vec_id"),
          transform(col("embedding"), x => -x).as("embedding")))
    }

  private val vdbBqPersistMemo = new SessionMemo[graft.VectorDB]
  private def vdbBqPersistedHandle(s: SparkSession, dir: String) =
    vdbBqPersistMemo.get(s, dir) {
      val db = graft.VectorDB.open(s, s"$dir/embeddings.parquet", dims = 64, P)
      db.buildIndexBq(numCells = 16, routerIters = 1)
      db.nprobe = 16
      val p = java.nio.file.Files.createTempDirectory("graft_vdb_bq_")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
      db.save(p.toString)
      graft.VectorDB.load(s, p.toString)
    }

  /** Retrieval evaluation under the gate: the Hamming top-10 scored
    * against exact L2 top-10 ground truth — per-query recall@10, MRR,
    * and binary-relevance nDCG@10 ([[graft.operators.RankEval]]).
    * The oracle replays the result pipeline, the truth pipeline, AND
    * the metric arithmetic (shared pre-rounded literal gain table —
    * no libm in the comparison path). */
  def qRankEval(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qs = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val results = graft.index.BinaryQuant.hammingKnn(e, qs, k = 10, dim = VectorQueries.Dim)
    val truth = graft.operators.Knn.knnJoin(e, qs, k = 10)
      .select(col("qid"), col("vec_id"))
    graft.operators.RankEval.evaluate(results, truth, k = 10)
      .select(col("qid"), col("n_hit"),
        round(col("recall"), 4).as("recall"),
        round(col("mrr"), 4).as("mrr"),
        round(col("ndcg"), 4).as("ndcg"))
      .orderBy("qid")
  }

  /** Gate on public BQ serving: 1-bit packed codes, Hamming ranking
    * through the handle's compressed dispatch. */
  def qVectordbBq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 96L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbBqHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), col("dist").cast("int").as("hamming"))
  }

  /** Gate on BQ exact-refine: Hamming shortlist → exact L2² re-rank
    * through [[graft.VectorDB.searchRefined]]. */
  def qVectordbBqRefined(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 97L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbBqHandle(s, dir).searchRefined(qv, k = 5, refine = 4)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), round(col("dist"), 3).as("dist"))
  }

  /** Gate on maintained BQ codes: the appended negated twins must rank
    * from the APPENDED codes (query row 2 — its negation sits at
    * Hamming ≈ full width, the originals at their true distances). */
  def qVectordbBqAdd(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 2L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbBqAddHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), col("dist").cast("int").as("hamming"))
  }

  /** Gate on BQ persistence: save → load → Hamming serving through the
    * restored codes + router (no model file — the codes ARE the
    * state). */
  def qVectordbBqPersisted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") === 98L)
      .select(col("embedding")).head().getSeq[Float](0)
    vdbBqPersistedHandle(s, dir).search(qv, k = 10)
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select(col("vec_id"), col("dist").cast("int").as("hamming"))
  }

  /** Binary (sign-bit) Hamming top-10: the 1-bit serving mode — packed
    * sign words, XOR/popcount ranking, (hamming, id) tiebreak. */
  def qBqKnn(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qs = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    graft.index.BinaryQuant.hammingKnn(e, qs, k = 10, dim = VectorQueries.Dim)
      .orderBy("qid", "rank")
  }

  /** Binary shortlist (fetch=32 by Hamming) + exact L2² re-rank to
    * top-10 — the refine shape at 1 bit; both stages replayed in the
    * oracle. */
  def qBqRefined(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qs = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    graft.index.BinaryQuant.refinedKnn(e, qs, k = 10, fetch = 32, dim = VectorQueries.Dim)
      .select(col("qid"), col("rank"), col("vec_id"), round(col("dist"), 3).as("dist"))
      .orderBy("qid", "rank")
  }

  /** Int8-quantized search: per-dim bounds (trained once per session,
    * memoized), corpus encoded to byte codes (4x smaller), top-10 by
    * asymmetric decode distance — full-precision ranking quality is
    * gated in ScalaTest; here the quantized pipeline itself is
    * oracle-checked bit-for-bit. */
  def qQuantizedKnn(s: SparkSession, dir: String): DataFrame = {
    import graft.index.ScalarQuantizer
    val e = emb(s, dir)
    val (lo, hi) = sqBounds(s, dir)
    val q = e.filter(col("vec_id") === 0L).select(col("embedding").as("__qv"))
    e.select(col("vec_id"), ScalarQuantizer.encodeExpr(col("embedding"), lo, hi).as("codes"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        ScalarQuantizer.adcL2Sq(col("codes"), col("__qv"), lo, hi).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), round(col("d"), 3).as("dist"))
  }

  /** Product-quantized search (M=8 subspaces, K=16 codes): encode the
    * corpus to 8 small codes per vector, answer top-10 by asymmetric
    * distance. Codebooks here are the raw lowest-id init (iters=0,
    * one collect job, memoized per session) so the whole pipeline is
    * SQL-expressible; trained-codebook quality is gated in ScalaTest. */
  def qPqKnn(s: SparkSession, dir: String): DataFrame = {
    import graft.index.ProductQuantizer
    val e = emb(s, dir)
    val model = pqModel(s, dir)
    val q = e.filter(col("vec_id") === 0L).select(col("embedding").as("__qv"))
    e.select(col("vec_id"), ProductQuantizer.encodeExpr(col("embedding"), model).as("codes"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), ProductQuantizer.adcExpr(col("codes"), col("__qv"), model).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), round(col("d"), 3).as("dist"))
  }

  /** IVF-PQ serving — the standard billion-scale ANN configuration
    * (coarse quantizer routes to nprobe cells, product-quantized codes
    * rank inside them; Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011, §V): the query descends the
    * decimal-exact label centroids to its 3 nearest cells, and ONLY
    * vectors in probed cells are PQ-encoded and ranked by asymmetric
    * (ADC) distance. At 100 TB the scan touches nprobe/L of the corpus
    * and the ranking pipeline moves 8-byte codes instead of 256-byte
    * raw vectors — the memory-bandwidth-bound serving shape. Codebooks
    * are the memoized iters=0 init (encode depends only on the global
    * codebooks, so restricting encode to probed cells is exact);
    * trained-codebook quality is gated in ScalaTest. */
  /** OPQ-permuted PQ serving, end-to-end ([[graft.index.Opq]] — Ge et
    * al. CVPR'13 §4.1 dimension allocation as an actual serving path,
    * not just the measured rotation artifact): exact integer-unit
    * energy census → snake-balanced dim permutation (the model
    * artifact) → map-only permute → PQ init in permuted space → ADC
    * shortlist (top-20) → EXACT L2 refine on the In-pruned RAW vectors
    * (a permutation is orthogonal, so refined distances are the true
    * distances). Every stage replays in the oracle; the full-rotation
    * arm's serving recall is floor-gated in OpqServingSpec. */
  def qAnnOpq(s: SparkSession, dir: String): DataFrame = {
    import graft.index.{Opq, ProductQuantizer}
    val e = emb(s, dir)
    val perm = Opq.energyBalancedPerm(e, col("embedding"), VectorQueries.Dim, numSub = 8)
    val pe = e.select(col("vec_id"), Opq.permuteExpr(col("embedding"), perm).as("embedding"))
    val model = ProductQuantizer.train(pe, numSub = 8, k = 16, iters = 0)
    val q = pe.filter(col("vec_id") === 33L).select(col("embedding").as("__qv"))
    val cand = pe
      .select(col("vec_id"), ProductQuantizer.encodeExpr(col("embedding"), model).as("codes"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), ProductQuantizer.adcExpr(col("codes"), col("__qv"), model).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(20)
      .select("vec_id")
    val qraw = e.filter(col("vec_id") === 33L).select(col("embedding").as("__qr"))
    e.join(broadcast(cand), "vec_id")
      .crossJoin(broadcast(qraw))
      .select(col("vec_id"), l2Sq(col("embedding"), col("__qr")).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), round(col("d"), 3).as("dist"))
  }

  def qAnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    import graft.index.ProductQuantizer
    val e = emb(s, dir)
    val model = pqModel(s, dir)
    val q = e.filter(col("vec_id") === 12L).select(col("embedding").as("__qv"))
    e.join(broadcast(labelProbes(e, q, 3)), "label")
      .select(col("vec_id"), ProductQuantizer.encodeExpr(col("embedding"), model).as("codes"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), ProductQuantizer.adcExpr(col("codes"), col("__qv"), model).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), round(col("d"), 3).as("dist"))
  }

  /** TRUE IVFADC — residual quantization (Jégou et al. TPAMI'11 §V:
    * PQ encodes x − centroid(cell(x)), not x, so the codebook spends
    * its 2^bits on the WITHIN-cell distribution — the fidelity step
    * that makes billion-scale IVF-PQ accurate): per-cell residuals
    * (double-subtract, float-cast — bit-identical in both engines),
    * codebooks trained on residuals, the query residualized PER PROBED
    * CELL (each cell ranks against q − its own centroid), ADC within
    * the probed cells. Every stage — centroids, residuals, codebook
    * init, per-cell query residuals, code assignment, ADC sums —
    * replays in the oracle. */
  def qAnnIvfPqRes(s: SparkSession, dir: String): DataFrame = {
    import graft.index.ProductQuantizer
    val e = emb(s, dir)
    val cent = labelCentroids(e)
    val res = e.join(broadcast(cent), "label")
      .select(col("vec_id"), col("label"),
        zip_with(col("embedding"), col("cv"),
          (x, c) => (x.cast("double") - c).cast("float")).as("embedding"))
    val resModel = ProductQuantizer.train(res, numSub = 8, k = 16, iters = 0)
    val q = e.filter(col("vec_id") === 28L).select(col("embedding").as("__qv"))
    val probes = labelProbes(e, q, 3)
    val qres = cent.join(broadcast(probes), "label")
      .crossJoin(broadcast(q))
      .select(col("label"),
        zip_with(col("__qv"), col("cv"),
          (x, c) => (x.cast("double") - c).cast("float")).as("qrv"))
    res.join(broadcast(probes), "label")
      .select(col("vec_id"), col("label"),
        ProductQuantizer.encodeExpr(col("embedding"), resModel).as("codes"))
      .join(broadcast(qres), "label")
      .select(col("vec_id"),
        ProductQuantizer.adcExpr(col("codes"), col("qrv"), resModel).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), round(col("d"), 3).as("dist"))
  }

  /** Range-bounded index build — the reference's
    * `build_index(start_id, end_id)` (`src/lib.rs:336-341`): the id
    * range is a partition-prunable scan predicate, and the built index
    * covers exactly the ranged rows. */
  def qBuildRange(s: SparkSession, dir: String): DataFrame = {
    val ranged = emb(s, dir)
      .filter(col("vec_id") >= 0L && col("vec_id") < 250L)
      .withColumn("part", col("label"))
    HnswIndex.build(ranged, P).toDF()
      .groupBy("part")
      .agg(count(lit(1)).as("n_nodes"), min(col("vector_id")).as("min_id"),
        max(col("vector_id")).as("max_id"))
      .orderBy("part")
  }
}
