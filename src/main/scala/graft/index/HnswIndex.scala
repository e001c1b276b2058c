package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Distributed HNSW: partition-parallel build, sequential within a
  * partition (SURVEY.md §7.2 M2/M3; the Spark rendering of the
  * reference's `build_index`/`search`, `/root/reference/src/lib.rs:336-347`).
  *
  * The index is a self-contained DataFrame: one row per vector carrying
  * its partition key, the vector itself, and the per-layer adjacency
  * (neighbor *vector ids*, not ordinals). Co-locating vector + adjacency
  * means a search touches exactly the partitions it probes — no side
  * lookups, and at 100 TB each IVF cell is an independent parquet
  * split set.
  */
object HnswIndex {

  /** One indexed vector: partition key, id, vector, adjacency by layer,
    * plus an optional metadata payload (attribute name → string value)
    * carried from build. The payload is what makes filtered ANN filter
    * on real attributes (label, source, date) instead of id arithmetic:
    * `search`'s `candidateFilter` evaluates against the index row IN
    * THE SCAN STAGE, so any predicate over the payload prunes where the
    * data lives — no side join at query time. */
  final case class IndexRow(part: Int, vector_id: Long, vec: Array[Float],
      layers: Array[Array[Long]], payload: Map[String, String] = Map.empty,
      sub: Int = 0)

  /** One search hit. */
  final case class Hit(qid: Long, vector_id: Long, dist: Double)

  /** Build per-partition HNSW graphs. `partCol` routes each vector to a
    * graph (IVF cell id, cluster label, or any bucketing — computed
    * upstream); insertion order within a partition is ascending id, and
    * levels derive deterministically from ids ([[Hnsw.levelFor]]), so
    * the build is reproducible run-to-run. */
  /** Internal pass-through column name for an already-packed payload
    * map (addBatch/removeBatch/compact carry existing rows' payloads
    * through a rebuild under this name). */
  private val PayCol = "__pay"

  /** The payload map for incoming rows: pack the named attribute
    * columns, else pass a pre-packed [[PayCol]] through (rebuild
    * paths), else empty. ONE definition — build and addBatch must pack
    * identically or rebuilt cells would carry differently-shaped maps
    * than fresh builds. */
  private def payExpr(df: DataFrame, payloadCols: Seq[String]): org.apache.spark.sql.Column =
    if (payloadCols.nonEmpty)
      map_from_arrays(
        array(payloadCols.map(lit): _*),
        array(payloadCols.map(c => col(c).cast("string")): _*))
    else if (df.columns.contains(PayCol)) col(PayCol)
    else typedLit(Map.empty[String, String])

  /** Default per-task cell cap: one build/search task never materializes
    * more than this many vectors (at 1k-dim floats that is ~256 MB of
    * vectors — comfortably inside an executor). A skewed k-means cell
    * (or a careless `numCells` at 100×) splits into bounded sub-graphs
    * instead of OOMing one task; the reference's per-walk memory is
    * likewise bounded (its graph holds at most `m_max` neighbors per
    * node, `/root/reference/src/lib.rs:271-290`). */
  val DefaultMaxCellSize: Int = 1 << 16

  def build(
      df: DataFrame,
      params: HnswParams = HnswParams(),
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      partCol: String = "part",
      payloadCols: Seq[String] = Nil,
      maxCellSize: Int = DefaultMaxCellSize): Dataset[IndexRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(maxCellSize > 0, s"maxCellSize must be positive, got $maxCellSize")
    val mL = params.mL
    // Cell-size cap, enforced IN the build task at zero plan cost: the
    // id-sorted run of a cell materializes in chunks of at most
    // maxCellSize rows ([[groupChunks]]), each chunk becoming its own
    // sub-graph under a distinct `sub` ordinal — so no task ever holds
    // more than maxCellSize vectors, with no census pass, no extra
    // shuffle, and a plan identical to the uncapped build. (An earlier
    // census + id-hash split design bounded memory the same way but
    // cost one extra aggregate + broadcast job per build — measured
    // ~0.3-0.5 s/build at the local job floor, ~18% of the whole bench;
    // chunking is free.) Chunks are deterministic — ascending-id blocks
    // — and search walks each (part, sub) sub-graph in its own task and
    // probes all sub-parts of a probed cell together, so routing
    // semantics (and results at exhaustive ef) are unchanged. A
    // mega-cell's BUILD runs its chunks sequentially in one
    // bounded-memory task; if build wall-clock on such a cell matters,
    // split the layout upstream (more IVF cells) — serving of the
    // chunks is already parallel.
    df.select(
        col(partCol).cast("int").as("part"),
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"),
        payExpr(df, payloadCols).as("pay"))
      .repartition(col("part"))
      .sortWithinPartitions("part", "id")
      .as[(Int, Long, Array[Float], Map[String, String])]
      .mapPartitions { it =>
        groupChunks(it, maxCellSize)(_._1).flatMap { case ((part, sub), rows) =>
          val ids = rows.map(_._2)
          val vecs: IndexedSeq[Array[Float]] = rows.map(_._3)
          val g = HnswGraph.build(params, vecs, ord => Hnsw.levelFor(ids(ord), mL))
          ids.indices.map { ord =>
            val layers = (0 until g.layerCount(ord)).map { l =>
              g.neighbors(ord, l).map(ids(_)).toArray
            }.toArray
            IndexRow(part, ids(ord), vecs(ord), layers, rows(ord)._4, sub)
          }
        }
      }
  }

  /** ANN search: probe every partition graph with every query, then
    * merge per-query candidates with the bounded-heap top-k. Queries are
    * a small DataFrame (qid, qv) — broadcast, never the corpus.
    *
    * `efSearch = max(efConstruction, k)` per the reference
    * (`src/lib.rs:164`); pass a larger `efSearch` to trade latency for
    * recall, or `Int.MaxValue`-ish values to make small-partition
    * search exhaustive (ANN ≡ exact — used by the oracle-gated query).
    *
    * With a router, `adaptiveAlpha = Some(a)` switches from a fixed
    * probe count to [[IvfIndex.Model.probeAdaptive]]: each query probes
    * its nearest cells up to `nprobe`, stopping early once centroid
    * distance exceeds a× the nearest — in-cluster queries touch fewer
    * cells at equal recall.
    *
    * `candidateFilter` is metadata-filtered ANN (extension — the
    * reference's search takes no predicate, `src/lib.rs:344-347`): a
    * boolean Column over the index row (`part`, `vector_id`, `vec`,
    * and the `payload` attribute map packed at build — e.g.
    * `element_at(col("payload"), "label") === "news"`)
    * evaluated in the scan stage BEFORE the shuffle; the beam then
    * navigates the intact graph but only admits matching rows as hits
    * ([[HnswGraph.searchLayer]]'s `keep`). Over-provision `efSearch`
    * to cover filtered-out candidates (exhaustive ef makes the
    * filtered result exact within probed cells). */
  def search(
      index: Dataset[IndexRow],
      queries: DataFrame,
      k: Int,
      params: HnswParams = HnswParams(),
      efSearch: Int = -1,
      qidCol: String = "qid",
      qvecCol: String = "qv",
      router: Option[IvfIndex.Model] = None,
      nprobe: Int = 3,
      adaptiveAlpha: Option[Double] = None,
      candidateFilter: Option[org.apache.spark.sql.Column] = None,
      routerGraph: Option[IvfIndex.GraphRouter] = None,
      routerEf: Int = -1): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    require(adaptiveAlpha.isEmpty || router.isDefined || routerGraph.isDefined,
      "adaptiveAlpha only applies to routed search — pass a router")
    val ef = if (efSearch > 0) efSearch else math.max(params.efConstruction, k)
    val qRows = queries
      .select(col(qidCol).cast("long"), col(qvecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .collect() // query side is small by contract; ships as a task binary
    // With a router, each query targets only its nprobe nearest cells —
    // search cost scales with nprobe/L of the index instead of all of
    // it (and with partition pruning on the part column, so do the
    // parquet reads when the index is cell-partitioned on disk).
    // `routerGraph` replaces the flat O(L·d)-per-query centroid scan
    // with the sublinear centroid-graph walk (IvfIndex.GraphRouter) —
    // the probe CHOICE changes mechanism, everything downstream is
    // identical; when both are passed, the graph wins.
    val targeted: Map[Int, Array[(Long, Array[Float])]] = (routerGraph, router) match {
      case (Some(g), _) =>
        qRows.flatMap { case (qid, qv) =>
          val cells = adaptiveAlpha match {
            case Some(a) => g.probeAdaptive(qv, a, nprobe, routerEf)
            case None    => g.probe(qv, nprobe, routerEf)
          }
          cells.map(cell => (cell, (qid, qv)))
        }.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
      case (None, Some(model)) =>
        qRows.flatMap { case (qid, qv) =>
          val cells = adaptiveAlpha match {
            case Some(a) => model.probeAdaptive(qv, a, nprobe)
            case None    => model.probeOrder(qv).take(nprobe)
          }
          cells.map(cell => (cell, (qid, qv)))
        }.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
      case (None, None) => Map.empty
    }
    val routed = router.isDefined || routerGraph.isDefined
    val qBc = spark.sparkContext.broadcast(qRows)
    val tBc = spark.sparkContext.broadcast(targeted)

    // routed: restrict the scan to the targeted cells BEFORE the
    // shuffle — on a save()-partitioned index this predicate prunes to
    // exactly the probed parquet subtrees (nprobe/L of the data)
    val scoped =
      if (routed) index.filter(col("part").isin(targeted.keys.toSeq: _*))
      else index
    // the candidate predicate is projected in the scan stage (below the
    // part exchange), so filtered-ANN eligibility is computed where the
    // data lives — never post-hoc on shuffled hits
    // coalesce: a predicate that is NULL for a row must EXCLUDE it
    // (SQL filter semantics), not crash the non-nullable encoder field
    val keepExpr = coalesce(candidateFilter.getOrElse(lit(true)).cast("boolean"), lit(false))
    // group per (part, sub): a capped-build mega-cell is several
    // independent sub-graphs — each searches in its own task (bounded
    // materialization), and because every sub-part carries the logical
    // part id, a routed probe of a cell reaches ALL its sub-parts
    val candidates = scoped.toDF()
      .select(col("part"), col("sub"), col("vector_id"), col("vec"), col("layers"),
        keepExpr.as("__keep"))
      .as[(Int, Int, Long, Array[Float], Array[Array[Long]], Boolean)]
      .repartition(col("part"), col("sub"))
      .sortWithinPartitions("part", "sub", "vector_id")
      .mapPartitions { it =>
        groupRuns(it)(r => (r._1, r._2)).flatMap { case ((part, _), rows) =>
          val qs: Iterator[(Long, Array[Float])] =
            if (routed) tBc.value.getOrElse(part, Array.empty).iterator
            else qBc.value.iterator
          if (qs.isEmpty) Iterator.empty
          else {
            val ids = rows.map(_._3)
            val ordOf = ids.zipWithIndex.toMap
            val vecs: IndexedSeq[Array[Float]] = rows.map(_._4)
            val adj: IndexedSeq[Array[Array[Int]]] =
              rows.map(_._5.map(_.map(ordOf)))
            val keep: IndexedSeq[Boolean] = rows.map(_._6)
            val g = HnswGraph.fromAdjacency(params, vecs, adj)
            qs.flatMap { case (qid, qv) =>
              g.searchEf(qv, k, ef, keep).map { case (ord, d) => Hit(qid, ids(ord), d) }
            }
          }
        }
      }

    val topk = TopK.topK(k)
    candidates.toDF()
      .groupBy(col("qid"))
      .agg(topk(col("dist"), col("vector_id")).as("hits"))
      .select(col("qid"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(
        col("qid"),
        (col("pos") + 1).cast("int").as("rank"),
        col("hit._2").as("vector_id"),
        col("hit._1").as("dist"))
  }

  /** Incremental maintenance: add a batch of vectors by rebuilding ONLY
    * the cells the batch touches — untouched cells' graphs pass through
    * unchanged. This is the batch-append pattern at scale: cell
    * rebuild cost is proportional to dirty-cell size, not index size,
    * and with [[save]]'s partitioned layout only dirty subtrees
    * rewrite. (The reference appends one vector at a time into one
    * global graph, `src/lib.rs:228-302`; cell-local rebuild is the
    * set-oriented equivalent.) */
  def addBatch(
      index: Dataset[IndexRow],
      additions: DataFrame,
      params: HnswParams = HnswParams(),
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      partCol: String = "part",
      payloadCols: Seq[String] = Nil,
      maxCellSize: Int = DefaultMaxCellSize): Dataset[IndexRow] = {
    import index.sparkSession.implicits._
    // payload for the arriving rows: pack from payloadCols, or pass a
    // pre-packed __pay through (compact's moved rows); existing rows
    // keep their built payload either way
    val newPay = payExpr(additions, payloadCols)
    val newRows = additions.select(
      col(partCol).cast("int").as("part"),
      col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("vec"),
      newPay.as("pay"))
    val dirty = newRows.select("part").distinct()
    val untouched = index.join(broadcast(dirty), Seq("part"), "left_anti").as[IndexRow]
    val existing = index.join(broadcast(dirty), Seq("part"), "left_semi")
      .select(col("part"), col("vector_id").as("id"), col("vec"), col("payload"))
    val rebuilt = build(
      existing.union(newRows).toDF("part", "vec_id", "embedding", PayCol),
      params, "vec_id", "embedding", "part", maxCellSize = maxCellSize)
    untouched.union(rebuilt)
  }

  /** Incremental deletes — the mirror of [[addBatch]] (extension: the
    * reference is append-only, `src/lib.rs:228-302`, but a long-lived
    * 100 TB index needs a remove path): cells containing a removed id
    * rebuild over their surviving vectors; untouched cells' graphs pass
    * through unchanged via a broadcast anti-join. The removal set is
    * small by contract (it broadcasts); cost is proportional to dirty
    * cells, not index size. Removing ids that aren't present is a
    * no-op, so the operation is idempotent. */
  def removeBatch(
      index: Dataset[IndexRow],
      removals: DataFrame,
      params: HnswParams = HnswParams(),
      idCol: String = "vec_id",
      maxCellSize: Int = DefaultMaxCellSize): Dataset[IndexRow] = {
    import index.sparkSession.implicits._
    val ids = removals.select(col(idCol).cast("long").as("vector_id")).distinct()
    val dirty = index.join(broadcast(ids), Seq("vector_id"), "left_semi")
      .select("part").distinct()
    val untouched = index.join(broadcast(dirty), Seq("part"), "left_anti").as[IndexRow]
    val survivors = index.join(broadcast(dirty), Seq("part"), "left_semi")
      .join(broadcast(ids), Seq("vector_id"), "left_anti")
      .select(col("part"), col("vector_id").as("vec_id"), col("vec").as("embedding"),
        col("payload").as(PayCol))
    untouched.union(build(survivors, params, maxCellSize = maxCellSize))
  }

  /** Consolidate a long-lived index's accumulated undersized cells
    * (the debris of many [[addBatch]] generations routing trickles of
    * new data into fresh part keys): every cell smaller than
    * `minCellSize` is dissolved and its vectors reassigned to the
    * nearest surviving cell by decimal-exact centroid distance; only
    * the receiving cells rebuild (via [[addBatch]]), untouched cells
    * pass through — compaction cost is proportional to the moved data
    * plus the receivers, not the index. If EVERY cell is undersized,
    * all vectors fold into the largest cell (ties to the lowest part
    * id). Search results are unchanged wherever search is exhaustive
    * per cell, and recall is typically improved — tiny graphs have no
    * small-world structure for the beam to exploit. */
  def compact(
      index: Dataset[IndexRow],
      params: HnswParams = HnswParams(),
      minCellSize: Int = 64,
      maxCellSize: Int = DefaultMaxCellSize): Dataset[IndexRow] = {
    // cell census is O(#cells) — driver-resident by design
    val sizes = index.groupBy("part").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    val survivors = sizes.filter(_._2 >= minCellSize).map(_._1)
    val keep: Array[Int] =
      if (survivors.nonEmpty) survivors
      else if (sizes.isEmpty) return index
      else Array(sizes.maxBy { case (part, n) => (n, -part.toLong) }._1)
    val dissolve = sizes.map(_._1).filterNot(keep.contains)
    if (dissolve.isEmpty) return index

    val kept = index.filter(col("part").isin(keep.toSeq: _*))
    val router = IvfIndex.fromPartitionMeans(
      kept.toDF().select(col("part"), col("vec")), "part", "vec")
    val moved = index.filter(col("part").isin(dissolve.toSeq: _*))
      .toDF()
      .select(
        IvfIndex.assignExpr(col("vec"), router).as("part"),
        col("vector_id").as("vec_id"),
        col("vec").as("embedding"),
        col("payload").as(PayCol))
    addBatch(kept, moved, params, maxCellSize = maxCellSize)
  }

  /** Split oversized cells into REAL first-class cells — the
    * parallelism counterpart of [[build]]'s bounded-memory chunking
    * and the inverse of [[compact]]'s dissolve: a mega-cell's chunks
    * serve in parallel tasks but BUILD sequentially inside one task;
    * rebalancing re-routes such a cell's rows into ceil(n/(cap/2))
    * fresh part ids by deterministic id-hash, so the rebuild (and all
    * later maintenance) parallelizes across tasks and a [[save]]d
    * layout prunes at the finer granularity. Untouched cells pass
    * through. Cell census is O(#cells) — driver-resident by design
    * (the [[compact]] convention). Derive a fresh router from the
    * rebalanced layout for routed serving (as [[graft.VectorDB.compact]]
    * does); search results are unchanged wherever search is exhaustive
    * per cell. */
  def rebalance(
      index: Dataset[IndexRow],
      params: HnswParams = HnswParams(),
      maxCellSize: Int = DefaultMaxCellSize): Dataset[IndexRow] = {
    import index.sparkSession.implicits._
    require(maxCellSize > 0, s"maxCellSize must be positive, got $maxCellSize")
    val sizes = index.groupBy("part").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    val over = sizes.filter(_._2 > maxCellSize)
    if (over.isEmpty) return index
    val target = math.max(1, maxCellSize / 2)
    // deterministic new-id allocation: fresh part ids start past the
    // current max and pack consecutively per split cell
    var next = sizes.map(_._1).max + 1
    val plan: Seq[(Int, Int, Int)] = over.toSeq.sortBy(_._1).map { case (c, n) =>
      val parts = math.max(2L, (n + target - 1) / target).toInt
      val base = next
      next += parts
      (c, base, parts)
    }
    val overIds = over.map(_._1).toSeq
    val untouched = index.filter(!col("part").isin(overIds: _*))
    val newPart = plan.foldLeft(lit(-1)) { case (acc, (c, base, parts)) =>
      when(col("part") === c,
        lit(base) + pmod(xxhash64(col("vector_id")), lit(parts.toLong)).cast("int"))
        .otherwise(acc)
    }
    val moved = index.filter(col("part").isin(overIds: _*))
      .toDF()
      .select(newPart.as("part"), col("vector_id").as("vec_id"),
        col("vec").as("embedding"), col("payload").as(PayCol))
    untouched.union(build(moved, params, maxCellSize = maxCellSize))
  }

  /** Merge two INDEPENDENTLY BUILT indexes into one serving layout
    * without rebuilding any cell graph — the 100 TB parallel-build
    * path: shard the corpus, build (and [[save]]) each shard's index
    * in its own job, then merge the [[load]]ed results into one
    * handle. Each cell's adjacency references only ids inside that
    * cell, so cells are SELF-CONTAINED and merging is a union with
    * the right side's part ids shifted past the left side's (shards
    * number their cells from their own router — part ids are
    * shard-local, and a collision would interleave two unrelated
    * graphs into one cell). Vector ids, however, are GLOBAL: the same
    * id in both shards would double-serve that vector, so
    * id-disjointness is checked loudly with one aggregate — merge is
    * a build-path operation, never a serving-path one, and a silent
    * duplicate would poison every later search. Routed serving
    * re-derives its router from the merged layout
    * ([[IvfIndex.fromPartitionMeans]]), exactly as [[rebalance]]'s
    * consumers do. At exhaustive ef, merged-search ≡ a single build
    * over the union corpus (the q_ann_merged gate's brute-force
    * oracle); at finite ef the merged index keeps each shard's own
    * recall, since every cell graph is byte-identical to its
    * pre-merge self. */
  def merge(a: Dataset[IndexRow], b: Dataset[IndexRow]): Dataset[IndexRow] = {
    val aMax = a.agg(max("part")).head().get(0)
    val bMin = b.agg(min("part")).head().get(0)
    if (aMax == null) return b
    if (bMin == null) return a
    val shift = aMax.asInstanceOf[Int] + 1 - bMin.asInstanceOf[Int]
    val shifted = b.toDF()
      .withColumn("part", (col("part") + shift).cast("int"))
      .as[IndexRow](a.encoder)
    // persist BEFORE the duplicate-id aggregate so the check and the
    // caller's first materialization share one computation of the
    // union lineage (the returned dataset is persisted; the caller
    // owns its unpersist — VectorDB.mergeWith's generation contract)
    val merged = a.union(shifted)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the aggregate below MATERIALIZES cache blocks — on the rejection
    // path the caller never sees the dataset, so unpersist here or the
    // blocks leak (the caller only owns the unpersist on success)
    try {
      val dup = merged.groupBy("vector_id").count()
        .filter(col("count") > 1).select("vector_id").head(1)
      require(dup.isEmpty,
        s"merge requires globally unique vector ids; id ${dup.headOption.map(_.getLong(0)).getOrElse(-1L)} " +
          "appears in more than one shard (shard the corpus disjointly, " +
          "or removeBatch/upsert before merging)")
    } catch {
      case e: Throwable => merged.unpersist(); throw e
    }
    merged
  }

  /** N-way [[merge]] — the form the 100 TB build actually runs
    * (hundreds of per-shard indexes, not two): every shard's part
    * range shifts into its own packed slot and ONE union + ONE
    * id-disjointness aggregate finishes the job, where a fold of
    * binary merges re-checks the GROWING union once per shard —
    * O(N²·rows) of duplicate-check work for N shards vs this one
    * O(total) pass. Part-range discovery is ONE job: every shard's
    * part column is tagged with its shard ordinal, unioned, and
    * aggregated in a single groupBy(shard) min/max — N sequential
    * driver-side aggregates would cost N job floors (~0.2 s each)
    * before the merge starts, hundreds of shards deep at 100 TB.
    * Empty shards drop. Served results ≡ the binary-merge fold
    * (spec-pinned) — only the packed part-id labeling differs, and
    * part ids are layout-internal. Like [[merge]], the returned union
    * is persisted before the duplicate-id aggregate (one computation
    * serves the check and the caller's first materialization; the
    * caller owns the unpersist). */
  def mergeAll(shards: Seq[Dataset[IndexRow]]): Dataset[IndexRow] = {
    require(shards.nonEmpty, "mergeAll requires at least one shard")
    val rangeRows = shards.zipWithIndex
      .map { case (s, i) => s.toDF().select(lit(i).as("__shard"), col("part")) }
      .reduce(_ union _)
      .groupBy("__shard")
      .agg(min("part").as("lo"), max("part").as("hi"))
      .collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2)))
      .toMap
    val nonEmpty = shards.zipWithIndex.flatMap { case (s, i) =>
      rangeRows.get(i).map(r => (s, r))
    }
    if (nonEmpty.isEmpty) return shards.head
    var next = 0
    val shifted = nonEmpty.map { case (s, (lo, hi)) =>
      val shift = next - lo
      next += hi - lo + 1
      if (shift == 0) s
      else s.toDF()
        .withColumn("part", (col("part") + shift).cast("int"))
        .as[IndexRow](s.encoder)
    }
    if (nonEmpty.size == 1) return shifted.head
    val merged = shifted.reduce(_ union _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // same error-path contract as merge(): rejection must unpersist
    // the blocks the duplicate-id aggregate just materialized
    try {
      val dup = merged.groupBy("vector_id").count()
        .filter(col("count") > 1).select("vector_id").head(1)
      require(dup.isEmpty,
        s"mergeAll requires globally unique vector ids; id ${dup.headOption.map(_.getLong(0)).getOrElse(-1L)} " +
          "appears in more than one shard (shard the corpus disjointly, " +
          "or removeBatch/upsert before merging)")
    } catch {
      case e: Throwable => merged.unpersist(); throw e
    }
    merged
  }

  /** Persist a built index partitioned by cell: each IVF cell becomes
    * its own parquet subtree, so a routed search with nprobe cells
    * reads exactly those subtrees (partition pruning on `part`) —
    * at 100 TB the probe cost is nprobe/L of the index, not a full
    * scan. */
  def save(index: Dataset[IndexRow], path: String): Unit =
    index.write.mode("overwrite").partitionBy("part").parquet(path)

  /** Reload a persisted index for serving. Pre-payload saves load with
    * an empty payload map; pre-cap saves (no `sub` column) load as
    * single-sub cells. */
  def load(spark: SparkSession, path: String): Dataset[IndexRow] = {
    import spark.implicits._
    val df = spark.read.parquet(path)
    val pay =
      if (df.columns.contains("payload"))
        coalesce(col("payload"), typedLit(Map.empty[String, String]))
      else typedLit(Map.empty[String, String])
    val sub =
      if (df.columns.contains("sub")) coalesce(col("sub").cast("int"), lit(0))
      else lit(0)
    df.select(col("part").cast("int").as("part"), col("vector_id"),
        col("vec").cast("array<float>").as("vec"), col("layers"),
        pay.as("payload"), sub.as("sub"))
      .as[IndexRow]
  }

  /** Group a sorted iterator into (key, materialized run) pairs without
    * loading more than one run at a time. */
  private def groupRuns[T, K](it: Iterator[T])(key: T => K): Iterator[(K, Vector[T])] =
    new Iterator[(K, Vector[T])] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): (K, Vector[T]) = {
        val k = key(buf.head)
        val run = Vector.newBuilder[T]
        while (buf.hasNext && key(buf.head) == k) run += buf.next()
        (k, run.result())
      }
    }

  /** Group a sorted iterator into ((key, chunkOrdinal), chunk) pairs,
    * materializing at most `cap` elements at a time: a run longer than
    * `cap` streams out as consecutive bounded chunks (ordinals 0, 1, …
    * restart at each new key) instead of one unbounded buffer — the
    * memory guarantee behind [[build]]'s cell-size cap. */
  private def groupChunks[T, K](it: Iterator[T], cap: Int)(
      key: T => K): Iterator[((K, Int), Vector[T])] =
    new Iterator[((K, Int), Vector[T])] {
      private val buf = it.buffered
      private var curKey: Option[K] = None
      private var nextChunk = 0
      def hasNext: Boolean = buf.hasNext
      def next(): ((K, Int), Vector[T]) = {
        val k = key(buf.head)
        if (!curKey.contains(k)) { curKey = Some(k); nextChunk = 0 }
        val run = Vector.newBuilder[T]
        var n = 0
        while (n < cap && buf.hasNext && key(buf.head) == k) {
          run += buf.next()
          n += 1
        }
        val out = ((k, nextChunk), run.result())
        nextChunk += 1
        out
      }
    }
}
