package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupQueries, IndexQueries, RelationalQueries, VectorQueries}

/** Physical-plan shape guards: the scale properties the engine claims
  * (filter pushdown into the scan, broadcasted small sides, bounded
  * top-k operators, no accidental cartesian products) asserted against
  * the optimizer's actual output, so a refactor that silently degrades
  * a 100 TB plan fails here at sf0.001. */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("single-query top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(VectorQueries.qKnnExact(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"expected bounded top-k operator:\n$p")
    assert(!p.contains("CartesianProduct"), "query-vector join must broadcast")
  }

  test("hybrid filtered search pushes the metadata predicate into the parquet scan") {
    val p = plan(VectorQueries.qKnnFiltered(spark, sfDir))
    assert(p.contains("PushedFilters: [In(label"),
      s"label predicate must reach the scan (partition pruning at scale):\n$p")
  }

  test("IVF probe search broadcasts the probe set and the query vector") {
    val p = plan(IndexQueries.qAnnIvf(spark, sfDir))
    assert(p.contains("BroadcastExchange"), s"probes/query must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"final top-k must be bounded:\n$p")
  }

  test("batch k-NN join broadcasts queries and pre-aggregates per partition") {
    val df = VectorQueries.qKnnBatch(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"corpus x queries must be a broadcast join, never a shuffle of the corpus:\n$p")
    // bounded-heap partial aggregation: both partial_ and final merge
    // phases of the top-k aggregate must appear (map-side combine =>
    // the shuffle carries O(queries*k), not O(corpus*queries))
    assert(p.contains("partial_"), s"expected map-side partial top-k aggregation:\n$p")
  }

  test("LSH band joins are equi-joins, never cartesian or nested-loop") {
    for ((name, df) <- Seq(
        "emblsh" -> DedupQueries.qDedupEmbLsh(spark, sfDir),
        "simhash_pairs" -> DedupQueries.qDedupSimhashPairs(spark, sfDir))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name blocking join degenerated to all-pairs:\n$p")
    }
  }

  test("embcos blocking join is an equi-join on the trained cell (never all-pairs)") {
    val p = plan(DedupQueries.qDedupEmbcos(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cell-blocked self-join degenerated to all-pairs:\n$p")
    assert(p.contains("ivf_assign") || p.contains("IvfAssign"),
      s"routing must run through the native codegen kernel, not an HOF chain:\n$p")
  }

  test("two-level embcos: coarse kernel routing, map-side argmin, equi-join blocking (never all-pairs)") {
    val p = plan(DedupQueries.qDedupEmbcos2(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cell-blocked self-join degenerated to all-pairs:\n$p")
    assert(p.contains("ivf_assign") || p.contains("IvfAssign"),
      s"coarse routing must run through the native codegen kernel:\n$p")
    // the inner-level argmin must pre-aggregate map-side: the shuffle
    // carries one partial min per (vec_id, c0), never the n x k2 join
    assert(p.contains("partial_min") || p.contains("partial_"),
      s"inner argmin must have a map-side partial phase:\n$p")
    // pivot selection must be the bounded-heap TopK aggregate, never a
    // per-cell ranking window (which serializes the whole corpus into
    // k1 ~ n^(1/4) partitions and sorts n^(3/4) rows per task)
    assert(!p.contains("Window"),
      s"inner-pivot selection must not rank via a window sort:\n$p")
  }

  test("addBatch isolates dirty cells via broadcast semi/anti joins (no corpus shuffle)") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("part", col("label"))
    val late = (col("vec_id") % 2 === 1) && (col("label") < 5)
    val base = graft.index.HnswIndex.build(e.filter(!late))
    val p = plan(graft.index.HnswIndex.addBatch(base, e.filter(late)).toDF())
    // the dirty-cell set is O(#cells) — both the untouched anti-join and
    // the rebuild semi-join must broadcast it, never shuffle the index
    assert(p.contains("BroadcastHashJoin"),
      s"dirty-cell joins must broadcast the tiny cell set:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"addBatch must not shuffle the index to meet the dirty set:\n$p")
  }

  test("cosine re-score scans through a pushed-down id filter, not a full corpus probe") {
    val p = plan(IndexQueries.qAnnCosine(spark, sfDir))
    // the returned plan is the re-score side (the walk ran eagerly to
    // collect the bounded hit set): its corpus scan must carry the
    // In(vec_id, ...) filter so row-group pruning applies at scale
    assert(p.contains("PushedFilters: [In(vec_id"),
      s"re-score must push the hit-id filter into the parquet scan:\n$p")
  }

  test("dot (MIPS) re-score scans through a pushed-down id filter, not a full corpus probe") {
    val p = plan(IndexQueries.qVectordbDot(spark, sfDir))
    // same contract as the cosine arm: the returned plan is the exact-
    // dot re-score side and its corpus scan must carry the In(vec_id)
    // filter so row-group pruning applies at scale
    assert(p.contains("PushedFilters: [In(vec_id"),
      s"dot re-score must push the hit-id filter into the parquet scan:\n$p")
  }

  test("filtered ANN evaluates the candidate predicate in the scan stage, below the part exchange") {
    val p = plan(IndexQueries.qAnnFiltered(spark, sfDir))
    val ex = p.indexOf("Exchange hashpartitioning(part")
    assert(ex >= 0, s"expected the index repartition exchange:\n$p")
    // the predicate projection must sit BELOW (= printed after) the
    // exchange: eligibility is computed where the index rows live, not
    // post-hoc on shuffled hits
    assert(p.indexOf("pmod", ex) > ex,
      s"candidate predicate must be computed in the scan stage:\n$p")
  }

  test("payload-filtered ANN evaluates the attribute predicate in the scan stage, below the part exchange") {
    val p = plan(IndexQueries.qAnnFilteredMeta(spark, sfDir))
    val ex = p.indexOf("Exchange hashpartitioning(part")
    assert(ex >= 0, s"expected the index repartition exchange:\n$p")
    // the payload-map LOOKUP (element_at) must be computed where the
    // index rows live (below the exchange), not post-hoc on shuffled
    // hits — matching the column name "payload" would be vacuous (the
    // scan prints it in its schema wherever the filter sits), so match
    // the lookup function itself
    assert(p.indexOf("element_at", ex) > ex,
      s"payload attribute predicate must be computed in the scan stage:\n$p")
    assert(p.lastIndexOf("element_at", ex) < 0,
      s"payload lookup leaked above the part exchange:\n$p")
  }

  test("removeBatch isolates dirty cells via broadcast semi/anti joins (no corpus shuffle)") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("part", col("label"))
    val base = graft.index.HnswIndex.build(e)
    val gone = e.filter(col("vec_id") % 5 === 2 && col("label") < 4).select("vec_id")
    val p = plan(graft.index.HnswIndex.removeBatch(base, gone).toDF())
    assert(p.contains("BroadcastHashJoin"),
      s"dirty-cell + tombstone joins must broadcast the tiny sets:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"removeBatch must not shuffle the index to meet the removal set:\n$p")
  }

  test("media feature extraction is one narrow map pass (no shuffle)") {
    import graft.multimodal.Multimodal
    val p = plan(Multimodal.extractFeatures(Multimodal.mediaFromDocs(
      spark.read.parquet(s"$sfDir/documents.parquet"))).toDF())
    assert(!p.contains("Exchange"),
      s"PPM decode must stay partition-local (mapInPandas shape):\n$p")
  }

  test("domainCap pre-aggregates per partition (bounded-heap map-side combine)") {
    import org.apache.spark.sql.functions.col
    val p = plan(graft.operators.Curation.domainCap(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      cap = 3, scoreCol = col("n_chars").cast("double")))
    // the 100 TB claim: the shuffle carries O(#domains * cap) partial
    // heaps, never the corpus — and no ranking-window sort appears
    assert(p.contains("partial_"), s"expected map-side partial top-k:\n$p")
    assert(!p.contains("Window"), s"domainCap must not rank via a window sort:\n$p")
  }

  test("persisted routed search prunes the scan to the probed cell subtrees") {
    // the serving claim at 100 TB: a routed query over a save()d index
    // reads nprobe/L of the data — i.e. the part predicate must land
    // as a PARTITION filter on the parquet scan, not a post-scan filter
    val p = plan(IndexQueries.qAnnPersisted(spark, sfDir))
    val pf = "PartitionFilters: \\[[^\\]]*".r.findFirstIn(p)
    assert(pf.exists(f => f.contains("part") && f.contains("IN")),
      s"expected a `part IN (...)` partition filter on the persisted-index scan:\n$p")
  }

  test("relational aggregate uses two-phase hash aggregation (map-side combine)") {
    val p = plan(RelationalQueries.qAggPricing(spark, sfDir))
    assert(p.contains("HashAggregate"), s"expected hash aggregation:\n$p")
    assert(p.contains("partial_"), s"expected a partial (map-side) phase:\n$p")
  }

  test("distance kernels run inside whole-stage codegen") {
    // AQE materializes codegen stages only at execution; run the query,
    // then inspect the finalized adaptive plan
    val df = VectorQueries.qL2Kernel(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // formatted mode marks codegen'd operators with "[codegen id : N]"
    assert(p.contains("[codegen id :"), s"kernel fell out of codegen:\n${p.take(3000)}")
    assert("\\* Project".r.findFirstIn(p).isDefined,
      s"the kernel projection itself must be inside a codegen stage:\n${p.take(3000)}")
  }

  test("BM25 keeps corpus stats and df broadcast-side; final top-k is bounded") {
    // the raw operator, not the registered query: the query serves from
    // the session-memoized (persisted) scored corpus
    val p = plan(graft.operators.Bm25.topK(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      graft.queries.HybridQueries.Terms, 10))
    assert(p.contains("TakeOrderedAndProject"),
      s"BM25 top-k must be bounded, never a global sort:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"df/stats sides must broadcast (no corpus shuffle to meet them):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-wide shuffle join belongs in the BM25 plan:\n$p")
  }

  test("IVF-PQ serving broadcasts probes and bounds the ADC top-k") {
    val p = plan(IndexQueries.qAnnIvfPq(spark, sfDir))
    assert(p.contains("BroadcastExchange"), s"probe set must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"ADC top-k must be bounded:\n$p")
    assert(!p.contains("CartesianProduct"), s"query join must broadcast:\n$p")
  }

  test("repetition stats compile to one narrow map-only pass (no shuffle, no explode)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.{bigrams, tokens, topTokenCount}
    // the stats projection itself (the registered query adds only a
    // presentation orderBy): row-local kernels must introduce neither
    // an Exchange (shuffle) nor a Generate (explode)
    val t = tokens(col("text"))
    val bi = bigrams(t)
    val p = plan(spark.read.parquet(s"$sfDir/documents.parquet").select(
      col("doc_id"),
      topTokenCount(t).as("top_tok"),
      (size(t) - size(array_distinct(t))).as("dup_tok"),
      (size(bi) - size(array_distinct(bi))).as("dup_bigram")))
    assert(!p.contains("Exchange"), s"repetition stats must not shuffle:\n$p")
    assert(!p.contains("Generate"), s"repetition stats must not explode:\n$p")
  }

  test("range search fuses the radius filter into the scan (no hash shuffle, no join)") {
    val db = graft.VectorDB.open(spark, s"$sfDir/embeddings.parquet", dims = 64)
    val p = plan(db.searchRange(Seq.fill(64)(0.1f), 2.0))
    assert(!p.contains("Exchange hashpartitioning"),
      s"range search must not shuffle corpus rows by key:\n$p")
    assert(!p.contains("Join"),
      s"the query vector is a literal — no join may appear:\n$p")
    // the only allowed exchange is the bounded result's presentation
    // sort (rangepartitioning over matched rows, never the corpus scan)
    assert("(?<!Broadcast)Exchange(?! rangepartitioning)".r.findFirstIn(p).isEmpty,
      s"unexpected exchange in the range-search plan:\n$p")
  }

  test("rollup computes every grouping set from a single scan (expand + two-phase agg)") {
    val p = plan(RelationalQueries.qRollupPricing(spark, sfDir))
    assert(p.contains("Expand"),
      s"ROLLUP must expand grouping sets in one pass, not rescan per level:\n$p")
    assert(p.contains("partial_"), s"expected map-side partial aggregation:\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"all subtotal levels must come from ONE lineitem scan:\n$p")
  }

  test("decontamination broadcasts the eval inverted index") {
    // the raw operator, not the registered query: the query serves
    // from the session-memoized (persisted) pair table
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = plan(graft.operators.Curation.decontaminate(
      d.filter(pmod(col("doc_id"), lit(50)) =!= 0),
      d.filter(pmod(col("doc_id"), lit(50)) === 0),
      n = 3, minOverlap = 2))
    assert(p.contains("BroadcastHashJoin"),
      s"the (tiny) eval side must broadcast — the corpus side is one scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no corpus shuffle or all-pairs join belongs in the decontamination plan:\n$p")
  }

  test("funnel stage joins carry no forced broadcast over corpus-derived aggregates") {
    // the per-user stage aggregates grow with the corpus: a user-forced
    // broadcast() hint OOMs executors at 100x. The hint surfaces in the
    // optimized logical plan as a join strategy hint — its absence means
    // AQE decides at runtime from actual sizes (broadcast when genuinely
    // small, shuffle otherwise), which is the scale-safe shape.
    val lp = RelationalQueries.qEventsFunnel(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(!lp.contains("strategy=broadcast"),
      s"funnel must not force-broadcast a corpus-derived side:\n$lp")
  }

  test("segment dedup: two-phase census agg, equi-join on the segment key, never all-pairs") {
    val p = plan(DedupQueries.qDedupSegments(spark, sfDir))
    assert(p.contains("partial_"),
      s"segment census must pre-aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the census keep-join must be an equi-join on seg:\n$p")
  }

  test("PII redaction is one narrow map pass (no shuffle)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (ne, ni, np) = graft.operators.Curation.piiCounts(org.apache.spark.sql.functions.col("text"))
    val p = plan(docs.select(org.apache.spark.sql.functions.col("doc_id"),
      ne.as("e"), ni.as("i"), np.as("p"),
      graft.operators.Curation.redactPii(org.apache.spark.sql.functions.col("text"))))
    assert(!p.contains("Exchange"), s"redaction must not shuffle:\n$p")
  }

  test("binary Hamming k-NN broadcasts packed queries and pre-aggregates the heap") {
    val p = plan(IndexQueries.qBqKnn(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"packed corpus x packed queries must broadcast the query side:\n$p")
    assert(p.contains("partial_"), s"expected map-side partial bounded heap:\n$p")
  }

  test("MaxSim pre-aggregates the per-query-vector max map-side; queries broadcast") {
    val p = plan(VectorQueries.qMaxsim(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"doc vectors x query vectors must broadcast the query side:\n$p")
    assert(p.contains("partial_max"),
      s"the per-(qid,doc,q_ord) max must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("KMV sketch bounds state before any exchange (no distinct shuffle of the corpus)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val p = plan(graft.operators.Sketches.kmvDistinct(li,
      org.apache.spark.sql.functions.col("l_orderkey"), k = 64))
    val firstMap = p.indexOf("MapPartitions")
    val firstExchange = p.indexOf("Exchange")
    assert(firstMap >= 0, s"expected the bounded per-partition TreeSet pass:\n$p")
    // executedPlan prints top-down: the scan-side MapPartitions must sit
    // BELOW (= printed after) every exchange — all shuffles operate on
    // the already-bounded candidate set, never on raw corpus hashes
    assert(firstExchange >= 0 && firstExchange < firstMap,
      s"every exchange must consume the bounded candidates, not the corpus:\n$p")
  }

  test("residual IVFADC broadcasts probes/centroids/query-residuals; top-k stays bounded") {
    val p = plan(IndexQueries.qAnnIvfPqRes(spark, sfDir))
    assert(p.contains("BroadcastExchange"),
      s"centroids, probes, and per-cell query residuals must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"final top-k must be bounded:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbounded cartesian:\n$p")
  }

  test("rank-eval joins the truth table hash-side and pre-aggregates per partition") {
    val p = plan(IndexQueries.qRankEval(spark, sfDir))
    assert(p.contains("partial_"), s"metric aggregate must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian against the truth table:\n$p")
  }

  test("OHLC bars aggregate in one map-side-combined hash pass (no window sort)") {
    val p = plan(RelationalQueries.qOhlcBars(spark, sfDir))
    assert(!p.contains("Window"),
      s"open/close must resolve via struct-ordered min/max, never a per-group window sort:\n$p")
    assert(p.contains("partial_"), s"expected map-side partial aggregation:\n$p")
  }

  test("routed MaxSim prunes the scoring scan by In(doc_id) and broadcasts candidates + queries") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // doc_id as a PHYSICAL column (the real multi-vector corpus
    // stores one): a derived `vec_id div 4` id would keep the In()
    // as a post-scan filter — pruning must reach the source
    val dv = e.select(col("vec_id").as("doc_id"), col("embedding").as("vec"))
    val qv = e.filter(col("vec_id") < 8)
      .select(expr("vec_id div 4").as("qid"), col("vec_id").as("q_ord"),
        col("embedding").as("qv"))
    val model = graft.index.IvfIndex.train(e, k = 8, iters = 1)
    val cells = graft.operators.LateInteraction
      .docCellListing(dv, model, docId = "doc_id", docVec = "vec")
    val p = plan(graft.operators.LateInteraction
      .maxSimRouted(dv, cells, qv, k = 5, model, nprobe = 1))
    // the doc-vector re-read must reach the source pruned: no
    // corpus-wide nested loop in the routed arm
    assert(p.contains("PushedFilters: [In(vec_id") || p.contains("PushedFilters: [In(doc_id"),
      s"candidate id pruning must reach the parquet scan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate pairs and query vectors must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the routed arm must never cross the corpus with the query batch:\n$p")
    assert(p.contains("partial_max"),
      s"the per-(qid,doc,q_ord) max must combine map-side:\n$p")
  }

  test("heavy hitters: fused map-only estimate filter, one two-phase verify aggregate, no joins") {
    import org.apache.spark.sql.functions._
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
    val p = plan(graft.operators.Sketches.CountMin
      .heavyHittersText(toks, col("tok"), threshold = 100L, width = 64))
    assert(p.contains("partial_"),
      s"the verify count must combine map-side:\n$p")
    assert(!p.contains("Join"),
      s"the grid rides as literal lookup maps — the verify plan must contain no join:\n$p")
    // exactly one exchange: the post-filter key aggregate (the grid
    // build ran eagerly in its own job at call time)
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"verify must shuffle only candidate partials:\n$p")
  }

  test("outlier trim pushes both quantile bounds into the parquet scan") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = plan(graft.operators.Curation.trimOutliers(
      docs, col("n_chars"), loQ = (1, 20), hiQ = (19, 20)))
    assert(p.contains("PushedFilters: [") &&
      p.contains("GreaterThanOrEqual(n_chars") &&
      p.contains("LessThanOrEqual(n_chars"),
      s"the between-bounds filter must reach the source:\n$p")
  }

  test("column pruning reaches the scan: kernel query reads only the needed columns") {
    val p = plan(VectorQueries.qL2Kernel(spark, sfDir))
    val scanSchemas = "ReadSchema: [^\\n]*".r.findAllIn(p).toList
    assert(scanSchemas.nonEmpty)
    assert(scanSchemas.forall(s => !s.contains("label")),
      s"scan reads a column the query never uses:\n${scanSchemas.mkString("\n")}")
  }

  test("stream-static enrichment broadcasts the dimension; the stream never shuffles for the join") {
    val p = plan(graft.queries.PipelineQueries.qStreamEnrich(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"dimension join must broadcast (stream side must not shuffle):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join here shuffles the event stream on the dim key:\n$p")
  }

  test("bloom build bounds the shuffle at the grid (bit_or pre-aggregates map-side)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = plan(graft.operators.Sketches.Bloom.build(docs, col("text"), 8192))
    assert(p.contains("partial_bit_or") || p.contains("partial_"),
      s"bloom build must pre-aggregate the word census map-side:\n$p")
  }

  test("ship-priority pushes all three filters to their scans, " +
      "top-10 is bounded, no cartesian") {
    val p = plan(RelationalQueries.qShipPriority(spark, sfDir))
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter must reach the customer scan:\n$p")
    assert(p.contains("LessThan(o_orderdate"),
      s"order-date filter must reach the orders scan:\n$p")
    assert(p.contains("GreaterThan(l_shipdate"),
      s"ship-date filter must reach the lineitem scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must be a bounded operator, not a global sort:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("frequent pairs: survivor prune is a broadcast semi-join and the " +
      "self-join reuses one basket partitioning") {
    val p = plan(RelationalQueries.qFreqPairs(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"the model-sized survivor set must broadcast (map-side prune):\n$p")
    assert(!p.contains("CartesianProduct"))
    // at fixture scale AQE broadcasts the small self-join side (fine);
    // the 100 TB shape is the shuffled self-join — force it and pin
    // that the basket exchange is computed ONCE and reused, so the
    // corpus never shuffles twice for the two identical sides
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // exchange reuse is an AQE runtime decision — execute, then read
      // the FINAL adaptive plan
      val df = RelationalQueries.qFreqPairs(spark, sfDir)
      df.collect() // executes THIS QueryExecution (count() would clone it)
      val ps = df.queryExecution.executedPlan.toString
      assert(ps.contains("ReusedExchange") || ps.contains("ReusedQueryStage"),
        s"both self-join sides are the same frame — one basket exchange, reused:\n$ps")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("table profile scans exactly one column per census (column pruning), " +
      "and never plans an Expand") {
    val p = plan(RelationalQueries.qProfileTable(spark, sfDir))
    assert(p.contains("ReadSchema: struct<l_returnflag:string>"),
      s"each per-column census must prune the scan to its one field:\n$p")
    assert(!p.contains("Expand"),
      s"multi-countDistinct Expand would multiply corpus rows into the shuffle:\n$p")
  }

  test("HRW shard assignment is map-only: no join, one census exchange") {
    val p = plan(graft.queries.PipelineQueries.qHrwShard(spark, sfDir))
    assert(!p.contains("Join"),
      s"rendezvous routing is a static expression tree, never a join:\n$p")
    assert(p.count(_ == '\n') > 0 &&
      "Exchange".r.findAllIn(p).size - "ReusedExchange".r.findAllIn(p).size <= 2,
      s"only the O(#shards) census (+AQE read) may shuffle:\n$p")
  }

  test("OOV scoring joins the corpus against a BROADCAST vocabulary") {
    val p = plan(graft.queries.TextQueries.qOovRate(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"the top-5000 vocabulary must broadcast — the corpus never shuffles on token:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join here would shuffle the whole token stream:\n$p")
  }

  test("unigram coverage joins the word stream against a BROADCAST vocabulary table") {
    val p = plan(graft.queries.TextQueries.qUnigramCoverage(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"the vocabulary-sized (word → subtoks) table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join here would shuffle the whole word stream:\n$p")
  }

  test("bounded k-hop gate pushes its subgraph predicate into the scan") {
    // kHopReach localCheckpoints per level, so the returned frame reads
    // an ExistingRDD — pin the pushdown on the gate's OWN scan shape
    // (the exact edge expression qKhop feeds the operator)
    import org.apache.spark.sql.functions.col
    val edges = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_partkey") < 500)
      .select(col("l_suppkey").cast("long").as("src"),
        (col("l_partkey").cast("long") + 1000000L).as("dst"))
    val p = plan(edges)
    assert(p.contains("LessThan(l_partkey,500)"),
      s"the bounded-pool predicate must reach the parquet scan:\n$p")
    // and the gate end-to-end stays bounded: top-50, no cartesian
    val g = plan(RelationalQueries.qKhop(spark, sfDir))
    assert(g.contains("TakeOrderedAndProject") && !g.contains("CartesianProduct"), g)
  }

  test("secret screen is map-only up to the review queue: no shuffle, no join") {
    import org.apache.spark.sql.functions.col
    val p = plan(graft.operators.Curation.secretScan(
      spark.read.parquet(s"$sfDir/documents.parquet")))
    assert(!p.contains("Exchange"),
      s"the shape prefilter + entropy verdict must not shuffle:\n$p")
    assert(!p.contains("Join"), s"the screen touches only its own row:\n$p")
  }

  test("AUC census: one combined score census, the window on the domain, one row out") {
    val p = plan(RelationalQueries.qAucPurchase(spark, sfDir))
    // the heavy pass is the (score -> pos,neg) hash aggregate; the only
    // exchanges are that census + the final 1-row aggregate chain
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"nothing in the AUC census may join corpus-scale sides:\n$p")
  }

  test("dHash near-dup census: the corpus reduces to the hash domain before any join") {
    import org.apache.spark.sql.functions.col
    import graft.multimodal.Multimodal
    val hashes = Multimodal.dHashMedia(Multimodal.mediaFromDocs(
      spark.read.parquet(s"$sfDir/documents.parquet")))
    val p = plan(Multimodal.dHashCensus(hashes, maxHamming = 3, bits = 12))
    // the self-join must read the checkpointed DOMAIN census (an
    // ExistingRDD after localCheckpoint), never re-scan the corpus
    assert(!p.contains("parquet"),
      s"the domain self-join must run on the censused artifact, not the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a 4096-row domain join must broadcast:\n$p")
  }

  test("HTML extraction is one narrow map pass (no shuffle, no explode, no UDF)") {
    import org.apache.spark.sql.functions._
    import graft.operators.HtmlExtract
    val p = plan(spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        HtmlExtract.extractMainText(col("text")).as("main"),
        HtmlExtract.extractLinks(col("text")).as("links")))
    // the 100 TB claim: extraction rides IN the crawl scan — per-row
    // string/regex/HOF kernels only
    assert(!p.contains("Exchange"), s"extraction must not shuffle:\n$p")
    assert(!p.contains("Generate"), s"extraction must not explode:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"extraction must use built-in kernels, never a UDF:\n$p")
  }

  test("URL resolve/normalize is map-only; the frontier's ONE shuffle is the host census") {
    import org.apache.spark.sql.functions._
    import graft.operators.UrlParse
    val resolved = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        UrlParse.resolve(lit("http://h.example/d/p.html"), col("source")).as("url"))
    assert(!plan(resolved).contains("Exchange"),
      s"resolve/normalize must not shuffle:\n${plan(resolved)}")
    val census = resolved.groupBy(UrlParse.host(col("url")).as("host"))
      .agg(count(lit(1)).as("n"))
    val pc = plan(census)
    // two-phase hash agg: partials combine map-side before the one wide op
    assert(pc.contains("partial_count") || pc.contains("partial count"),
      s"host census must pre-aggregate map-side:\n$pc")
  }

  test("robots evaluation broadcasts the rules table (politeness is map-side)") {
    import org.apache.spark.sql.functions._
    import graft.operators.RobotsTxt
    val rules = RobotsTxt.rules(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("source").as("host"),
          lit("User-agent: *\nDisallow: /d/").as("body")),
      col("host"), col("body"))
    val urls = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(concat(lit("http://"), col("source"), lit("/d/x")).as("url"))
    val p = plan(RobotsTxt.evaluate(urls, col("url"), "anybot", rules))
    assert(p.contains("BroadcastExchange"),
      s"the host-census-sized rules table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the frontier must never shuffle to meet the rules:\n$p")
  }
}
