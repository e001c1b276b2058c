package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.index.HnswParams
import graft.sources.BinaryVectorSource

/** Py4J-friendly facade backing the Python wrapper
  * (`python/graft_db.py`) — the engine's answer to the reference's
  * PyO3 module (`/root/reference/src/lib.rs:305-359`, consumed by
  * `semantic_search.py:29-46` / `benchmark.py`): a Python user
  * constructs a database over a raw-f32 `.bin` file or a parquet
  * corpus, builds the index over an id range, and point-queries
  * in-process.
  *
  * Design constraints of the py4j bridge, which this object absorbs
  * so the public Scala API stays idiomatic: fixed arity (py4j cannot
  * supply Scala default arguments), no `Option`/`Seq` parameters
  * (python lists auto-convert to `java.util.List` only), and a field
  * holder for the (ids, dists) point result instead of Scala tuples.
  */
object PyFacade {

  /** `VectorDB(path, dims, m, ef_construction)`: a `.bin` path opens
    * through the packed-f32 binary source (the reference's mmap
    * format, divisibility-checked per file); anything else opens as
    * parquet. */
  def open(spark: SparkSession, path: String, dims: Int, m: Int,
      efConstruction: Int): VectorDB = {
    val params = HnswParams(m, efConstruction)
    if (path.endsWith(".bin"))
      VectorDB.fromDataFrame(BinaryVectorSource.read(spark, path, dims), dims, params)
    else VectorDB.open(spark, path, dims, params)
  }

  /** `db.build_index(start_id, end_id)` (ref `src/lib.rs:336-341`):
    * id-hash partitioning into `numParts` cells. */
  def buildIndexRange(db: VectorDB, startId: Long, endId: Long,
      numParts: Int): Unit = {
    db.buildIndex(startId, endId, numParts)
    ()
  }

  /** Trained-IVF build (the serving configuration the Scala gates
    * use): `metric` is "l2", "cosine" or "dot". */
  def buildIndexIvf(db: VectorDB, numCells: Int, iters: Int,
      metric: String): Unit = {
    db.buildIndexIvf(numCells, iters, metric)
    ()
  }

  /** Serving knobs. `adaptiveAlpha <= 0` is the documented "disabled"
    * sentinel; `>= 1` enables adaptive probing. A value in (0, 1) —
    * a plausible misreading of the knob as a fraction — would
    * silently configure fixed-nprobe serving, so it raises instead. */
  def configure(db: VectorDB, nprobe: Int, efSearch: Int,
      adaptiveAlpha: Double): Unit = {
    require(adaptiveAlpha <= 0.0 || adaptiveAlpha >= 1.0,
      s"adaptive_alpha must be <= 0 (disabled) or >= 1 (the probe " +
        s"cost-growth bound), got $adaptiveAlpha — a fraction in (0, 1) " +
        "is not a valid setting")
    db.nprobe = nprobe
    db.efSearch = efSearch
    db.adaptiveAlpha = if (adaptiveAlpha >= 1.0) Some(adaptiveAlpha) else None
  }

  /** Centroid-graph routing knob ([[VectorDB.graphRouteEf]] — the
    * sublinear coarse-quantizer walk for handles with many cells):
    * `ef > 0` enables at that beam width, `<= 0` restores flat
    * routing. Separate method (not a `configure` parameter) so
    * existing callers keep their arity — the py4j constraint. */
  def configureGraphRoute(db: VectorDB, ef: Int): Unit = {
    db.graphRouteEf = ef
    ()
  }

  /** Point-result holder: parallel (ids, dists), ascending by
    * (dist, id) — py4j exposes the vals as zero-arg methods. */
  final class SearchResult(val ids: Array[Long], val dists: Array[Double])

  /** `db.search(query, k)` (ref `src/lib.rs:344-348`): the in-process
    * point-query arm ([[VectorDB.searchLocal]] — zero Spark jobs
    * warm, the reference's sub-millisecond serving shape), falling
    * back to the distributed path for ineligible configurations. */
  def search(db: VectorDB, query: java.util.List[java.lang.Double],
      k: Int): SearchResult = {
    val q = toFloats(query)
    val hits = db.searchLocal(q, k)
    new SearchResult(hits.map(_._1).toArray, hits.map(_._2).toArray)
  }

  /** [[search]] over a little-endian packed-f32 query (the wrapper's
    * hot path: ONE byte-array py4j transfer instead of a boxed
    * per-element list — cuts the gateway marshalling that dominates
    * warm point-query latency). */
  def searchPacked(db: VectorDB, query: Array[Byte], k: Int): SearchResult = {
    require(query.length % 4 == 0,
      s"packed query must be float32-aligned, got ${query.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(query)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val q = new Array[Float](query.length / 4)
    var i = 0
    while (i < q.length) { q(i) = buf.getFloat(); i += 1 }
    val hits = db.searchLocal(q.toSeq, k)
    new SearchResult(hits.map(_._1).toArray, hits.map(_._2).toArray)
  }

  /** The distributed serving arm as a DataFrame — the PySpark-native
    * surface (wrap with `pyspark.sql.DataFrame(jdf, spark)`). */
  def searchDf(db: VectorDB, query: java.util.List[java.lang.Double],
      k: Int): DataFrame =
    db.search(toFloats(query), k)

  /** `db.len()` (ref `src/lib.rs:350-352`). */
  def length(db: VectorDB): Long = db.len

  /** Persist / reload the full serving state. */
  def save(db: VectorDB, path: String): Unit = db.save(path)
  def load(spark: SparkSession, path: String): VectorDB =
    VectorDB.load(spark, path)

  /** Compressed serving builds — the quantized modes through the
    * Python surface (PQ = product-quantized codes, SQ = int8, BQ =
    * 1-bit sign patterns; `metric` as in [[buildIndexIvf]]). Point
    * queries on compressed handles serve through the driver-local ADC
    * arm (zero Spark jobs warm — the bit-exact kernel mirrors). */
  def buildIndexPq(db: VectorDB, numCells: Int, routerIters: Int,
      numSub: Int, codebookK: Int, pqIters: Int, metric: String): Unit = {
    db.buildIndexPq(numCells, routerIters, numSub, codebookK, pqIters,
      metric = metric)
    ()
  }
  def buildIndexSq(db: VectorDB, numCells: Int, routerIters: Int,
      metric: String): Unit = {
    db.buildIndexSq(numCells, routerIters, metric = metric)
    ()
  }
  def buildIndexBq(db: VectorDB, numCells: Int, routerIters: Int,
      metric: String): Unit = {
    db.buildIndexBq(numCells, routerIters, metric = metric)
    ()
  }

  /** Corpus-global shared training from the Python driver — the
    * missing arm of the 100 TB orchestration story (VERDICT r16 item
    * #2): `train once → buildIndexShared per shard (each in its own
    * job) → mergeAllWith` could previously only be driven from Scala.
    * Trains over `corpus`'s vector table (open a handle on the union
    * corpus, or on a sample — the [[graft.index.SharedTraining.train]]
    * sample contract applies, including the dot norm-bound rule).
    * `normBoundSq <= 0` is the "compute the full-pass bound" sentinel
    * (py4j cannot pass Option). The returned artifact is an opaque
    * py4j handle; [[sharedFingerprint]] reads its identity string. */
  def sharedTrain(corpus: VectorDB, mode: String, metric: String,
      numCells: Int, routerIters: Int, numSub: Int, codebookK: Int,
      pqIters: Int, normBoundSq: Double): graft.index.SharedTraining =
    graft.index.SharedTraining.train(corpus.vectors, corpus.dims, mode,
      metric, numCells, routerIters, numSub, codebookK, pqIters,
      if (normBoundSq > 0) Some(normBoundSq) else None,
      corpus.idCol, corpus.vecCol)

  /** Map-only shard encode against a shared artifact
    * ([[VectorDB.buildIndexShared]]): the per-shard step of the
    * parallel build — no training job; the only aggregate is the dot
    * arm's loud norm-bound re-check. */
  def buildIndexShared(db: VectorDB, t: graft.index.SharedTraining): Unit = {
    db.buildIndexShared(t)
    ()
  }

  /** The artifact's content fingerprint (SHA-256) — what the merge
    * gate compares; a Python driver logs/persists this string to
    * verify every shard encoded against the SAME training. */
  def sharedFingerprint(t: graft.index.SharedTraining): String = t.fingerprint

  /** Post-split artifact re-derivation ([[VectorDB.reshare]]): mint a
    * v2 artifact from a split handle's current router + carried global
    * codebooks/bounds so LATE shards can encode and merge in. */
  def reshare(db: VectorDB): graft.index.SharedTraining = db.reshare()

  /** Compressed cell split ([[VectorDB.splitCells]] — the post-merge-
    * chain maintenance a fixed shared router needs). Returns the
    * derived handle. */
  def splitCells(db: VectorDB, maxCellSize: Int): VectorDB =
    db.splitCells(maxCellSize)

  /** N-way shard merge ([[graft.VectorDB.mergeAllWith]] — the Python
    * orchestration shape of the 100 TB parallel build: each shard's
    * handle built/saved in its own job, loaded and merged from the
    * driver script; unsound merges — duplicate ids, metric/param
    * mismatches, shard-local compressed or dot training — fail loudly
    * with the Scala arm's exact messages). */
  def mergeAllWith(db: VectorDB, others: java.util.List[VectorDB]): VectorDB = {
    import scala.jdk.CollectionConverters._
    db.mergeAllWith(others.asScala.toSeq)
  }

  /** Rendezvous shard routing, point arm
    * ([[graft.operators.Layout.hrwRouteLocal]] — identical weights and
    * tie-break to the distributed column arm, zero Spark jobs): route
    * one key string over a shard list. */
  def hrwRoute(key: String, shards: java.util.List[String]): String = {
    import scala.jdk.CollectionConverters._
    graft.operators.Layout.hrwRouteLocal(key, shards.asScala.toSeq)
  }

  /** Fuzzy-linkage candidate screen, point arm
    * ([[graft.operators.Linkage.distanceLocal]]): exact edit distance
    * when ≤ maxDist, −1 past the threshold — the same semantics the
    * distributed pair stage filters on. */
  def fuzzyDistance(a: String, b: String, maxDist: Int): Int =
    graft.operators.Linkage.distanceLocal(a, b, maxDist)

  /** Perceptual image fingerprint, point arm
    * ([[graft.multimodal.Multimodal.dHashPpm]] — the same integer
    * BT.601 gradient-sign hash the distributed dHashMedia stage
    * computes, zero Spark jobs): fingerprint one P6 PPM payload
    * client-side before deciding whether to ship it. */
  def dhashPpm(content: Array[Byte]): Long =
    graft.multimodal.Multimodal.dHashPpm(content)

  /** Secret-screen result holder: parallel (tokens, entropies) in
    * first-occurrence order. */
  final class SecretResult(val tokens: Array[String],
      val entropies: Array[Double])

  /** High-entropy secret screen, point arm
    * ([[graft.operators.Curation.secretScanLocal]] — identical shape
    * prefilter + integer-exact entropy verdict as the distributed
    * scan, zero Spark jobs): screen one document at admission time. */
  def secretScan(text: String, minLen: Int, minEntropy: Double): SecretResult = {
    val hits = graft.operators.Curation.secretScanLocal(text, minLen, minEntropy)
    new SecretResult(hits.map(_._1).toArray, hits.map(_._2).toArray)
  }

  /** Secret redaction, point arm
    * ([[graft.operators.Curation.redactSecretsLocal]]): rewrite one
    * document's flagged fragments to `<SECRET>` before it ships. */
  def redactSecrets(text: String, minLen: Int, minEntropy: Double): String =
    graft.operators.Curation.redactSecretsLocal(text, minLen, minEntropy)

  /** WordPiece encode, point arm
    * ([[graft.operators.WordPiece.encodeLocal]] — the same spaced-form
    * + replace-chain + `##` presentation as the distributed encode):
    * `merges` is the learned table as [left, right] pairs in order. */
  def wordpieceEncode(text: String,
      merges: java.util.List[java.util.List[String]]): java.util.List[String] = {
    import scala.jdk.CollectionConverters._
    val m = merges.asScala.toSeq.map { p =>
      require(p.size() == 2, s"each merge must be a [left, right] pair, got $p")
      (p.get(0), p.get(1))
    }
    graft.operators.WordPiece.encodeLocal(text, m).asJava
  }

  /** WordPiece decode, point arm
    * ([[graft.operators.WordPiece.decodeLocal]] — the exact inverse of
    * the `##` presentation: detokenize one word's piece sequence). */
  def wordpieceDecode(pieces: java.util.List[String]): String = {
    import scala.jdk.CollectionConverters._
    graft.operators.WordPiece.decodeLocal(pieces.asScala.toSeq)
  }

  /** Unigram-LM encode, point arm
    * ([[graft.operators.UnigramLm.encodeLocal]] — the EXACT Viterbi
    * routine the distributed segmentCensus broadcasts): `model` maps
    * piece → integer lp_units. */
  def unigramEncode(word: String,
      model: java.util.Map[String, java.lang.Number]): java.util.List[String] = {
    import scala.jdk.CollectionConverters._
    // py4j boxes small Python ints as Integer and large ones as Long —
    // accept any Number rather than forcing the caller to care
    val m = model.asScala.map { case (k, v) => k -> v.longValue() }
    graft.operators.UnigramLm.encodeLocal(word, m).asJava
  }

  private def toFloats(query: java.util.List[java.lang.Double]): Seq[Float] = {
    val out = new Array[Float](query.size())
    var i = 0
    while (i < out.length) { out(i) = query.get(i).floatValue(); i += 1 }
    out.toSeq
  }
}
