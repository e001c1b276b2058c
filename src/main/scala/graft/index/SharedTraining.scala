package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dotNative, l2Normalize}
import graft.operators.Knn

/** Corpus-global compressed-serving training artifact — the piece that
  * makes PQ/SQ/BQ/OPQ and dot (MIPS) handles SHARD-BUILDABLE AND
  * MERGEABLE. `VectorDB.buildIndexPq`-style builders train their
  * router/codebooks/bounds/max-norm from the handle's own corpus, so
  * two shards each bake shard-local geometry into their stored state
  * and `mergeWith` must reject (two codebooks cannot reconcile without
  * re-encoding). The 100 TB build path splits TRAINING from ENCODING:
  *
  *   1. `SharedTraining.train(unionCorpus | sample, …)` — ONE training
  *      pass (or a documented sample contract) produces every
  *      corpus-global artifact: the IVF router, PQ codebooks / SQ
  *      bounds / OPQ permutation for the compressed modes, and the
  *      MIPS max-norm for the dot metric.
  *   2. each shard runs `VectorDB.buildIndexShared(t)` — a map-only
  *      encode of the shard against the SHARED artifacts (no training
  *      job; the only aggregate is the dot arm's loud norm-bound
  *      check).
  *   3. `shard0.mergeWith(shard1)` — allowed when both sides carry the
  *      SAME artifact ([[fingerprint]]-checked): compressed codes
  *      tables union directly (cell ids are global — both sides routed
  *      through the same centroids), HNSW layouts merge via
  *      [[HnswIndex.merge]].
  *
  * Because encode and cell assignment are deterministic per-row maps
  * of the shared artifact, a merged handle's serving state contains
  * exactly the rows a single `buildIndexShared` over the union corpus
  * would produce — merged search ≡ single-build search, which is what
  * the q_vectordb_pq_merged / q_vectordb_dot_merged oracles and
  * CompressedServingSpec pin.
  *
  * The artifact is O(k·d + M·K·d/M + d) doubles — driver-resident,
  * shipped to shards as a plain object (at 100 TB: broadcast file /
  * artifact store), never corpus-sized.
  *
  * SAMPLE-TRAINING CONTRACT (dot metric): codebooks/bounds trained on
  * a sample only degrade quantization quality, but a sampled MAX-NORM
  * is a correctness hazard — any corpus vector with ‖x‖² above it
  * would clamp in the augmentation and silently lose recall. Train on
  * the union corpus, or pass `normBoundSq` with a true upper bound;
  * `buildIndexShared` re-checks the bound per shard and fails loudly.
  *
  * (Extension: the reference is single-process and stores raw f32 only
  * — `/root/reference/src/disk_store.rs:7-11`; sharded builds and
  * quantization have no analog there.)
  */
final case class SharedTraining(
    metric: String,
    mode: String,
    dims: Int,
    width: Int,
    router: IvfIndex.Model,
    pqModel: Option[ProductQuantizer.Model],
    sqBounds: Option[(Seq[Double], Seq[Double])],
    opqPerm: Option[Array[Int]],
    mipsMaxNormSq: Option[Double]) {

  /** Content fingerprint (SHA-256 over the canonical bit-exact
    * serialization of every artifact component) — the merge-compat
    * check: two handles merge iff their artifacts fingerprint equal.
    * Pure function of content, so a shard saved and reloaded
    * re-derives the identical fingerprint (doubles round-trip parquet
    * bit-exactly). */
  lazy val fingerprint: String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val buf = java.nio.ByteBuffer.allocate(8)
    def putLong(l: Long): Unit = {
      buf.clear(); buf.putLong(l); md.update(buf.array())
    }
    def putD(d: Double): Unit = putLong(java.lang.Double.doubleToLongBits(d))
    def putStr(s: String): Unit = {
      md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(0.toByte)
    }
    putStr(metric); putStr(mode); putLong(dims.toLong); putLong(width.toLong)
    putLong(router.centroids.length.toLong)
    router.centroids.foreach { cv => putLong(cv.length.toLong); cv.foreach(putD) }
    router.cellIds.foreach(c => putLong(c.toLong))
    pqModel.foreach { m =>
      putStr("pq"); putLong(m.numSub.toLong); putLong(m.subDim.toLong)
      m.codebooks.foreach(_.foreach { cw => putLong(cw.length.toLong); cw.foreach(putD) })
    }
    sqBounds.foreach { case (lo, hi) =>
      putStr("sq"); putLong(lo.length.toLong); lo.foreach(putD); hi.foreach(putD)
    }
    opqPerm.foreach { p => putStr("opq"); p.foreach(i => putLong(i.toLong)) }
    mipsMaxNormSq.foreach { m2 => putStr("m2"); putD(m2) }
    md.digest().map(b => f"$b%02x").mkString
  }
}

object SharedTraining {

  /** The serving modes an artifact can target. */
  val Modes: Set[String] = Set("ivf", "pq", "opq", "sq", "bq")

  /** The MIPS→L2 augmentation (shared with `VectorDB`): extend `v`
    * with sqrt(M² − ‖v‖²) so L2 ranking on the augmented corpus equals
    * dot ranking against the 0-extended query. The clamp only absorbs
    * float rounding at ‖v‖ ≈ M — over-norm vectors must be rejected
    * upstream (they would carry a real penalty, not noise). */
  private[graft] def mipsAugment(v: Column, maxNormSq: Double): Column =
    concat(v.cast("array<float>"),
      array(sqrt(greatest(lit(0.0d), lit(maxNormSq) - dotNative(v, v))).cast("float")))

  /** Zero-pad a `from`-wide vector column to `width` (PQ subspace
    * divisibility; zero pads are metric-neutral — queries pad too). */
  private[graft] def zeroPad(v: Column, width: Int, from: Int): Column =
    if (width == from) v else concat(v, array_repeat(lit(0.0f), width - from))

  /** Encoded width for a (mode, metric) pair: the dot reduction adds
    * one augmentation dim; PQ subspaces must divide the width. */
  private[graft] def servingWidth(mode: String, metric: String,
      dims: Int, numSub: Int): Int = {
    val usesPq = mode == "pq" || mode == "opq"
    metric match {
      case Knn.Dot if usesPq => ((dims + 1 + numSub - 1) / numSub) * numSub
      case Knn.Dot           => dims + 1
      case _ if usesPq =>
        require(dims % numSub == 0, s"numSub=$numSub must divide dims=$dims")
        dims
      case _ => dims
    }
  }

  /** ONE training pass over `corpus` (the union corpus, or a sample —
    * see the class doc's sample contract) producing every corpus-global
    * artifact `mode` needs under `metric`. The training math is
    * IDENTICAL to the corresponding `VectorDB.buildIndex*` stanza, so
    * an artifact trained on the full corpus reproduces a direct build
    * bit-for-bit (the merged ≡ single-build anchor).
    *
    * `normBoundSq` (dot metric only): a caller-supplied upper bound on
    * the corpus squared norm, for sample training where the sample max
    * would under-estimate it. Must dominate every shard's true max —
    * `buildIndexShared` re-checks loudly. */
  def train(corpus: DataFrame, dims: Int, mode: String, metric: String,
      numCells: Int = 16, routerIters: Int = 1, numSub: Int = 8,
      codebookK: Int = 16, pqIters: Int = 0,
      normBoundSq: Option[Double] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): SharedTraining = {
    require(Modes(mode), s"unknown mode '$mode' (one of ${Modes.mkString(", ")})")
    val usesPq = mode == "pq" || mode == "opq"
    val width = servingWidth(mode, metric, dims, numSub)
    var m2: Option[Double] = None
    val reduced0 = metric match {
      case Knn.Cosine => corpus.withColumn(vecCol, l2Normalize(col(vecCol)))
      case Knn.Dot =>
        val bound = normBoundSq.getOrElse {
          val row = corpus.agg(max(dotNative(col(vecCol), col(vecCol)))).head()
          if (row.isNullAt(0)) 0.0 else row.getDouble(0)
        }
        m2 = Some(bound)
        corpus.withColumn(vecCol,
          zeroPad(mipsAugment(col(vecCol), bound), width, dims + 1))
      case _ => corpus
    }
    val perm =
      if (mode == "opq")
        Some(Opq.energyBalancedPerm(reduced0, col(vecCol), width, numSub))
      else None
    val reduced = perm
      .map(p => reduced0.withColumn(vecCol, Opq.permuteExpr(col(vecCol), p)))
      .getOrElse(reduced0)
    val router = IvfIndex.train(reduced, numCells, routerIters, idCol, vecCol)
    val pq =
      if (usesPq)
        Some(ProductQuantizer.train(reduced, numSub, codebookK, pqIters, idCol, vecCol))
      else None
    val sq =
      if (mode == "sq") Some(ScalarQuantizer.bounds(ScalarQuantizer.train(reduced, vecCol)))
      else None
    SharedTraining(metric, mode, dims, width, router, pq, sq, perm, m2)
  }
}
