package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: deterministic splits, stratified
  * sampling, token-budget sharding, and benchmark decontamination
  * (north-star extensions; the reference has no corpus-pipeline
  * surface — its data model stops at vectors, `/root/reference/src/lib.rs:55-60`).
  *
  * Everything is hash- or prefix-sum-deterministic: re-running a
  * pipeline over a grown corpus keeps every previously-assigned
  * decision stable (split membership, sample membership), which is
  * what makes incremental 100 TB curation reproducible — and every
  * stage is plain integer arithmetic, expressible in the DuckDB
  * oracle. */
object Curation {

  val HashMod = 4294967296L // 2^32

  /** Knuth multiplicative remix of an id column into [0, buckets):
    * splits/samples derive from the ID alone, so membership is stable
    * under corpus growth and independent of row order or partitioning.
    * `mult`/`add` pick independent hash families (the same constants
    * as the SimHash word remixes) so e.g. the split decision and the
    * sampling decision are uncorrelated. */
  def hashBucket(id: Column, buckets: Long,
      mult: Long = 2654435761L, add: Long = 0L): Column =
    pmod(pmod(id * lit(mult) + lit(add), lit(HashMod)), lit(buckets))

  /** Deterministic per-epoch training order: sort key =
    * remix(id, epoch-dependent constants) — every epoch is a fresh
    * pseudo-random permutation, yet any rerun (or a recovered
    * executor recomputing its split) reproduces the identical order
    * with ZERO shuffle-state: the permutation is a pure function of
    * (id, epoch), not of an RNG stream. Epochs decorrelate through
    * the odd-multiplier family (epoch folds into both the multiplier
    * selection and the additive term). Ties cannot exist for distinct
    * ids at the same epoch UNLESS two ids collide mod 2³² after the
    * remix — the id itself breaks them, keeping the order total.
    * Ids must be NON-NEGATIVE (the oracle's `%` keeps the sign where
    * Spark's pmod wraps — the whole id-hash family shares this
    * contract) and below ~2³¹ for checked-BIGINT oracle replay.
    * Returns the rows with an `epoch_key` column; materialize with
    * `repartitionByRange(epoch_key) + sortWithinPartitions` for the
    * write-side layout (the [[Layout.clusterByZ]] shape). */
  def epochShuffleKey(id: Column, epoch: Int): Column = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    // distinct odd multiplier per epoch (Knuth family + 2·epoch·step
    // stays odd); additive term shifts by a large odd stride
    val mult = 2654435761L + 2L * (epoch % 1024) * 40503L
    val add = 987654321L + epoch.toLong * 2246822519L
    pmod(id * lit(mult) + lit(add), lit(HashMod))
  }

  /** The same epoch key as DuckDB SQL over `idExpr` — ONE generator
    * for both engines (the shared-fragment rule). */
  def epochShuffleKeySql(idExpr: String, epoch: Int): String = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val mult = 2654435761L + 2L * (epoch % 1024) * 40503L
    val add = 987654321L + epoch.toLong * 2246822519L
    s"((($idExpr) * $mult + $add) % 4294967296)"
  }

  /** Deterministic train/val/test assignment by id hash: ~trainPct%
    * train, ~valPct% val, remainder test. A map-only pass — no
    * shuffle, no RNG state, no sampling job. */
  def splitAssign(df: DataFrame, idCol: String = "doc_id",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "need 0 < trainPct, 0 <= valPct, trainPct + valPct < 100")
    val b = hashBucket(col(idCol), 100L)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Stratified downsampling: keep a row iff its id hash falls under
    * the stratum's rate (in basis points of 10 000). The id decides —
    * membership is stable as the corpus grows, and the pass is
    * map-only (rates ride as a literal CASE). Use an `add` offset
    * distinct from [[splitAssign]]'s family so sampling is
    * uncorrelated with splitting. */
  def stratifiedSample(df: DataFrame, rateBps: Column,
      idCol: String = "doc_id"): DataFrame =
    df.filter(hashBucket(col(idCol), 10000L, mult = 2246822519L, add = 12345L) < rateBps)

  /** Global token-stream offsets in id order: for each doc, the count
    * of tokens in all earlier docs (`start`), so doc `d` occupies the
    * half-open token span [start, start + toks).
    *
    * Distributed prefix sum, NOT a single global window (a global
    * `ORDER BY` window serializes onto one task at 100 TB): split the
    * id range into buckets, local cumsum per bucket (parallel
    * windows), collect only the O(#buckets) per-bucket totals to the
    * driver, and broadcast their prefix offsets back.
    *
    * Buckets come from id boundaries frozen as plan literals (an
    * approx_percentile collected once on the driver), NOT from
    * `repartitionByRange` + `spark_partition_id`: the range
    * partitioner re-SAMPLES on every action, so partition identity
    * there only holds while a persist pins it — cache loss under
    * executor failure would silently misalign the offsets. A literal
    * boundary makes every pass (and any recompute) bucket each row
    * identically, with nothing cached: two corpus scans total, which
    * at 100 TB beats pinning the corpus projection in memory. Skewed
    * boundaries only unbalance the parallel windows, never the
    * assignment. */
  private def globalTokenStarts(df: DataFrame, tokCol: Column,
      idCol: String, partitions: Int): DataFrame = {
    val base = df.select(col(idCol).as("id"), tokCol.cast("long").as("toks"))
    val bounds: Seq[Long] =
      if (partitions <= 1) Seq.empty
      else {
        val qs = (1 until partitions).map(i => i.toDouble / partitions)
        // approx_percentile over ZERO rows yields NULL, not an empty
        // array — guard so an empty corpus shards to an empty result
        // instead of an NPE
        val row = base.agg(expr(
            s"approx_percentile(id, array(${qs.mkString(",")}), 10000)"))
          .head()
        if (row.isNullAt(0)) Seq.empty else row.getSeq[Long](0).distinct
      }
    // bucket(id) = #boundaries strictly below id — row-local over the
    // literal boundary array
    val bucket =
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.map(lit(_)): _*), b => b < col("id")))
    val withB = base.withColumn("pid", bucket)
    val totals = withB.groupBy("pid").agg(sum("toks").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // dense offset table indexed by pid (pids are 0..#bounds by
    // construction; empty buckets contribute 0) — an O(1)-depth array
    // lookup per row, where a when-chain would stack #buckets deep and
    // fall out of codegen at high partition counts
    val dense = Array.tabulate(bounds.size + 1)(p => totals.getOrElse(p, 0L))
    val offsets = dense.scanLeft(0L)(_ + _).dropRight(1)
    val offExpr = element_at(array(offsets.map(lit(_)): _*), col("pid") + 1)
    val localBefore = sum(col("toks")).over(
      Window.partitionBy("pid").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1))
    withB.withColumn("start", coalesce(localBefore, lit(0L)) + offExpr)
  }

  /** Shard a corpus into contiguous ~`budgetTokens`-token shards in id
    * order (the layout step before sequence packing / shard-parallel
    * tokenization). Shard of a doc = floor(tokens-before-it / budget),
    * via the distributed prefix sum ([[globalTokenStarts]]). */
  def tokenShards(df: DataFrame, budgetTokens: Long, tokCol: Column,
      idCol: String = "doc_id", partitions: Int = 32): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    // shard ids stay BIGINT: an int wraps at ~4e12 corpus tokens
    // (budget 2000), inside the 100 TB design envelope
    globalTokenStarts(df, tokCol, idCol, partitions)
      .withColumn("shard", floor(col("start") / budgetTokens))
      .select(col("id").as(idCol), col("toks"), col("shard"))
  }

  /** Pack the corpus token stream into fixed-length training sequences
    * (GPT-style concat-and-chunk): the global stream in id order is cut
    * every `seqLen` tokens, and each doc maps to every sequence its
    * span [start, start + toks) overlaps, with the overlapping token
    * count. Output: one row per (doc, sequence) incidence —
    * (idCol, toks, seq, n_tok_in_seq).
    *
    * Built on the same distributed prefix sum as [[tokenShards]]; the
    * explode fans each doc out to ceil(toks / seqLen) + 1 rows at most,
    * so the pass stays linear in corpus tokens. Zero-token docs are
    * dropped (they occupy no span). */
  def packSequences(df: DataFrame, seqLen: Long, tokCol: Column,
      idCol: String = "doc_id", partitions: Int = 32): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val L = lit(seqLen)
    // sequence ids stay BIGINT: at seqLen=512 an int wraps at ~1.1e12
    // corpus tokens — a few TB of text, far under the design envelope
    globalTokenStarts(df, tokCol, idCol, partitions)
      .filter(col("toks") > 0L)
      .withColumn("seq",
        explode(sequence(
          floor(col("start") / L).cast("long"),
          floor((col("start") + col("toks") - 1L) / L).cast("long"))))
      .withColumn("n_tok_in_seq",
        least(col("start") + col("toks"), (col("seq") + 1L) * L) -
          greatest(col("start"), col("seq") * L))
      .select(col("id").as(idCol), col("toks"), col("seq"),
        col("n_tok_in_seq"))
  }

  /** Fixed-size character-window chunking with overlap — the RAG /
    * pretraining document-windowing primitive, provenance-preserving
    * (each chunk carries its 1-based start offset) and distinct from
    * [[packSequences]]' cross-document token packing. Map-only: one
    * explode of a per-row generated range — no shuffle, no RNG, so
    * the chunk set is deterministic at any parallelism and output
    * volume is corpus-chars/stride at any scale. Chunks start every
    * `size − overlap` characters; the last chunk of a document may be
    * short (never empty); empty documents emit nothing. */
  def chunkDocs(df: DataFrame, size: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need 0 <= overlap < size")
    val stride = size - overlap
    df.select(col(idCol), col(textCol))
      .filter(length(col(textCol)) > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          floor((length(col(textCol)) - 1) / stride).cast("int"))))
      .withColumn("start_pos", col("chunk_idx").cast("long") * stride + 1L)
      .select(
        col(idCol),
        col("chunk_idx").cast("int").as("chunk_idx"),
        col("start_pos"),
        col(textCol).substr(col("start_pos").cast("int"), lit(size)).as("chunk"))
  }

  /** Content-defined chunking (Manber '94 fingerprint cut points — the
    * rsync/LBFS family): cut after every position whose last-`w`-chars
    * rolling hash is ≡ 0 (mod `modulus`). Because a cut decision
    * depends only on a local w-char window, an INSERTION re-
    * synchronizes the chunk stream within one window — downstream
    * chunk-hash dedup still matches everything past the edit, where
    * fixed-width chunking ([[chunkDocs]]) shifts every later boundary
    * and matches nothing (CurationSpec measures exactly this).
    * Expected chunk length = `modulus` chars.
    *
    * Deliberate deviation from FastCDC-style min/max chunk bounds:
    * those make each cut depend on the PREVIOUS cut (sequential
    * state), which is neither SQL-replayable nor parallel; the pure
    * position-local cut set is the original Manber construction and
    * keeps every stage an independent per-position decision.
    *
    * Scale + determinism shape: map-only — one expression chain per
    * row (native [[graft.functions.expressions.CdcCuts]] codegen loop
    * for the per-position window hashes → cut positions → chunk
    * explode), no shuffle at any corpus size; all arithmetic is exact
    * integer mod 1e9+7 over character codes (the
    * [[graft.functions.TextFunctions.fingerprint]] conventions), so
    * every boundary replays bit-for-bit in SQL. The HOF form of the
    * window hash (transform(sequence) + aggregate(slice)) measured
    * 4.4 s at sf0.1 from interpreted lambda dispatch per
    * (position × window) element; the compiled loop runs the
    * identical O(n·w) arithmetic in one codegen pass. */
  def cdcChunks(df: DataFrame, w: Int = 16, modulus: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(w >= 2, s"window must be >= 2 chars, got $w")
    require(modulus >= 2, s"modulus must be >= 2, got $modulus")
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    val cutsAt = toCol(graft.functions.expressions.CdcCuts(
      toExpr(col(textCol)), w, modulus))
    df.select(col(idCol), col(textCol))
      .filter(length(col(textCol)) > 0)
      // cut positions, padded with the document end (a trailing cut at
      // exactly n must not produce an empty final chunk — dedup it)
      .withColumn("__cuts",
        array_distinct(concat(cutsAt,
          array(length(col(textCol)).cast("long")))))
      .withColumn("__c",
        explode(transform(sequence(lit(1), size(col("__cuts"))), j => {
          // element_at rejects index 0 (unlike SQL's NULL), so the
          // first chunk's predecessor cut is an explicit literal 0
          val prev = when(j === 1, lit(0L))
            .otherwise(element_at(col("__cuts"), (j - lit(1)).cast("int")))
          struct(
            j.cast("int").as("ord"),
            (prev + 1L).as("start"),
            (element_at(col("__cuts"), j.cast("int")) - prev).as("len"))
        })))
      .select(
        col(idCol),
        col("__c.ord").as("chunk_ord"),
        col("__c.start").as("start"),
        col("__c.len").as("len"),
        col(textCol).substr(col("__c.start").cast("int"), col("__c.len").cast("int")).as("chunk"))
      .withColumn("chunk_md5", md5(col("chunk").cast("binary")))
  }

  /** Deterministic weighted upsampling (data-mixing repetition): emit
    * `copiesCol` copies of each row, tagged 1..n in `copy`. The
    * mixture-weight stage of a training-data pipeline — map-only
    * (explode of a generated range), no RNG, so the exact multiset is
    * reproducible at any parallelism. Rows with copies < 1 drop
    * (filtered BEFORE the explode: sequence(1, 0) would descend). */
  def upsample(df: DataFrame, copiesCol: Column): DataFrame = {
    require(!df.columns.contains("copy"),
      "upsample adds a 'copy' column; the input already has one — rename it first")
    val n = copiesCol.cast("int")
    df.filter(n >= 1).withColumn("copy", explode(sequence(lit(1), n)))
  }

  /** FRACTIONAL upsampling — the temperature-mixing stage (a source
    * weighted 1.7× emits every row once, plus a second copy for a
    * deterministic 70% of ids): `floor(w)` guaranteed copies, one more
    * iff the row's id hash falls under the fractional remainder (in
    * basis points, the [[stratifiedSample]] convention — and a THIRD
    * hash family, so the extra-copy decision is uncorrelated with
    * split and sample membership). Map-only, no RNG: the exact output
    * multiset is reproducible at any parallelism, and expected
    * multiplicity equals the weight for every row. Weights < 1
    * downsample (0 guaranteed copies, kept with probability w). */
  def upsampleFractional(df: DataFrame, weightBps: Column,
      idCol: String = "doc_id"): DataFrame = {
    require(!df.columns.contains("copy"),
      "upsampleFractional adds a 'copy' column; the input already has one — rename it first")
    val whole = (weightBps.cast("long") / 10000L).cast("int")
    val fracBps = pmod(weightBps.cast("long"), lit(10000L))
    val extra = (hashBucket(col(idCol), 10000L, mult = 3266489917L, add = 374761393L)
      < fracBps).cast("int")
    val n = whole + extra
    df.withColumn("__n", n).filter(col("__n") >= 1)
      .withColumn("copy", explode(sequence(lit(1), col("__n"))))
      .drop("__n")
  }

  /** Per-domain quota cap: keep at most `cap` rows per domain, best
    * score first (ties to the lowest id) — the corpus-balancing stage
    * that stops one crawl domain from dominating the training mix.
    *
    * Implemented as the bounded-heap [[graft.operators.TopK]]
    * aggregate, NOT a ranking window: a window sorts each domain
    * inside a single task (one hot domain serializes the job at
    * 100 TB), while the heap runs map-side partial top-`cap` per
    * input partition and shuffles O(#domains · cap) rows.
    *
    * Rows whose score is NULL or NaN are EXCLUDED (a quality scorer
    * emits NaN on degenerate input, e.g. 0/0 ratios): NaN is outside
    * the heap comparator's total order, so admitting it would make
    * the kept set depend on partition arrival order — the exclusion
    * is the deterministic contract, mirrored by the oracle. */
  def domainCap(df: DataFrame, cap: Int, scoreCol: Column,
      domainCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(cap >= 1, "cap must be at least 1")
    val topk = graft.operators.TopK.topK(cap)
    df.filter(scoreCol.isNotNull && !isnan(scoreCol))
      .select(col(domainCol).as("domain"),
        (-scoreCol).cast("double").as("__neg"), col(idCol).cast("long").as("__id"))
      .groupBy("domain")
      .agg(topk(col("__neg"), col("__id")).as("hits"))
      .select(col("domain"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(
        col("domain"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("hit._2").as(idCol),
        (-col("hit._1")).as("score"))
  }

  /** Token-budget WATERFILLING across sources — the mixture-
    * rebalancing decision a pipeline makes when the training budget is
    * smaller than the crawl: small sources keep everything, large
    * sources are capped at ONE common level C chosen so the total
    * lands on the budget (the proportional-with-cap rule; waterfilling
    * because raising the water level C fills small sources completely
    * before large ones grow). Budget = `total · budgetNum / budgetDen`
    * in INTEGER arithmetic, and the cap search is integer too: sources
    * sort by (tokens ASC, key), and at rank i the candidate cap is
    * Cᵢ = (B − prefix₍ᵢ₋₁₎) div (m − i + 1) — the first rank whose own
    * count exceeds its candidate cap is where the water level sits;
    * everything from there on gets exactly that C (Σ alloc ≤ B by
    * construction, every step replayable in the oracle with zero
    * float ops).
    *
    * Scale shape: the ONLY corpus-scale stage is the per-source token
    * aggregate (one map-side-combined shuffle, O(#sources) rows out);
    * the sort, prefix sums, and cap search run on that #sources-row
    * artifact — a window over sources, never over documents — and the
    * 1-row cap broadcasts back onto it. Applying the allocation to
    * rows (sample `allocated/n_tokens` of each capped source) is the
    * existing [[stratifiedSample]]/[[weightedSample]] machinery.
    * Output: `(key, n_tokens, allocated, capped)` per source. */
  def budgetAllocate(df: DataFrame, keyCol: Column, tokCol: Column,
      budgetNum: Long, budgetDen: Long): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0 && budgetNum <= budgetDen,
      s"budget fraction must be in [0, 1]: $budgetNum/$budgetDen")
    val per = df.select(keyCol.as("key"), tokCol.cast("long").as("t"))
      .groupBy("key").agg(sum("t").as("n_tokens"))
    val w = Window.orderBy(col("n_tokens").asc, col("key").asc)
    val ranked = per
      .withColumn("__i", row_number().over(w))
      .withColumn("__pfx", coalesce(sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__m", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__tot", sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__b", expr(s"(__tot * $budgetNum) DIV $budgetDen"))
      .withColumn("__cand", expr("(__b - __pfx) DIV (__m - __i + 1)"))
    val lvl = ranked.filter(col("n_tokens") > col("__cand"))
      .agg(min(struct(col("__i"), col("__cand"))).as("s"))
      .select(col("s.__i").as("__ci"), col("s.__cand").as("__cap"))
    ranked.crossJoin(broadcast(lvl))
      .select(col("key"), col("n_tokens"),
        when(col("__ci").isNull || col("__i") < col("__ci"), col("n_tokens"))
          .otherwise(col("__cap")).as("allocated"),
        (col("__ci").isNotNull && col("__i") >= col("__ci")).as("capped"))
  }

  /** Hash-bucketed negative sampling — the contrastive-training
    * primitive ("for each anchor, k pseudo-random negatives from a
    * different class"), shaped so it NEVER goes all-pairs: candidates
    * hash into `buckets` pools by id, each anchor samples from exactly
    * ONE pool (an independent hash family picks which), so the join
    * fan-out is |corpus|/buckets per anchor by construction — at
    * 100 TB, `buckets` is the knob that sizes the per-anchor pool,
    * and the equi-join on the bucket key shuffles each side once.
    * Selection ranks the pool by a deterministic PAIR hash (anchor
    * remix · 10007 + candidate remix, mod 2³² — every intermediate
    * stays far under the checked-BIGINT range for ids < 2³¹) through
    * the bounded-heap [[TopK]] aggregator: map-side partial top-k,
    * O(#anchors · k) shuffle, no window sort. Same-label candidates
    * are excluded (which also excludes the anchor itself).
    * Output: `(anchor, rank, neg)`, rank 1..k by (pair hash, neg id).
    * Re-running is idempotent — the sample is a pure function of the
    * ids, the [[epochShuffleKey]] replayability contract. */
  def negativeSample(anchors: DataFrame, corpus: DataFrame, k: Int,
      buckets: Long = 16L, idCol: String = "vec_id",
      labelCol: String = "label"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val a = anchors.select(col(idCol).cast("long").as("anchor"),
      col(labelCol).as("__al"),
      hashBucket(col(idCol), buckets, mult = 2246822519L, add = 98765L).as("__b"))
    val c = corpus.select(col(idCol).cast("long").as("__neg"),
      col(labelCol).as("__cl"),
      hashBucket(col(idCol), buckets).as("__b"))
    val pairHash = pmod(
      pmod(col("anchor") * lit(3266489917L) + lit(374761393L), lit(HashMod))
        * lit(10007L)
        + pmod(col("__neg") * lit(2654435761L) + lit(12345L), lit(HashMod)),
      lit(HashMod))
    val topk = graft.operators.TopK.topK(k)
    a.join(c, "__b")
      .filter(col("__al") =!= col("__cl"))
      .groupBy(col("anchor"))
      .agg(topk(pairHash.cast("double"), col("__neg")).as("hits"))
      .select(col("anchor"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("anchor"), (col("pos") + 1).cast("int").as("rank"),
        col("hit._2").as("neg"))
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis,
    * IPL 2006 — the "exponential race"): each row draws the key
    * e = −ln(u)/w with u hash-uniform in (0, 1]; the k SMALLEST keys
    * ARE a weight-proportional sample without replacement. This is
    * the standard distributed weighted sampler — the key is map-only
    * and selection is a bounded top-k, so no global sort, no
    * rejection loop, no sequential pass touches the corpus.
    *
    * Determinism + oracle replay: u comes from the Knuth remix family
    * (`(id·m + a) mod 2³² + 1) / 2³²`), and the ONE ln floors to 6 dp
    * (the PMI convention absorbing cross-engine libm ulps; ties the
    * floor introduces break by id). Weights must be strictly
    * positive — enforced in-plan, a non-positive weight raises at
    * first evaluation rather than silently skewing the race. */
  def sampleKey(id: Column, weight: Column): Column = {
    val u = (graft.operators.Sketches.hashExpr(id) + 1).cast("double") /
      lit(graft.operators.Sketches.HashMod.toDouble)
    val e = -log(u) / weight.cast("double")
    val guarded = when(weight > 0, e).otherwise(raise_error(format_string(
      "weightedSample requires strictly positive weights, got %s at id %s",
      weight.cast("string"), id.cast("string"))))
    floor(guarded * lit(1e6)).cast("double") / lit(1e6)
  }

  /** The k-row weighted sample: `(id, ekey)` rows of the k smallest
    * race keys (TakeOrdered — O(k) per-partition heaps). */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(id.cast("long").as("id"), sampleKey(id, weight).as("ekey"))
      .orderBy(col("ekey"), col("id")).limit(k)
  }

  /** Per-GROUP weighted sampling — "draw k docs per source, weighted
    * by length/quality" (the mixture-construction primitive): the
    * same race key through the bounded-heap TopK aggregator (the
    * [[domainCap]] pattern — map-side partial top-k, O(#groups·k)
    * shuffle; a hot group never serializes a window sort). Output:
    * `(group, rnk, id, ekey)`, rnk 1..k by (ekey, id). */
  def weightedSampleGrouped(df: DataFrame, group: Column, id: Column,
      weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val topk = graft.operators.TopK.topK(k)
    df.select(group.as("grp"), id.cast("long").as("__id"),
        sampleKey(id, weight).as("__ekey"))
      .groupBy("grp")
      .agg(topk(col("__ekey"), col("__id")).as("hits"))
      .select(col("grp"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("grp"), (col("pos") + 1).cast("int").as("rnk"),
        col("hit._2").as("id"), col("hit._1").as("ekey"))
  }

  /** Winsorizing outlier trim: keep rows whose `value` falls inside
    * the EXACT [loQ, hiQ] quantile band — the length/score
    * outlier-removal pass that runs before corpus statistics are
    * trusted (truncated docs, concatenation blowups). Quantile bounds
    * come from [[Profile.exactQuantiles]] (two narrow passes + one
    * bounded fetch — no global sort, no approx summaries), then the
    * trim itself is one map-only filter with the two bounds as plan
    * literals (pushable to the source). Rational quantiles, the same
    * ceil-rank convention — exactly oracle-replayable. */
  def trimOutliers(df: DataFrame, value: Column,
      loQ: (Int, Int) = (1, 100), hiQ: (Int, Int) = (99, 100)): DataFrame = {
    require(loQ._1.toLong * hiQ._2 < hiQ._1.toLong * loQ._2,
      s"loQ ${loQ._1}/${loQ._2} must be below hiQ ${hiQ._1}/${hiQ._2}")
    val bounds = graft.operators.Profile.exactQuantiles(df, value, Seq(loQ, hiQ))
      .collect().map(_.getDouble(1))
    // compare in the COLUMN's native type (the bounds are exact order
    // statistics of the column, so casting them back is lossless for
    // any type whose values round-trip through double — all fixture
    // and practically-profiled types): a `value.cast(double) >= lit`
    // comparison would wrap the scan column in a cast and block
    // parquet pushdown, leaving min/max stats pruning on the floor
    val dt = df.select(value).schema.head.dataType
    df.filter(value >= lit(bounds(0)).cast(dt) && value <= lit(bounds(1)).cast(dt))
  }

  // ---- PII detection / redaction ------------------------------------

  /** PII regexes shared by the Spark kernels and the DuckDB oracle.
    * Restricted to syntax Java regex (Spark, leftmost-first) and RE2
    * (DuckDB, leftmost-longest) interpret identically: character
    * classes, bounded/greedy repeats, `\b` — no alternations with
    * overlapping prefixes, no lookaround, no backreferences. With
    * those forms excluded, both match disciplines pick the same spans,
    * so redaction is engine-independent. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}"

  /** Per-category PII hit counts (email / IPv4 / intl-format phone):
    * the detection census a release gate reads before redaction.
    * Pure column expressions — map-only, codegen'd, no UDF. */
  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(EmailRe), lit(0))),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))))

  /** Redact PII in place with typed placeholders. Replacement order
    * (email → IPv4 → phone) is part of the contract — the oracle
    * replays the identical three-pass composition. Placeholders are
    * letter-only, so no pass can manufacture a match for a later one.
    * Map-only: at 100 TB this is one narrow scan, no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** EMBEDDING-level benchmark decontamination — [[decontaminate]]'s
    * semantic twin: n-gram overlap misses a contaminated example that
    * was paraphrased or translated into the training set, which is
    * exactly what an embedding similarity screen catches (the
    * standard second stage of eval decontamination). For every corpus
    * vector, the eval vectors with cosine ≥ `tau`. The eval side
    * (benchmark suites — tiny by contract, same argument as the
    * shingle screen) BROADCASTS, so the corpus side is ONE map-only
    * scan with the eval set resident per task — never a shuffle, and
    * never corpus × corpus. Emits `(train_id, eval_id, cos)` per hit;
    * the anti-join against `train_id` is the caller's one extra
    * line. */
  def decontaminateSemantic(corpus: DataFrame, evalVecs: DataFrame,
      tau: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("train_id"), col(vecCol).as("__cv"))
      .crossJoin(broadcast(
        evalVecs.select(col(idCol).as("eval_id"), col(vecCol).as("__ev"))))
      .withColumn("cos",
        graft.functions.VectorFunctions.cosineNative(col("__cv"), col("__ev")))
      .filter(col("cos") >= tau)
      .select(col("train_id"), col("eval_id"), col("cos"))

  /** DSIR-shaped importance scoring (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every raw document by how much more likely its text is under a
    * TARGET distribution (the domain you want more of) than under the
    * raw crawl itself — log w(x) = log p_target(x) − log p_raw(x) —
    * with both distributions modeled as unigram bags over HASHED
    * token features. The hashing is the piece that makes this a
    * 100 TB operator: the feature space is FIXED at `buckets`
    * (default 1024), so each model is an O(buckets) table that
    * broadcasts, however large the corpus or its vocabulary — a raw
    * token-level model would be corpus-vocabulary-sized. Counts use
    * add-1 smoothing over the bucket space, so a bucket unseen in the
    * target stays finite rather than −∞.
    *
    * Stages: one tokenize + bucket pass (map-only arithmetic on the
    * oracle-replayable md5 fingerprint), ONE (doc, bucket) tf
    * aggregate that both models and the per-doc score reuse, two
    * O(buckets) model tables broadcast back, and one per-doc sum. Per
    * (doc, bucket) terms cast to DECIMAL(18,6) BEFORE summing (the
    * logprob-suite convention: deterministic at any parallelism), and
    * `selected` derives from the FLOORED score so the flag can never
    * disagree with the published number. `targetPred` marks the
    * in-domain exemplars (here: a metadata predicate; in production,
    * a trusted high-quality slice). Raw = the WHOLE corpus including
    * the target slice — DSIR's denominator is the crawl distribution,
    * not its complement. */
  def dsirScore(docs: DataFrame, targetPred: Column, buckets: Int = 1024,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), targetPred.as("__t"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
      .select(col("id"), col("__t"),
        pmod(graft.operators.Sketches.stringFingerprint(col("term")),
          lit(buckets.toLong)).as("b"))
      .groupBy("id", "__t", "b").agg(count(lit(1)).as("tf"))
    val tgt = tf.filter(col("__t")).groupBy("b").agg(sum("tf").as("ct"))
    val raw = tf.groupBy("b").agg(sum("tf").as("cr"))
    val nt = tgt.agg(sum("ct").as("nt"))
    val nr = raw.agg(sum("cr").as("nr"))
    val model = raw.join(tgt, Seq("b"), "left")
      .select(col("b"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val B = lit(buckets.toDouble)
    tf.join(broadcast(model), "b")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("id"), col("tf"),
        (col("tf") * (
          log((col("ct") + 1).cast("double") / (col("nt").cast("double") + B)) -
            log((col("cr") + 1).cast("double") / (col("nr").cast("double") + B))))
          .cast("decimal(18,6)").as("c"))
      .groupBy("id")
      .agg(sum("c").cast("double").as("lw"), sum("tf").as("n_toks"))
      .select(col("id").as(idCol), col("n_toks"),
        (floor(col("lw") * 10000.0) / 10000.0).as("log_ratio"),
        ((floor(col("lw") * 10000.0) / 10000.0) > 0.0).as("selected"))
  }

  /** Benchmark decontamination: for every corpus document, the eval
    * documents it shares >= `minOverlap` distinct n-gram shingles with.
    * The eval side (benchmark suites — tiny by contract) becomes a
    * broadcast inverted index, so the corpus side is one scan + one
    * aggregation over ACTUAL collisions — never corpus x eval
    * all-pairs. Shingles are distinct per doc ([[Dedup.shingles]]), so
    * the per-pair collision count IS the intersection size. */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame,
      n: Int = 3, minOverlap: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def inv(df: DataFrame, as: String) = df
      .select(col(idCol).as(as), Dedup.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col(as), explode(col("sh")).as("s"))
    inv(corpus, "train_id")
      .join(broadcast(inv(evalDocs, "eval_id")), "s")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** k-anonymity generalization ladder (Sweeney '02; the release
    * census run beside PII redaction before any per-record data
    * leaves the pipeline): a record is k-anonymous when its QUASI-
    * IDENTIFIER tuple is shared by ≥ k records. Each level-0 group
    * (the full quasi-identifier) that clears k publishes as-is
    * (`anon_level` 0); an under-k group GENERALIZES — drops to the
    * coarser `level1` prefix of its quasi-identifier — and publishes
    * at level 1 if the coarser group's TOTAL clears k; otherwise it
    * must be suppressed (`anon_level` 2). Returns one row per level-0
    * group: the quasi-identifier columns, `n`, and `anon_level` —
    * the exact census a release gate thresholds on (suppression rate
    * = Σ n where anon_level = 2 / Σ n). All-integer.
    *
    * Note the standard subtlety: level-1 membership counts the WHOLE
    * coarser group (every record with that prefix), not just the
    * under-k remainder — generalized records are indistinguishable
    * from the level-0 publishers within the same prefix, which is
    * precisely what makes them k-anonymous there.
    *
    * Scale shape: two map-side-combined censuses (level 0, and level
    * 1 re-aggregated FROM level 0's output — never a second corpus
    * scan) and one equi-join of the level-0 census onto the O(coarser
    * groups) level-1 census. Output is O(#groups), a census, never
    * per-row. */
  def kAnonLadder(df: DataFrame, level0: Seq[String], level1: Seq[String],
      k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(level0.nonEmpty, "level0 quasi-identifier columns required")
    require(level1.nonEmpty && level1.forall(level0.contains),
      s"level1 must be a non-empty subset of level0 ($level0), got $level1")
    require(level1.toSet != level0.toSet,
      "level1 must be strictly coarser than level0 (drop at least one column)")
    // materialized: g1 AND the final join both consume g0 — without
    // this the corpus census runs twice, contradicting the "never a
    // second corpus scan" shape above
    val g0 = df.groupBy(level0.map(col): _*).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val g1 = g0.groupBy(level1.map(col): _*).agg(sum(col("n")).as("n1"))
    g0.join(g1, level1)
      .select(level0.map(col) :+ col("n") :+
        when(col("n") >= k, lit(0L))
          .when(col("n1") >= k, lit(1L))
          .otherwise(lit(2L)).as("anon_level"): _*)
  }

  /** Distinct l-diversity release census (Machanavajjhala et al.
    * ICDE '06 §3, the "distinct l-diversity" instantiation) — the
    * check [[kAnonLadder]] CANNOT make: a quasi-identifier group can
    * clear k and still leak its sensitive attribute outright when
    * every member shares one value (the homogeneity attack — k
    * bystanders are no crowd if they all have the same diagnosis).
    * Per QI group the census reports `n` (the k-anonymity count),
    * `l_distinct` (distinct non-NULL sensitive values — NULL is a
    * missing measurement, not a value an attacker learns), and the
    * release `verdict`: 0 = publish (n ≥ k AND l_distinct ≥ l),
    * 1 = suppress on k (too few members — reported first when both
    * fail, since an under-k group never reaches the diversity test),
    * 2 = suppress on l (k-anonymous but sensitive-homogeneous).
    * All-integer.
    *
    * Scale shape: ONE map-side-combined census over (QI, sensitive)
    * — never a per-group count(DISTINCT) Expand over corpus rows —
    * then an O(#distinct cells) re-aggregate to QI groups (`n` =
    * Σ cell counts, `l_distinct` = cell count with non-NULL
    * sensitive). Output is O(#groups). */
  def lDiversity(df: DataFrame, qi: Seq[String], sensitive: String,
      k: Long, l: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    require(qi.nonEmpty, "quasi-identifier columns required")
    require(!qi.contains(sensitive),
      s"sensitive column '$sensitive' must not be part of the quasi-identifier $qi")
    val cells = df.groupBy((qi :+ sensitive).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    cells.groupBy(qi.map(col): _*)
      .agg(sum(col("cnt")).as("n"),
        sum(when(col(sensitive).isNotNull, 1L).otherwise(0L)).as("l_distinct"))
      .select(qi.map(col) :+ col("n") :+ col("l_distinct") :+
        when(col("n") < k, lit(1L))
          .when(col("l_distinct") < l, lit(2L))
          .otherwise(lit(0L)).as("verdict"): _*)
  }

  /** High-entropy credential/secret screen — the PII family's
    * machine-token arm (beside [[redactPii]]'s email/phone patterns):
    * API keys, tokens, and password-mash strings leak into crawled
    * and user-generated text constantly, and a pretraining corpus
    * must surface them BEFORE a model memorizes them (the
    * training-data-extraction threat model of Carlini et al. USENIX
    * '21 — verbatim low-frequency high-entropy strings are exactly
    * what LMs regurgitate). The classic detector stack (truffleHog
    * lineage): a cheap shape prefilter — token length ≥ `minLen`,
    * charset confined to the base64/url-safe alphabet
    * `[A-Za-z0-9+/=_-]`, at least one letter AND one digit (kills
    * long natural words and digit runs) — then Shannon entropy of
    * the surviving token ≥ `minEntropy` nats, computed by the
    * integer-exact [[graft.functions.TextFunctions.charEntropy]]
    * machinery (per-term DECIMAL cast → 1e-6-unit longs → one
    * quantized report), so the verdict is bit-identical at any
    * parallelism and replayable in SQL. Natural English sits near
    * 2.5-3 nats BUT fails the shape screen; hex/base64 material
    * passes both. Emits the review queue `(id, token, entropy)` —
    * tokens deduped per doc (`array_distinct`: one secret pasted
    * twice is one finding).
    *
    * Scale shape: the prefilter is map-only on the token stream
    * (length + three regexes, codegen'd); the entropy HOF runs ONLY
    * on surviving candidates (rare by construction). No shuffle at
    * all — censusing/joining the queue is the caller's move. */
  def secretScan(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minLen: Int = 16,
      minEntropy: Double = 2.5): DataFrame = {
    require(minLen >= 8, s"minLen < 8 would flag natural words, got $minLen")
    df.select(col(idCol).as("id"),
        explode(array_distinct(graft.functions.TextFunctions.tokens(col(textCol))))
          .as("token"))
      .filter(length(col("token")) >= minLen &&
        col("token").rlike("^[A-Za-z0-9+/=_-]+$") &&
        col("token").rlike("[A-Za-z]") &&
        col("token").rlike("[0-9]"))
      .withColumn("entropy",
        graft.functions.TextFunctions.charEntropy(col("token")))
      .filter(col("entropy") >= minEntropy)
  }

  /** Secret REDACTION — [[secretScan]]'s sibling the way
    * [[redactPii]] pairs with [[piiCounts]]: the scan finds, this
    * removes. A ROW-LOCAL column expression (no scan output to join
    * back): the text splits on single spaces (lossless — runs of
    * spaces become empty fragments that rejoin exactly), each
    * fragment passes the same shape screen + integer-exact entropy
    * verdict the scanner applies, and flagged fragments rewrite to
    * `<SECRET>`. Single-space split vs the scanner's `\s+` tokens:
    * a secret containing a tab/newline boundary tokenizes the same
    * way under both (neither fragment type may contain whitespace),
    * so scan-flagged tokens and redact-flagged fragments agree on
    * every whitespace-delimited secret. Map-only, codegen'd HOFs,
    * zero shuffle at any corpus size. */
  def redactSecrets(text: Column, minLen: Int = 16,
      minEntropy: Double = 2.5): Column = {
    val frag = (t: Column) =>
      when(length(t) >= minLen &&
        t.rlike("^[A-Za-z0-9+/=_-]+$") &&
        t.rlike("[A-Za-z]") && t.rlike("[0-9]") &&
        graft.functions.TextFunctions.charEntropy(t) >= minEntropy,
        lit("<SECRET>")).otherwise(t)
    array_join(transform(split(text, " "), frag), " ")
  }

  /** Integer-exact Shannon entropy of ONE string — the LOCAL arm of
    * [[graft.functions.TextFunctions.charEntropy]] for point serving
    * (admission screening is a serving call): identical quantization
    * pipeline — per-distinct-char `p·ln p` rounded HALF_UP to 6 dp
    * (the DECIMAL(18,6) cast), summed as exact 1e-6-unit longs, ONE
    * floored report — so a verdict computed client-side agrees with
    * the scan column bit-for-bit (pinned in CurationSpec). */
  def charEntropyLocal(s: String): Double = {
    if (s.isEmpty) return 0.0
    val cps = s.codePoints().toArray
    val n = cps.length.toDouble
    val counts = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    cps.foreach(c => counts.update(c, counts.getOrElse(c, 0) + 1))
    var su = 0L
    counts.valuesIterator.foreach { c =>
      val p = c / n
      su += java.math.BigDecimal.valueOf(p * math.log(p))
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
    }
    math.floor(-su / 100.0) / 10000.0
  }

  /** The [[secretScan]] shape screen on one token — shared by the
    * local scan and redact arms so the three surfaces cannot drift. */
  private def secretShapeLocal(t: String, minLen: Int): Boolean =
    t.length >= minLen &&
      t.matches("^[A-Za-z0-9+/=_-]+$") &&
      t.exists(_.isLetter) && t.exists(_.isDigit)

  /** [[secretScan]], LOCAL point arm: flagged `(token, entropy)` pairs
    * of one text, deduped in first-occurrence order — the same
    * whitespace tokenization, shape screen, and integer-exact entropy
    * verdict as the distributed scan (CurationSpec pins the identity
    * over the fixture corpus). */
  def secretScanLocal(text: String, minLen: Int = 16,
      minEntropy: Double = 2.5): Seq[(String, Double)] = {
    require(minLen >= 8, s"minLen < 8 would flag natural words, got $minLen")
    text.split("\\s+", -1).toSeq.distinct
      .filter(secretShapeLocal(_, minLen))
      .map(t => (t, charEntropyLocal(t)))
      .filter(_._2 >= minEntropy)
  }

  /** [[redactSecrets]], LOCAL point arm: identical single-space split,
    * per-fragment verdict, and rejoin. */
  def redactSecretsLocal(text: String, minLen: Int = 16,
      minEntropy: Double = 2.5): String =
    text.split(" ", -1).iterator.map { frag =>
      if (secretShapeLocal(frag, minLen) && charEntropyLocal(frag) >= minEntropy)
        "<SECRET>"
      else frag
    }.mkString(" ")

  /** Temperature-scaled mixture reweighting census — the data-mixing
    * plan every multi-source pretraining run starts from (the
    * exponential-smoothing lineage: multilingual BERT's α = 0.7,
    * XLM-R §3.1, GPT-3's non-proportional corpus weights): source g
    * with n_g tokens samples with probability p_g ∝ n_g^α, flattening
    * the head so low-resource sources aren't drowned (α = 1 is
    * proportional, α = 0 uniform). Returns per source: `n_size`, the
    * smoothed weight, the mix share, and the EPOCH COUNT the share
    * implies at a total budget of Σn — epochs > 1000 milli flags the
    * source a balanced mix would repeat (the memorization-risk census
    * for the mixing plan).
    *
    * Exponent convention: α comes QUANTIZED TO QUARTERS
    * (`alphaQuarters`/4, 0..4) so n^α composes from IEEE-exact pieces
    * — `sqrt` is correctly rounded in both engines (the [[Profile]]
    * pearson convention) where a general libm `pow` is NOT — n^(3/4)
    * = sqrt(n)·sqrt(sqrt(n)), one correctly-rounded op per factor
    * plus exact double multiplies, then ONE floor into integer
    * 1e-6 units (the floored-ln convention). All downstream
    * arithmetic — Σw, shares in ppm, milli-epochs — is exact integer
    * (DECIMAL(38,0) where products leave int64).
    *
    * Scale shape: the input is already a per-group census (`sizes`:
    * one row per source, model-sized); everything here is O(#groups)
    * with the normalizing Σ crossJoined as a 1-row aggregate. The
    * caller produces `sizes` with ONE map-side-combined corpus census
    * (see the q_mixture_weights gate). */
  def mixtureWeights(sizes: DataFrame, group: String, size: String,
      alphaQuarters: Int = 2): DataFrame = {
    require(alphaQuarters >= 0 && alphaQuarters <= 4,
      s"alphaQuarters must be in 0..4 (α = quarters/4), got $alphaQuarters")
    val n = col("n_size").cast("double")
    val factors = Seq(
      if ((alphaQuarters & 4) != 0) Some(n) else None,
      if ((alphaQuarters & 2) != 0) Some(sqrt(n)) else None,
      if ((alphaQuarters & 1) != 0) Some(sqrt(sqrt(n))) else None).flatten
    val w = factors.reduceOption(_ * _).getOrElse(lit(1.0d))
    val base = sizes
      .select(col(group), col(size).cast("long").as("n_size"))
      .withColumn("__chk", when(col("n_size") <= 0L,
        raise_error(concat(lit("mixtureWeights requires positive sizes, got "),
          col("n_size").cast("string"), lit(" for group "),
          col(group).cast("string")))).otherwise(lit(0)))
      .select(col(group), col("n_size"),
        floor(w * lit(1e6)).cast("decimal(38,0)").as("w_units"))
    val tot = base.agg(sum(col("w_units")).cast("decimal(38,0)").as("s"),
      sum(col("n_size")).cast("decimal(38,0)").as("tot_size"))
    base.crossJoin(tot)
      .select(col(group), col("n_size"),
        // the weight REPORT column is int64; α = 1 over a >9.2e12-token
        // source would wrap it, so fail loudly (shares/epochs stay exact
        // in decimal regardless)
        when(col("w_units") > lit(9200000000000000000L),
          raise_error(lit("mixtureWeights: w_units exceeds int64 — " +
            "lower alphaQuarters or pre-scale sizes")))
          .otherwise(col("w_units").cast("long")).as("w_units"),
        expr("CAST((w_units * 1000000) DIV s AS BIGINT)").as("share_ppm"),
        expr("CAST(((w_units * 1000000) DIV s * tot_size) DIV (CAST(n_size AS DECIMAL(38,0)) * 1000) AS BIGINT)")
          .as("epochs_milli"))
  }
}
