package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.operators.Curation
import graft.Spread.Ops

/** Training-data curation queries: deterministic splits, stratified
  * sampling, token-budget sharding, benchmark decontamination — the
  * corpus-layout stages of an LLM data pipeline, all hash/prefix-sum
  * deterministic so the full pipelines are DuckDB-oracle-checked. */
object CurationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Per-document train/val/test assignment (80/10/10 by id hash):
    * stable under corpus growth, no RNG, map-only. */
  def qSplitAssign(s: SparkSession, dir: String): DataFrame =
    Curation.splitAssign(docs(s, dir))
      .select(col("doc_id"), col("split"))
      .orderBy("doc_id")

  /** Stratified downsampling: rebalance the corpus by keeping 25% of
    * the dominant language and all of the rest — membership decided by
    * id hash (uncorrelated with the split family), map-only. */
  def qSampleStratified(s: SparkSession, dir: String): DataFrame =
    Curation.stratifiedSample(
        docs(s, dir),
        when(col("lang") === "en", 2500L).otherwise(10000L))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** Token-budget sharding: contiguous ~2000-token shards in doc_id
    * order via the distributed prefix sum (no global-window
    * serialization), summarized per shard. */
  def qTokenShards(s: SparkSession, dir: String): DataFrame =
    Curation.tokenShards(docs(s, dir), budgetTokens = 2000L,
        tokCol = size(tokens(col("text"))))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .orderBy("shard")

  /** Overlapping character-window chunking (size 256, overlap 32 —
    * the RAG/pretraining windowing shape): map-only explode, chunk
    * text gated by hash so the window boundaries, provenance offsets,
    * and substring semantics all sit under the oracle. */
  def qChunkDocs(s: SparkSession, dir: String): DataFrame =
    Curation.chunkDocs(docs(s, dir), size = 256, overlap = 32)
      .select(col("doc_id"), col("chunk_idx"), col("start_pos"),
        length(col("chunk")).as("chunk_len"),
        md5(col("chunk").cast("binary")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")

  /** The CDC chunk table as shared oracle CTEs (`chunks`): codes →
    * window-hash cut positions → end-pad/dedup → per-chunk (doc_id,
    * chunk_ord, start, len, chunk_md5). ONE definition feeds both the
    * chunk-table gate and the chunk-dedup census gate. */
  private[queries] val cdcChunkCtesSql: String =
    """c AS (SELECT doc_id, text,
      |        list_transform(string_split(text, ''), ch -> CAST(ord(ch) AS BIGINT)) AS codes,
      |        CAST(len(string_split(text, '')) AS BIGINT) AS n
      |      FROM documents WHERE len(text) > 0),
      |cut AS (SELECT doc_id, text, list_sort(list_distinct(list_append(
      |          CASE WHEN n >= 16 THEN
      |            list_filter(range(16, n + 1), i ->
      |              list_reduce(list_prepend(CAST(0 AS BIGINT), codes[CAST(i - 15 AS INT):CAST(i AS INT)]),
      |                (h, ch) -> (h * 31 + ch) % 1000000007) % 64 = 0)
      |          ELSE CAST([] AS BIGINT[]) END, n))) AS cuts
      |        FROM c),
      |expl AS (SELECT doc_id, text, cuts,
      |           unnest(range(1, CAST(len(cuts) AS BIGINT) + 1)) AS j
      |         FROM cut),
      |chunks AS (SELECT doc_id, CAST(j AS INT) AS chunk_ord,
      |             coalesce(cuts[CAST(j - 1 AS INT)], 0) + 1 AS start,
      |             cuts[CAST(j AS INT)] - coalesce(cuts[CAST(j - 1 AS INT)], 0) AS len,
      |             md5(substr(text, CAST(coalesce(cuts[CAST(j - 1 AS INT)], 0) + 1 AS INT),
      |                 CAST(cuts[CAST(j AS INT)] - coalesce(cuts[CAST(j - 1 AS INT)], 0) AS INT))) AS chunk_md5
      |           FROM expl)""".stripMargin

  /** Content-defined chunking ([[Curation.cdcChunks]] — Manber
    * fingerprint cut points, the insertion-robust counterpart of the
    * fixed-width q_chunk_docs windows): boundary positions, chunk
    * extents, and chunk hashes all under the oracle, so the rolling
    * window hash, the mod-64 cut rule, and the end-pad/dedup edge
    * cases replay bit-for-bit. CurationSpec measures the property the
    * operator exists for: a prefix insertion re-synchronizes the
    * chunk stream where fixed windows lose every later chunk. */
  def qCdcChunks(s: SparkSession, dir: String): DataFrame =
    Curation.cdcChunks(docs(s, dir))
      .select(col("doc_id"), col("chunk_ord"), col("start"), col("len"),
        col("chunk_md5"))
      .orderBy("doc_id", "chunk_ord")

  /** Chunk-level duplication census — CDC chunking's dedup consumer
    * (the chunk-store dedup shape: how much of each document is
    * boilerplate shared with OTHER documents): corpus-wide census of
    * each chunk hash's distinct-document count, joined back for a
    * per-doc (chunks, shared chunks, shared chars) report. Because
    * the chunks are content-defined, a shifted copy of a passage
    * still censuses as shared ([[Curation.cdcChunks]]' measured
    * re-sync property) — fixed windows would miss it.
    *
    * Scale shape: two map-side-combined hash aggregates + one key
    * join on `chunk_md5` — nothing all-pairs, shuffle O(chunks).
    * The distinct-doc count is exact (bounded by chunk occurrences);
    * at 100 TB the census would ride the same aggregate with a
    * sketch ([[graft.operators.Sketches.Hll]]) if the per-key doc
    * lists themselves became hot. */
  def qDedupChunks(s: SparkSession, dir: String): DataFrame = {
    // checkpoint the chunk table: census + join both read it, and
    // without the barrier the rolling-hash chunking pass runs TWICE
    // (profiled: 2 × ~0.3 s single-task stages of one warm execution)
    val ch = Curation.cdcChunks(docs(s, dir))
      .select(col("doc_id"), col("chunk_md5"), col("len"))
      .localCheckpoint()
    val census = ch.groupBy("chunk_md5")
      .agg(countDistinct("doc_id").as("nd"))
    ch.join(census, "chunk_md5")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared_chunks"),
        sum(when(col("nd") > 1, col("len")).otherwise(0L)).as("shared_chars"))
      .orderBy("doc_id")
  }

  /** The (train, eval, overlap) contamination pair table, built once
    * per session + fixture ([[IndexQueries.SessionMemo]] — the same
    * derived-artifact rationale as the near-dup pair graph): two
    * consumers read it (the pair report and the cleaned-corpus
    * materialization), and the shingle join is the expensive part. */
  private val decontamMemo = new IndexQueries.SessionMemo[DataFrame]
  private def contaminationPairs(s: SparkSession, dir: String): DataFrame =
    decontamMemo.get(s, dir) {
      val d = docs(s, dir)
      Curation.decontaminate(
          d.filter(pmod(col("doc_id"), lit(50)) =!= 0),
          d.filter(pmod(col("doc_id"), lit(50)) === 0),
          n = 3, minOverlap = 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Benchmark decontamination: every (train doc, eval doc) pair
    * sharing >= 2 distinct 3-gram shingles; the eval set (doc_id
    * divisible by 50 — standing in for a benchmark suite) is a
    * broadcast inverted index, the corpus side a single scan. */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame =
    contaminationPairs(s, dir).orderBy("train_id", "eval_id")

  /** Sequence packing: cut the global token stream (doc_id order) into
    * 512-token training sequences and summarize each — every interior
    * sequence must hold exactly 512 tokens, which checks the packing
    * arithmetic end-to-end. */
  def qSeqPack(s: SparkSession, dir: String): DataFrame =
    Curation.packSequences(docs(s, dir), seqLen = 512L,
        tokCol = size(tokens(col("text"))))
      .groupBy("seq")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok_in_seq").as("n_tokens"))
      .orderBy("seq")

  /** Deterministic mixture-weight upsampling: repeat under-represented
    * languages (everything except the dominant 'en') 3x, 'en' 1x —
    * the data-mixing stage, exactly reproducible (no RNG). */
  def qUpsample(s: SparkSession, dir: String): DataFrame =
    Curation.upsample(docs(s, dir),
        when(col("lang") === "en", 1).otherwise(3))
      .select(col("doc_id"), col("copy"), col("lang"))
      .orderBy("doc_id", "copy")

  /** The decontamination pipeline's end product: the training corpus
    * with every eval-overlapping document removed (detect → distinct
    * offender ids → anti-join). The anti-join's right side is the
    * bounded contaminated-id set, so application costs one more
    * corpus pass. */
  def qDecontaminatedCorpus(s: SparkSession, dir: String): DataFrame = {
    val train = docs(s, dir).filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val contaminated = contaminationPairs(s, dir)
      .select(col("train_id").as("doc_id")).distinct()
    train.join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Per-domain quota cap: each source keeps its 3 best docs by the
    * floor-quantized quality score (ties to the lowest doc_id) — the
    * corpus-balancing stage. Rides the bounded-heap TopK aggregate
    * (map-side partial top-3 per partition; one hot domain never
    * serializes a sort, unlike a ranking window). Quality is quantized
    * at 1e-4 BEFORE ranking, so both engines rank identical exact
    * values. */
  def qDomainCap(s: SparkSession, dir: String): DataFrame =
    // spread before the per-doc quality score AND pin the spread with
    // a checkpoint barrier — Catalyst collapses the score projection
    // back below a bare exchange (the fuzzyPairs pushdown lesson), so
    // without it the score still ran single-task
    Curation.domainCap(
        docs(s, dir).spread(col("doc_id")).localCheckpoint(), cap = 3,
        scoreCol = floor(graft.functions.TextFunctions.qualityScore(col("text")) * 10000.0) / 10000.0)
      .select(col("domain"), col("rnk"), col("doc_id"), col("score").as("quality"))
      .orderBy("domain", "rnk")

  /** PII detection + redaction census. The fixture corpus is PII-free
    * by construction, so the query first plants deterministic contact
    * strings derived from fixture columns (email on doc_id%3, IPv4 on
    * %4, intl phone on %5 — overlapping residues exercise multi-hit
    * and zero-hit rows alike), then runs the real kernels: per-category
    * counts on the enriched text and the three-pass redaction
    * ([[Curation.redactPii]]), hash-compared against the oracle's
    * identical enrichment + RE2 replay. Map-only end to end. */
  def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val enriched = docs(s, dir).select(
      col("doc_id"),
      concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact "), col("source"), lit("."),
            col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
            lit(".0."), ((col("doc_id") * 7) % 256).cast("string")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" tel +1 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("text"))
    val (nEmail, nIp, nPhone) = Curation.piiCounts(col("text"))
    enriched.select(
        col("doc_id"),
        nEmail.cast("int").as("n_email"),
        nIp.cast("int").as("n_ip"),
        nPhone.cast("int").as("n_phone"),
        md5(Curation.redactPii(col("text"))).as("red_hash"))
      .orderBy("doc_id")
  }

  /** Fractional (temperature) upsampling: en × 1.7, everything else
    * × 0.5 — floor(w) guaranteed copies plus a deterministic
    * id-hash-gated extra, so the mixing multiset reproduces exactly
    * and expected multiplicity equals the weight. */
  def qUpsampleFrac(s: SparkSession, dir: String): DataFrame =
    Curation.upsampleFractional(docs(s, dir),
        when(col("lang") === "en", 17000L).otherwise(5000L))
      .select(col("doc_id"), col("copy").cast("int").as("copy"), col("lang"))
      .orderBy("doc_id", "copy")

  /** Winsorizing length trim ([[Curation.trimOutliers]] — drop docs
    * outside the exact [p5, p95] n_chars band): the quantile bounds
    * replay as direct order statistics, the kept-census as a count
    * under the same between filter. The gated row carries the bounds
    * AND the kept/total counts, so both the quantile location and the
    * trim semantics are hash-pinned. */
  def qTrimOutliers(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val kept = Curation.trimOutliers(d, col("n_chars"),
      loQ = (1, 20), hiQ = (19, 20))
    kept.agg(count(lit(1)).as("n_kept"),
        min(col("n_chars")).as("min_kept"), max(col("n_chars")).as("max_kept"))
      .crossJoin(d.agg(count(lit(1)).as("n_total")))
      .select(col("n_total"), col("n_kept"), col("min_kept"), col("max_kept"))
  }

  /** Deterministic per-epoch training order
    * ([[Curation.epochShuffleKey]] — a pure function of (id, epoch),
    * so any rerun or recovered executor reproduces the identical
    * permutation with no RNG state): the gate pins the heads of two
    * epochs' orderings — different permutations (epochs decorrelate),
    * both exactly replayed by the shared key generator. */
  def qEpochShuffle(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    def top(e: Int) = d
      .select(lit(e).as("epoch"), col("doc_id"),
        Curation.epochShuffleKey(col("doc_id"), e).as("epoch_key"))
      .orderBy(col("epoch_key").asc, col("doc_id").asc)
      .limit(15)
    top(0).unionByName(top(1))
      .orderBy("epoch", "epoch_key", "doc_id")
  }

  /** Weighted sampling without replacement
    * ([[graft.operators.Curation.weightedSample]] — the
    * Efraimidis-Spirakis exponential race): 100 docs drawn
    * ∝ n_chars. The oracle replays the hash-uniform draw, the single
    * floored ln, and the (ekey, id) selection order. */
  def qSampleWeighted(s: SparkSession, dir: String): DataFrame =
    Curation.weightedSample(docs(s, dir), col("doc_id"), col("n_chars"), k = 100)

  /** Per-SOURCE weighted sampling
    * ([[graft.operators.Curation.weightedSampleGrouped]] — "k docs
    * per domain ∝ length", the mixture-construction primitive):
    * bounded-heap top-5 per source over the same race key. */
  def qSampleWeightedGrouped(s: SparkSession, dir: String): DataFrame =
    Curation.weightedSampleGrouped(docs(s, dir), col("source"),
        col("doc_id"), col("n_chars"), k = 5)
      .withColumnRenamed("grp", "source")
      .orderBy("source", "rnk")

  /** Hash-bucketed negative sampling
    * ([[graft.operators.Curation.negativeSample]] — the contrastive-
    * training primitive): anchors = embedding rows with vec_id < 8,
    * corpus = the embeddings table, 5 negatives each from the
    * anchor's hash-assigned bucket of 4, same-label candidates
    * excluded, ranked by the deterministic pair hash. The oracle
    * replays both bucket hashes, the label screen, the pair-hash
    * arithmetic, and the (hash, id) selection order. */
  def qNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    Curation.negativeSample(e.filter(col("vec_id") < 8), e, k = 5, buckets = 4L)
      .orderBy("anchor", "rank")
  }

  /** HARD-negative mining — [[qNegatives]]'s difficulty-ordered twin
    * (the contrastive-training recipe: random negatives teach the
    * easy margin, HARD negatives — the most similar wrong-label
    * candidates — teach the boundary). For each anchor, the top-5
    * different-label vectors by cosine. Anchors broadcast (bounded
    * query batch by contract), the corpus pass is map-only scoring,
    * and the per-anchor top-k runs through the bounded-heap TopK
    * aggregator — map-side partials, O(#anchors·k) shuffle, no
    * ranking window anywhere. Heap key (1 − cos, id): monotone in
    * cos DESC with the id tiebreak, so the oracle's row_number
    * replays the exact order. */
  def qNegativesHard(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val anchors = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("anchor"), col("label").as("al"),
        col("embedding").as("av"))
    val topk = graft.operators.TopK.topK(5)
    e.crossJoin(broadcast(anchors))
      .filter(col("label") =!= col("al"))
      .select(col("anchor"),
        (lit(1.0d) - graft.functions.VectorFunctions.cosineNative(
          col("embedding"), col("av"))).as("d"),
        col("vec_id"))
      .groupBy("anchor")
      .agg(topk(col("d"), col("vec_id")).as("hits"))
      .select(col("anchor"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("anchor"), (col("pos") + 1).cast("int").as("rank"),
        col("hit._2").as("neg"),
        round(lit(1.0d) - col("hit._1"), 4).as("cos"))
      .orderBy("anchor", "rank")
  }

  /** The race-key SQL shared by both weighted-sampling oracles (ONE
    * definition of the draw arithmetic). */
  private val ekeySql: String =
    "floor((-ln((((doc_id * 2654435761 + 987654321) % 4294967296) + 1) " +
      "/ CAST(4294967296 AS DOUBLE)) / CAST(n_chars AS DOUBLE)) * 1e6) / 1e6"

  /** DSIR-shaped importance selection ([[Curation.dsirScore]], Xie et
    * al. NeurIPS 2023): every document scored by log p_target −
    * log p_raw under 1024-bucket hashed-unigram models, target = the
    * fixture's English slice. The oracle replays the md5 bucket hash,
    * both smoothed models, every per-(doc, bucket) decimal term, and
    * the floored selection flag. */
  def qDsirSelect(s: SparkSession, dir: String): DataFrame =
    // spread before the per-(doc, bucket) model scoring (the
    // single-input-task lesson)
    Curation.dsirScore(
        docs(s, dir).spread(col("doc_id")),
        targetPred = col("lang") === "en")
      .orderBy("doc_id")

  /** Embedding-level decontamination
    * ([[Curation.decontaminateSemantic]]): the fixture's every-50th
    * vector stands in for the benchmark suite; every corpus vector
    * within cosine 0.3 of an eval vector is a semantic-contamination
    * hit. One broadcast + one map-only scan; the oracle replays the
    * full cross product. */
  def qDecontaminateSemantic(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    Curation.decontaminateSemantic(
        e.filter(col("vec_id") % 50 =!= 0),
        e.filter(col("vec_id") % 50 === 0), tau = 0.3)
      .select(col("train_id"), col("eval_id"), round(col("cos"), 4).as("cos"))
      .orderBy("train_id", "eval_id")
  }

  /** High-entropy secret screen ([[Curation.secretScan]] — the PII
    * family's machine-token arm). The fixture corpus is secret-free
    * by construction, so the gate plants one deterministic
    * credential-shaped token per doc_id ≡ 0 (mod 7) — the doc's md5
    * hex, 32 chars of mixed hex through the shape screen — the
    * q_pii_redact enrichment convention. Output is the per-source
    * census of the review queue: finding count + distinct docs hit.
    * The entropy verdict is the integer-exact charEntropy machinery,
    * replayed term-for-term by the oracle. */
  def qSecretScan(s: SparkSession, dir: String): DataFrame = {
    val planted = docs(s, dir).select(
      col("doc_id"), col("source"),
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" "),
          md5(col("doc_id").cast("string").cast("binary"))))
        .otherwise(col("text")).as("text"))
    Curation.secretScan(planted)
      .join(planted.select(col("doc_id").as("id"), col("source")), "id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_secrets"),
        countDistinct(col("id")).as("n_docs_hit"))
      .orderBy("source")
  }

  /** Secret REDACTION census ([[Curation.redactSecrets]] — the
    * scan's sibling, the q_pii_redact shape: same planted
    * credentials, row-local shape screen + integer-exact entropy
    * verdict rewriting flagged fragments to `<SECRET>`, hash-compared
    * against the oracle's identical replay; `n_secrets` carries the
    * per-doc finding count beside the redacted-text hash). */
  def qSecretRedact(s: SparkSession, dir: String): DataFrame = {
    val planted = docs(s, dir).select(
      col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" "),
          md5(col("doc_id").cast("string").cast("binary"))))
        .otherwise(col("text")).as("text"))
    val red = Curation.redactSecrets(col("text"))
    planted.select(
        col("doc_id"),
        (size(split(red, " ")) -
          size(filter(split(red, " "), f => f =!= "<SECRET>"))).cast("long")
          .as("n_secrets"),
        md5(red.cast("binary")).as("red_hash"))
      .orderBy("doc_id")
  }

  /** Token-budget waterfilling ([[Curation.budgetAllocate]]): the
    * per-source allocation when only 60% of the corpus's tokens fit
    * the training budget — small sources keep everything, large ones
    * cap at one integer water level. Every step is integer
    * arithmetic on the #sources-row artifact, replayed by the
    * oracle. */
  def qTokenBudget(s: SparkSession, dir: String): DataFrame =
    Curation.budgetAllocate(docs(s, dir), keyCol = col("source"),
        tokCol = size(tokens(col("text"))), budgetNum = 6L, budgetDen = 10L)
      .orderBy("key")

  /** Temperature-scaled mixture plan
    * ([[Curation.mixtureWeights]] at α = 1/2 — p_g ∝ √n_g, the
    * exponential-smoothing data-mixing census): per source, token
    * count, smoothed weight in exact 1e-6 units, mix share in ppm,
    * and the implied epoch count — the repeat-risk number a balanced
    * mix assigns each low-resource source. ONE map-side-combined
    * token census feeds the model-sized weight table. */
  def qMixtureWeights(s: SparkSession, dir: String): DataFrame =
    Curation.mixtureWeights(
      docs(s, dir).groupBy(col("source"))
        .agg(sum(size(tokens(col("text"))).cast("long")).as("n_tok")),
      group = "source", size = "n_tok", alphaQuarters = 2)
      .orderBy("source")

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_negatives_hard", qNegativesHard, Some(
      s"""WITH a AS (SELECT vec_id AS anchor, label AS al, embedding AS av
         |           FROM embeddings WHERE vec_id < 8),
         |p AS (SELECT a.anchor, e.vec_id AS neg,
         |        ${VectorQueries.cosSql("e.embedding", "a.av")} AS cos
         |      FROM embeddings e JOIN a ON e.label <> a.al),
         |r AS (SELECT anchor, neg, cos,
         |        row_number() OVER (PARTITION BY anchor ORDER BY cos DESC, neg) AS rnk
         |      FROM p)
         |SELECT anchor, CAST(rnk AS INT) AS rank, neg, round(cos, 4) AS cos
         |FROM r WHERE rnk <= 5 ORDER BY anchor, rank""".stripMargin)),
    QueryDef("q_token_budget", qTokenBudget, Some(
      """WITH per AS (SELECT source AS key,
        |         CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens
        |       FROM documents GROUP BY source),
        |r AS (SELECT key, n_tokens,
        |        row_number() OVER (ORDER BY n_tokens, key) AS i,
        |        coalesce(sum(n_tokens) OVER (ORDER BY n_tokens, key
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx,
        |        count(*) OVER () AS m,
        |        sum(n_tokens) OVER () AS tot
        |      FROM per),
        |c AS (SELECT *, ((tot * 6) // 10 - pfx) // (m - i + 1) AS cand FROM r),
        |l AS (SELECT min(i) AS ci FROM c WHERE n_tokens > cand),
        |lv AS (SELECT c.cand AS cap, l.ci AS ci FROM c JOIN l ON c.i = l.ci)
        |SELECT c.key, c.n_tokens,
        |  CAST(CASE WHEN lv.ci IS NULL OR c.i < lv.ci THEN c.n_tokens
        |            ELSE lv.cap END AS BIGINT) AS allocated,
        |  (lv.ci IS NOT NULL AND c.i >= lv.ci) AS capped
        |FROM c LEFT JOIN lv ON TRUE
        |ORDER BY c.key""".stripMargin)),
    QueryDef("q_mixture_weights", qMixtureWeights, Some(
      """WITH per AS (SELECT source,
        |    CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_size
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n_size,
        |    CAST(floor(sqrt(CAST(n_size AS DOUBLE)) * 1000000) AS BIGINT) AS w_units
        |  FROM per),
        |t AS (SELECT sum(w_units) AS s, sum(n_size) AS tot FROM w)
        |SELECT source, n_size, w_units,
        |  CAST((CAST(w_units AS HUGEINT) * 1000000) // s AS BIGINT) AS share_ppm,
        |  CAST(((CAST(w_units AS HUGEINT) * 1000000) // s * tot)
        |       // (CAST(n_size AS HUGEINT) * 1000) AS BIGINT) AS epochs_milli
        |FROM w, t ORDER BY source""".stripMargin)),
    QueryDef("q_decontaminate_semantic", qDecontaminateSemantic, Some(
      s"""WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
         |co AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 <> 0)
         |SELECT co.vec_id AS train_id, ev.vec_id AS eval_id,
         |  round(${VectorQueries.cosSql("co.embedding", "ev.embedding")}, 4) AS cos
         |FROM co CROSS JOIN ev
         |WHERE ${VectorQueries.cosSql("co.embedding", "ev.embedding")} >= 0.3
         |ORDER BY train_id, eval_id""".stripMargin)),
    QueryDef("q_dsir_select", qDsirSelect, Some(
      """WITH u AS (SELECT doc_id, lang, unnest(string_split_regex(text, '\s+')) AS term
        |           FROM documents),
        |f AS (SELECT doc_id, lang = 'en' AS t,
        |        ('0x' || substr(md5(term), 1, 15))::BIGINT % 1024 AS b FROM u),
        |tf AS (SELECT doc_id, t, b, count(*) AS tf FROM f GROUP BY 1, 2, 3),
        |tgt AS (SELECT b, sum(tf) AS ct FROM tf WHERE t GROUP BY b),
        |raw AS (SELECT b, sum(tf) AS cr FROM tf GROUP BY b),
        |nt AS (SELECT CAST(sum(ct) AS DOUBLE) AS nt FROM tgt),
        |nr AS (SELECT CAST(sum(cr) AS DOUBLE) AS nr FROM raw),
        |sc AS (SELECT tf.doc_id, tf.tf,
        |         CAST(tf.tf * (ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE) / (nt.nt + 1024.0))
        |                     - ln(CAST(cr + 1 AS DOUBLE) / (nr.nr + 1024.0)))
        |              AS DECIMAL(18,6)) AS c
        |       FROM tf JOIN raw USING (b) LEFT JOIN tgt USING (b), nt, nr),
        |pd AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS lw,
        |         CAST(sum(tf) AS BIGINT) AS n_toks
        |       FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_toks, floor(lw * 10000.0) / 10000.0 AS log_ratio,
        |  floor(lw * 10000.0) / 10000.0 > 0 AS selected
        |FROM pd ORDER BY doc_id""".stripMargin)),
    QueryDef("q_negatives", qNegatives, Some(
      """WITH a AS (SELECT vec_id AS anchor, label AS al,
        |         ((vec_id * 2246822519 + 98765) % 4294967296) % 4 AS b
        |       FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neg, label AS cl,
        |        ((vec_id * 2654435761) % 4294967296) % 4 AS b
        |      FROM embeddings),
        |p AS (SELECT a.anchor, c.neg,
        |        (((a.anchor * 3266489917 + 374761393) % 4294967296) * 10007
        |         + ((c.neg * 2654435761 + 12345) % 4294967296)) % 4294967296 AS h
        |      FROM a JOIN c ON a.b = c.b AND a.al <> c.cl),
        |r AS (SELECT anchor, neg,
        |        CAST(row_number() OVER (PARTITION BY anchor ORDER BY h, neg) AS INT) AS rank
        |      FROM p)
        |SELECT anchor, rank, neg FROM r WHERE rank <= 5
        |ORDER BY anchor, rank""".stripMargin)),
    QueryDef("q_sample_weighted", qSampleWeighted, Some(
      s"""SELECT doc_id AS id, $ekeySql AS ekey
         |FROM documents ORDER BY ekey, id LIMIT 100""".stripMargin)),
    QueryDef("q_sample_weighted_grouped", qSampleWeightedGrouped, Some(
      s"""WITH w AS (SELECT source, doc_id AS id, $ekeySql AS ekey FROM documents),
         |r AS (SELECT source, id, ekey,
         |        CAST(row_number() OVER (PARTITION BY source ORDER BY ekey, id) AS INT) AS rnk
         |      FROM w)
         |SELECT source, rnk, id, ekey FROM r WHERE rnk <= 5
         |ORDER BY source, rnk""".stripMargin)),
    QueryDef("q_epoch_shuffle", qEpochShuffle, Some {
      def leg(e: Int) =
        s"""SELECT $e AS epoch, doc_id,
           |  ${Curation.epochShuffleKeySql("doc_id", e)} AS epoch_key
           |FROM documents ORDER BY epoch_key, doc_id LIMIT 15""".stripMargin
      s"""SELECT * FROM ((${leg(0)}) UNION ALL (${leg(1)}))
         |ORDER BY epoch, epoch_key, doc_id""".stripMargin
    }),
    QueryDef("q_trim_outliers", qTrimOutliers, Some(
      """WITH p AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |           WHERE n_chars IS NOT NULL),
        |nn AS (SELECT count(*) AS n FROM p),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM p),
        |b AS (SELECT
        |        (SELECT v FROM r, nn WHERE rn = (1 * nn.n + 19) // 20) AS lo,
        |        (SELECT v FROM r, nn WHERE rn = (19 * nn.n + 19) // 20) AS hi)
        |SELECT (SELECT count(*) FROM documents) AS n_total,
        |  count(*) AS n_kept,
        |  min(CAST(p.v AS BIGINT)) AS min_kept,
        |  max(CAST(p.v AS BIGINT)) AS max_kept
        |FROM p, b WHERE p.v BETWEEN b.lo AND b.hi""".stripMargin)),
    QueryDef("q_upsample_frac", qUpsampleFrac, Some(
      """WITH t AS (SELECT doc_id, lang,
        |    CASE WHEN lang = 'en' THEN 17000 ELSE 5000 END AS w,
        |    (doc_id * 3266489917 + 374761393) % 4294967296 % 10000 AS h
        |  FROM documents),
        |c AS (SELECT doc_id, lang,
        |        CAST(w // 10000 + CASE WHEN h < w % 10000 THEN 1 ELSE 0 END AS INT) AS n
        |      FROM t)
        |SELECT doc_id, CAST(unnest(range(1, n + 1)) AS INT) AS copy, lang
        |FROM c WHERE n >= 1 ORDER BY doc_id, copy""".stripMargin)),
    QueryDef("q_pii_redact", qPiiRedact, Some(
      s"""WITH t AS (SELECT doc_id, text
         |  || CASE WHEN doc_id % 3 = 0 THEN ' contact ' || source || '.' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
         |  || CASE WHEN doc_id % 4 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
         |  || CASE WHEN doc_id % 5 = 0 THEN ' tel +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${Curation.EmailRe}')) AS INT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '${Curation.Ipv4Re}')) AS INT) AS n_ip,
         |  CAST(len(regexp_extract_all(text, '${Curation.PhoneRe}')) AS INT) AS n_phone,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '${Curation.EmailRe}', '<EMAIL>', 'g'),
         |    '${Curation.Ipv4Re}', '<IP>', 'g'),
         |    '${Curation.PhoneRe}', '<PHONE>', 'g')) AS red_hash
         |FROM t ORDER BY doc_id""".stripMargin)),
    QueryDef("q_secret_redact", qSecretRedact, Some(
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |         THEN text || ' ' || md5(CAST(doc_id AS VARCHAR))
        |         ELSE text END AS text
        |  FROM documents),
        |fr AS (SELECT doc_id, string_split(text, ' ') AS fs FROM d),
        |f AS (SELECT doc_id, u.i AS ord, fs[u.i] AS frag
        |      FROM fr CROSS JOIN unnest(range(1, len(fs) + 1)) AS u(i)),
        |c AS (SELECT doc_id, ord, frag,
        |        (length(frag) >= 16
        |         AND regexp_matches(frag, '^[A-Za-z0-9+/=_-]+$')
        |         AND regexp_matches(frag, '[A-Za-z]')
        |         AND regexp_matches(frag, '[0-9]')) AS shape
        |      FROM f),
        |u2 AS (SELECT doc_id, ord,
        |         list_transform(range(1, length(frag) + 1), i -> frag[i]) AS ch
        |       FROM c WHERE shape),
        |t AS (SELECT doc_id, ord, ch, len(ch) AS n,
        |        unnest(list_distinct(ch)) AS dch FROM u2),
        |e AS (SELECT doc_id, ord,
        |        sum(CAST(CAST((CAST(len(list_filter(ch, x -> x = dch)) AS DOUBLE) / n)
        |            * ln(CAST(len(list_filter(ch, x -> x = dch)) AS DOUBLE) / n)
        |            AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS su
        |      FROM t GROUP BY 1, 2),
        |flag AS (SELECT doc_id, ord FROM e
        |         WHERE floor(CAST(-su AS DOUBLE) / 100) / 10000 >= 2.5),
        |r AS (SELECT c.doc_id, c.ord,
        |        CASE WHEN fl.ord IS NOT NULL THEN '<SECRET>' ELSE c.frag END AS frag
        |      FROM c LEFT JOIN flag fl ON fl.doc_id = c.doc_id AND fl.ord = c.ord),
        |o AS (SELECT doc_id, string_agg(frag, ' ' ORDER BY ord) AS red FROM r GROUP BY 1),
        |nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM flag GROUP BY 1)
        |SELECT o.doc_id, coalesce(nf.n, 0) AS n_secrets, md5(o.red) AS red_hash
        |FROM o LEFT JOIN nf ON nf.doc_id = o.doc_id
        |ORDER BY o.doc_id""".stripMargin)),
    QueryDef("q_secret_scan", qSecretScan, Some(
      """WITH d AS (SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0
        |         THEN text || ' ' || md5(CAST(doc_id AS VARCHAR))
        |         ELSE text END AS text
        |  FROM documents),
        |tk AS (SELECT doc_id, source,
        |         unnest(list_distinct(string_split_regex(text, '\s+'))) AS tok
        |       FROM d),
        |cand AS (SELECT doc_id, source, tok FROM tk
        |         WHERE length(tok) >= 16
        |           AND regexp_matches(tok, '^[A-Za-z0-9+/=_-]+$')
        |           AND regexp_matches(tok, '[A-Za-z]')
        |           AND regexp_matches(tok, '[0-9]')),
        |u AS (SELECT doc_id, source, tok,
        |        list_transform(range(1, length(tok) + 1), i -> tok[i]) AS ch
        |      FROM cand),
        |t AS (SELECT doc_id, source, tok, ch, len(ch) AS n,
        |        unnest(list_distinct(ch)) AS dch FROM u),
        |e AS (SELECT doc_id, source, tok,
        |        sum(CAST(CAST((CAST(len(list_filter(ch, x -> x = dch)) AS DOUBLE) / n)
        |            * ln(CAST(len(list_filter(ch, x -> x = dch)) AS DOUBLE) / n)
        |            AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS su
        |      FROM t GROUP BY 1, 2, 3),
        |hits AS (SELECT doc_id, source FROM e
        |         WHERE floor(CAST(-su AS DOUBLE) / 100) / 10000 >= 2.5)
        |SELECT source, count(*) AS n_secrets,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_hit
        |FROM hits GROUP BY source ORDER BY source""".stripMargin)),
    QueryDef("q_chunk_docs", qChunkDocs, Some(
      """WITH c AS (
        |  SELECT doc_id, u.i AS chunk_idx, u.i * 224 + 1 AS start_pos,
        |         substring(text, CAST(u.i * 224 + 1 AS INT), 256) AS chunk
        |  FROM documents CROSS JOIN unnest(range(0, (length(text)-1)//224 + 1)) AS u(i)
        |  WHERE length(text) > 0)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(start_pos AS BIGINT) AS start_pos,
        |  CAST(length(chunk) AS INT) AS chunk_len, md5(chunk) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),
    QueryDef("q_cdc_chunks", qCdcChunks, Some(
      s"""WITH $cdcChunkCtesSql
         |SELECT doc_id, chunk_ord, start, len, chunk_md5
         |FROM chunks ORDER BY doc_id, chunk_ord""".stripMargin)),
    QueryDef("q_dedup_chunks", qDedupChunks, Some(
      s"""WITH $cdcChunkCtesSql,
         |census AS (SELECT chunk_md5, count(DISTINCT doc_id) AS nd
         |           FROM chunks GROUP BY chunk_md5)
         |SELECT c.doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN census.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
         |  CAST(sum(CASE WHEN census.nd > 1 THEN c.len ELSE 0 END) AS BIGINT) AS shared_chars
         |FROM chunks c JOIN census USING (chunk_md5)
         |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)),
    QueryDef("q_domain_cap", qDomainCap, Some(
      s"""WITH q AS (SELECT doc_id, source, ${TextQueries.qualitySql} AS quality
         |           FROM documents),
         |r AS (SELECT source AS domain, doc_id, quality,
         |        row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rnk
         |      FROM q WHERE quality IS NOT NULL AND NOT isnan(quality))
         |SELECT domain, CAST(rnk AS INT) AS rnk, doc_id, quality
         |FROM r WHERE rnk <= 3 ORDER BY domain, rnk""".stripMargin)),
    QueryDef("q_decontaminated_corpus", qDecontaminatedCorpus, Some(
      s"""WITH t AS (SELECT doc_id, ${DedupQueries.shSql} AS sh FROM documents),
         |e AS (SELECT doc_id, sh FROM t WHERE doc_id % 50 = 0 AND len(sh) > 0),
         |tr AS (SELECT doc_id, sh FROM t WHERE doc_id % 50 <> 0 AND len(sh) > 0),
         |bad AS (SELECT DISTINCT tr.doc_id FROM tr, e
         |        WHERE len(list_intersect(tr.sh, e.sh)) >= 2)
         |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
         |WHERE d.doc_id % 50 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM bad)
         |ORDER BY d.doc_id""".stripMargin)),
    QueryDef("q_seq_pack", qSeqPack, Some(
      """WITH t AS (SELECT doc_id, len(string_split_regex(text, '\s+')) AS toks
        |           FROM documents),
        |c AS (SELECT doc_id, toks,
        |        CAST(COALESCE(sum(toks) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt
        |      FROM t WHERE toks > 0),
        |x AS (SELECT doc_id, toks, strt,
        |        unnest(range(strt // 512, (strt + toks - 1) // 512 + 1)) AS seq
        |      FROM c),
        |o AS (SELECT seq, least(strt + toks, (seq + 1) * 512)
        |             - greatest(strt, seq * 512) AS tok_in FROM x)
        |SELECT CAST(seq AS BIGINT) AS seq, count(*) AS n_docs,
        |  CAST(sum(tok_in) AS BIGINT) AS n_tokens
        |FROM o GROUP BY 1 ORDER BY seq""".stripMargin)),
    QueryDef("q_upsample", qUpsample, Some(
      """SELECT doc_id, CAST(unnest(range(1, CASE WHEN lang = 'en' THEN 1 ELSE 3 END + 1)) AS INT) AS copy, lang
        |FROM documents ORDER BY doc_id, copy""".stripMargin)),
    QueryDef("q_split_assign", qSplitAssign, Some(
      """SELECT doc_id,
        |  CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80 THEN 'train'
        |       WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("q_sample_stratified", qSampleStratified, Some(
      """SELECT doc_id, lang FROM documents
        |WHERE (doc_id * 2246822519 + 12345) % 4294967296 % 10000
        |      < CASE WHEN lang = 'en' THEN 2500 ELSE 10000 END
        |ORDER BY doc_id""".stripMargin)),
    QueryDef("q_token_shards", qTokenShards, Some(
      """WITH t AS (SELECT doc_id, len(string_split_regex(text, '\s+')) AS toks
        |           FROM documents),
        |c AS (SELECT doc_id, toks,
        |        COALESCE(sum(toks) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
        |      FROM t)
        |SELECT CAST(strt // 2000 AS BIGINT) AS shard, count(*) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1 ORDER BY shard""".stripMargin)),
    QueryDef("q_decontaminate", qDecontaminate, Some(
      s"""WITH t AS (SELECT doc_id, ${DedupQueries.shSql} AS sh FROM documents),
         |e AS (SELECT doc_id, sh FROM t WHERE doc_id % 50 = 0 AND len(sh) > 0),
         |tr AS (SELECT doc_id, sh FROM t WHERE doc_id % 50 <> 0 AND len(sh) > 0),
         |ov AS (SELECT tr.doc_id AS train_id, e.doc_id AS eval_id,
         |         len(list_intersect(tr.sh, e.sh)) AS n_overlap
         |       FROM tr, e)
         |SELECT train_id, eval_id, CAST(n_overlap AS BIGINT) AS n_overlap
         |FROM ov WHERE n_overlap >= 2 ORDER BY train_id, eval_id""".stripMargin)),
  )
}
