package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * perplexity quality filter (Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data", LREC 2020): rank
  * documents by how probable their token stream is under a language
  * model, then keep/bucket by score. Real deployments train KenLM on a
  * clean reference corpus; this operator implements the same pipeline
  * shape with an add-one-smoothed bigram model trained ON the corpus —
  * fully deterministic and SQL-expressible, so the whole train + score
  * path sits under the DuckDB oracle gate (extension — the reference
  * has no text ops at all).
  *
  * Scale design (100 TB): the model IS two count tables —
  * C(w1) = bigram-prefix occurrences and C(w1,w2) = bigram occurrences
  * — built with map-side-combined hash aggregations, then joined back
  * to the bigram stream on their keys. Nothing collects: the count
  * tables are corpus-derived (they grow with vocabulary), so they join
  * as shuffles on the token keys — AQE broadcasts them when genuinely
  * small. Per-document aggregation is decimal-exact: each bigram's
  * log-probability casts to DECIMAL(18,6) FIRST (deterministic per
  * row — the repo-wide BM25/unigram convention), then sums exactly —
  * the total is order-independent at any parallelism, which is what
  * lets DuckDB replay it hash-exact.
  */
object NgramLm {

  /** Per-document average bigram log-probability under the
    * add-one-smoothed corpus bigram model:
    * P(w2|w1) = (C(w1,w2) + 1) / (C(w1) + V), V = |corpus vocabulary|.
    * Output: (idCol, n_bigrams, avg_logp) — one row per document with
    * at least one bigram (sub-2-token docs have no bigram stream to
    * score), avg_logp = floor(Σ decimal(ln P) / n · 1e4) / 1e4,
    * ascending more surprising. */
  def bigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val base = docs.select(col(idCol), toks.as("toks"))
    // the bigram stream: one row per (doc, position) — the explode is
    // map-only and linear in corpus tokens
    val pairs = base.select(
        col(idCol),
        explode(zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (x, y) => struct(x.as("w1"), y.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c1 = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // vocabulary size: one exact distinct over ALL tokens (bigram
    // suffix-only vocabularies undercount leading words); a single
    // O(1) row that cross-joins in broadcast
    val v = base.select(explode(col("toks")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val lp: Column = log((col("c2") + lit(1.0d)) / (col("c1") + col("v")))
    pairs
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col(idCol), lp.cast("decimal(18,6)").as("c"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("c")).cast("double").as("lp"))
      .select(col(idCol), col("n_bigrams"),
        (floor(col("lp") / col("n_bigrams") * 10000.0) / 10000.0).as("avg_logp"))
  }

  /** Pointwise-mutual-information collocation census (Church & Hanks
    * '90) — the standard detector for multi-word units ("new york")
    * that tokenizer/vocab decisions read: pmi(w₁,w₂) =
    * ln( P(w₁w₂) / (P(w₁)·P(w₂)) ) with bigram probability over the
    * bigram total and unigram probabilities over the token total.
    * The ratio assembles from EXACT integer counts in double (all
    * products stay below 2⁵³ at any fixture scale — counts are
    * per-corpus, not per-key-squared) and only THEN takes one ln,
    * floored to 4dp — the [[bigramLogProb]] convention that absorbs
    * cross-engine libm ulps. `minCount` floors bigram support (PMI is
    * noise for rare pairs); output is the top-`k` by (pmi DESC, w₁,
    * w₂).
    *
    * Scale: two map-side-combined count aggregates + token-key joins,
    * the same linear shape as [[bigramLogProb]]; the two scalar
    * totals broadcast. */
  def pmiTop(docs: DataFrame, minCount: Long, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minCount >= 1 && k >= 1, "minCount and k must be >= 1")
    val toks = tokens(col(textCol))
    val base = docs.select(col(idCol), toks.as("toks"))
    val pairs = base.select(
        explode(zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (x, y) => struct(x.as("w1"), y.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val uni = base.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cu"))
    val totals = pairs.agg(count(lit(1)).as("nbig"))
      .crossJoin(base.select(explode(col("toks")).as("tok"))
        .agg(count(lit(1)).as("ntok")))
    val ratio = (col("c2").cast("double") * col("ntok") * col("ntok")) /
      (col("nbig").cast("double") * col("cu1") * col("cu2"))
    c2.filter(col("c2") >= minCount)
      .join(uni.select(col("tok").as("w1"), col("cu").as("cu1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("cu").as("cu2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c2"),
        (floor(log(ratio) * 10000.0) / 10000.0).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Distinctive vocabulary per group — the log-odds ratio with an
    * informative Dirichlet prior (Monroe, Colaresi & Quinn '08,
    * "Fightin' Words" §3.5: the statistic that replaced raw TF-IDF
    * for "what words characterize THIS source vs the rest", because
    * the prior shrinks rare-word noise and the z-scaling undoes the
    * frequency-variance confound). Per (group, token):
    * δ = ln((y_g+α)/(n_g+a0−y_g−α)) − ln((y_r+α)/(n_r+a0−y_r−α)),
    * z = δ/√(1/(y_g+α) + 1/(y_r+α)), α = a0·y_all/n_all — assembled
    * from EXACT integer counts in double, two lns + one sqrt per key,
    * floored once to 4dp (the [[pmiTop]] libm convention); ranking
    * uses the FLOORED z with the token tiebreak so both engines pick
    * identical top-k rows. Output: top-`k` per group by (z DESC,
    * token).
    *
    * Scale shape: ONE tokenize pass into a map-side-combined
    * (group, token) census; the global token census and both totals
    * DERIVE from that census (no second corpus scan); one token-key
    * join against the model-sized global census + one broadcast of
    * the O(groups) totals; final top-k is a window over the
    * group-partitioned vocabulary. */
  def distinctiveTerms(docs: DataFrame, group: Column, textCol: Column,
      a0: Double, minCount: Long, k: Int): DataFrame = {
    require(a0 > 0, s"prior mass a0 must be > 0, got $a0")
    require(minCount >= 1 && k >= 1, "minCount and k must be >= 1")
    val tok = docs
      .select(group.cast("string").as("g"), explode(tokens(textCol)).as("tok"))
    val cg = tok.groupBy("g", "tok").agg(count(lit(1)).as("yg"))
      .localCheckpoint() // three derived censuses read it
    val callT = cg.groupBy("tok").agg(sum(col("yg")).as("ya"))
      .filter(col("ya") >= minCount)
    val ng = cg.groupBy("g").agg(sum(col("yg")).as("ng"))
    val nAll = cg.agg(sum(col("yg")).as("na"))
    val alpha = lit(a0) * col("ya").cast("double") / col("na")
    val ygD = col("yg").cast("double")
    val yrD = (col("ya") - col("yg")).cast("double")
    val ngD = col("ng").cast("double")
    val nrD = (col("na") - col("ng")).cast("double")
    val delta =
      log((ygD + alpha) / (ngD + lit(a0) - ygD - alpha)) -
        log((yrD + alpha) / (nrD + lit(a0) - yrD - alpha))
    val z = delta / sqrt(lit(1.0) / (ygD + alpha) + lit(1.0) / (yrD + alpha))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("z").desc, col("tok").asc)
    cg.join(callT, "tok")
      .join(broadcast(ng), "g")
      .crossJoin(nAll) // 1-row frame
      .select(col("g"), col("tok"), col("yg"),
        (floor(z * 10000.0) / 10000.0).as("z"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("g").as("group"), col("rank"), col("tok").as("token"),
        col("yg").as("n_in_group"), col("z"))
  }
}
