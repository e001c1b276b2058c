package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Multinomial Naive Bayes over token counts (extension — the
  * provenance/contamination diagnostic): train per-group token models
  * on the corpus, score every document against every group, and
  * census the confusion matrix. A source whose documents the model
  * can't tell from another source's is a mixing/labeling problem the
  * pipeline wants surfaced BEFORE per-source curation thresholds are
  * trusted.
  */
object NaiveBayes {

  /** Resubstitution confusion census: Laplace-smoothed multinomial NB
    * — P(tok|g) = (c_gt + 1)/(n_g + V), prior P(g) = docs_g/docs —
    * scored as log sums, predicted = argmax (ties → smaller group
    * name), output `(group, predicted, n)`.
    *
    * Determinism: each per-token log-probability casts to
    * DECIMAL(18,6) FIRST, so the per-document sum is exact integer
    * arithmetic in 1e-6 units whatever the parallelism, and the
    * argmax compares decimals — no float merge-order noise anywhere
    * (the [[NgramLm.bigramLogProb]] convention). Each ln's INPUT is a
    * ratio of exact integers, identical in both engines.
    *
    * Scale shape: one tokenize pass feeds the MODEL census, and the
    * vocabulary size, per-group totals, and priors all DERIVE from
    * it; SCORING runs its own tokenize pass (inherent, not waste —
    * in production the scored corpus is a different dataset than the
    * training one). Scoring fans each document token out to |groups|
    * candidate rows (the standard NB scoring shape — classes are a
    * bounded census), via a broadcast of the O(groups) candidate
    * list and one token-key LEFT join against the model (missing
    * (group, token) pairs score the unseen-mass term, which is why
    * the join must be left). One decimal sum per (doc, candidate),
    * one argmax window over |groups| rows per doc, one census. */
  def confusion(docs: DataFrame, id: Column, group: Column, textCol: Column)
      : DataFrame = {
    // spread the corpus before the heavy map chain (tokenize → ×|groups|
    // fan-out → ln + decimal cast): a single input file would otherwise
    // run the whole scoring pass on one task (measured 4.7 s of the
    // gate's 6.3 s at sf0.1). The partition count is EXPLICIT because
    // AQE's byte-based coalescing folds this sub-MB shuffle back into
    // one partition — the cost here is per-row compute downstream, not
    // input bytes, exactly what the advisory-size heuristic can't see.
    val tok = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, id)
      .select(id.as("doc_id"), group.cast("string").as("g"),
        explode(tokens(textCol)).as("tok"))
    val cg = tok.groupBy("g", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint() // model table: vocabulary/totals derive from it
    val vocab = cg.select(col("tok")).distinct().count()
    val ng = cg.groupBy("g").agg(sum(col("c")).as("n_g"))
    val prior = docs.select(group.cast("string").as("g")).groupBy("g")
      .agg(count(lit(1)).as("d_g"))
    val nDocs = docs.count()
    // candidate table: one row per group carrying its smoothing
    // denominator and decimal log-prior — O(groups), broadcast
    val cand = ng.join(prior, "g")
      .select(col("g").as("cand"),
        (col("n_g") + lit(vocab)).cast("double").as("den"),
        log(col("d_g").cast("double") / lit(nDocs.toDouble))
          .cast("decimal(18,6)").as("lprior"))
    // per-(doc, candidate) token log-likelihood; a document whose text
    // tokenizes to zero tokens (NULL text) has no rows here
    val ltok = tok
      .crossJoin(broadcast(cand))
      .join(cg.select(col("g").as("cand"), col("tok"), col("c")),
        Seq("cand", "tok"), "left")
      .select(col("doc_id"), col("cand"),
        log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) / col("den"))
          .cast("decimal(18,6)").as("lp"))
      .groupBy(col("doc_id"), col("cand"))
      .agg(sum(col("lp")).as("ltok"))
    // score from a doc x candidate base so token-less documents are
    // scored on priors alone (ltok = 0) instead of silently vanishing
    // from the confusion census — every doc contributes exactly one
    // predicted row and per-group row sums equal the group's doc count
    val scored = docs
      .select(id.as("doc_id"), group.cast("string").as("g"))
      .crossJoin(broadcast(cand.select(col("cand"), col("lprior"))))
      .join(ltok, Seq("doc_id", "cand"), "left")
      .select(col("doc_id"), col("g"), col("cand"),
        (col("lprior") + coalesce(col("ltok"), lit(0).cast("decimal(28,6)")))
          .as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("cand").asc)
    scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .groupBy(col("g").as("group"), col("cand").as("predicted"))
      .agg(count(lit(1)).as("n"))
  }
}
