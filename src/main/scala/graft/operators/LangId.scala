package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-n-gram language identification (extension — the PRODUCER
  * for the `lang` column the consensus/drift gates consume; until now
  * the fixture supplied it and the engine could only verify it):
  * Laplace-smoothed multinomial Naive Bayes over space-padded
  * character n-grams — the classical langid.py/TextCat shape — with
  * the [[NaiveBayes]] determinism convention: every per-gram
  * log-probability casts to DECIMAL(18,6) BEFORE the per-document
  * sum, so scoring is exact integer arithmetic in 1e-6 units whatever
  * the parallelism, and the argmax is decimal — no float merge-order
  * noise. Each ln's input is a ratio of exact integers, identical
  * cross-engine.
  *
  * Scale shape: the model is a (lang, gram) census — thousands of
  * rows per language, never corpus-sized — trained in one tokenize
  * pass; scoring fans each document's grams out to |langs| candidate
  * rows via a broadcast O(langs) candidate list and one LEFT join
  * against the model (missing grams score the unseen-mass term), one
  * decimal sum per (doc, lang), one argmax window. Train once, score
  * any corpus: the two frames are independent inputs.
  */
object LangId {

  /** Space-padded char n-grams, the pinned tokenizer: lowercase,
    * whitespace runs → `_`, one pad char each side, then every n-char
    * window. A text shorter than one window yields no grams (scored
    * on priors alone). */
  private[graft] def grams(text: Column, n: Int): Column = {
    val s0 = concat(lit("_"), regexp_replace(lower(text), "\\s+", "_"), lit("_"))
    // bind the padded string ONCE (single-element transform = a let):
    // a lambda body referencing the raw expression re-evaluates the
    // lower+regex+concat tree once PER GRAM — measured as the
    // dominant cost of the sf0.1 scoring pass
    element_at(transform(array(s0), s =>
      // guard: Spark's sequence(1, k) DESCENDS for k < 1 where the
      // intent (and the oracle's range()) is empty
      when(length(s) >= lit(n),
        transform(sequence(lit(1), length(s) - lit(n - 1)),
          i => s.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))), 1)
  }

  /** Train on `train`'s labeled text, classify every `score` row:
    * returns (doc_id, lang, score) — one argmax row per scored doc
    * (prior-only for gram-less docs; ties break to the smaller
    * language code). */
  def classify(train: DataFrame, trainLang: Column, trainText: Column,
      score: DataFrame, scoreId: Column, scoreText: Column,
      n: Int = 3): DataFrame = {
    val spark = train.sparkSession
    // spread the TRAIN corpus too (the scoring-side lesson applied to
    // the census pass): a single input file otherwise runs the whole
    // gram tokenize+count on one task — measured 1.69 s of the gate's
    // 3.3 s at sf0.1. Round-robin is safe here: the census is an
    // order-independent exact count
    val tg = train
      .repartition(graft.Spread.count(train))
      .select(trainLang.cast("string").as("g"),
        explode(grams(trainText, n)).as("tok"))
    val cg = tg.groupBy("g", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint() // model census: vocabulary/totals derive from it
    val ng = cg.groupBy("g").agg(sum(col("c")).as("n_g"))
    val prior = train.select(trainLang.cast("string").as("g"))
      .groupBy("g").agg(count(lit(1)).as("d_g"))
    // vocabulary size and train-doc total ride IN-PLAN as 1-row
    // cross-joined aggregates (vocab over the checkpointed census;
    // nDocs = Σ d_g since every train row lands in exactly one prior
    // group), so the ONE scoreWide collect computes everything — the
    // previous shape spent two extra driver actions (distinct().count()
    // and train.count()) plus their planning per call. Same longs, same
    // double division, same decimal cast — identical scores
    val cand = ng.join(prior, "g")
      .crossJoin(cg.agg(count_distinct(col("tok")).as("__v")))
      .crossJoin(prior.agg(sum(col("d_g")).as("__nd")))
      .select(col("g").as("cand"),
        (col("n_g") + col("__v")).cast("double").as("den"),
        log(col("d_g").cast("double") / col("__nd").cast("double"))
          .cast("decimal(18,6)").as("lprior"))
    // spread the scored corpus before the heavy map chain (the
    // NaiveBayes.confusion lesson: AQE's byte-based coalescing folds
    // this sub-MB shuffle into one task while the cost is per-row
    // compute downstream)
    val sg = score
      .repartition(graft.Spread.count(score), scoreId)
      .select(scoreId.as("doc_id"), explode(grams(scoreText, n)).as("tok"))
    // WIDE scoring (NaiveBayes.scoreWide — the shared pass): one
    // broadcast probe per gram against the gram-pivoted model, one
    // partial-aggregating groupBy(doc), map-side argmax — no ×|langs|
    // row fan-out and no window, with per-gram DECIMAL(18,6) casts
    // preserved so scores are the exact same decimals
    NaiveBayes.scoreWide(cand, cg,
      score.select(scoreId.as("doc_id")), sg)
      .select(col("doc_id"), col("predicted").as("lang"), col("score"))
  }
}
