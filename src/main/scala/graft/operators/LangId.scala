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
    val tg = train
      .select(trainLang.cast("string").as("g"),
        explode(grams(trainText, n)).as("tok"))
    val cg = tg.groupBy("g", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint() // model census: vocabulary/totals derive from it
    val vocab = cg.select(col("tok")).distinct().count()
    val ng = cg.groupBy("g").agg(sum(col("c")).as("n_g"))
    val prior = train.select(trainLang.cast("string").as("g"))
      .groupBy("g").agg(count(lit(1)).as("d_g"))
    val nDocs = train.count()
    val cand = ng.join(prior, "g")
      .select(col("g").as("cand"),
        (col("n_g") + lit(vocab)).cast("double").as("den"),
        log(col("d_g").cast("double") / lit(nDocs.toDouble))
          .cast("decimal(18,6)").as("lprior"))
    // spread the scored corpus before the heavy map chain (the
    // NaiveBayes.confusion lesson: AQE's byte-based coalescing folds
    // this sub-MB shuffle into one task while the cost is per-row
    // compute downstream)
    val sg = score
      .repartition(spark.sparkContext.defaultParallelism, scoreId)
      .select(scoreId.as("doc_id"), explode(grams(scoreText, n)).as("tok"))
    val ltok = sg
      .crossJoin(broadcast(cand))
      // the model census is (langs x grams)-sized by construction, but
      // localCheckpoint hides that from the planner (LogicalRDD, no
      // stats) — without the explicit broadcast the 2M-row scoring
      // fan-out sort-merge-joins against it (measured 15.3 s at sf0.1)
      .join(broadcast(cg.select(col("g").as("cand"), col("tok"), col("c"))),
        Seq("cand", "tok"), "left")
      .select(col("doc_id"), col("cand"),
        log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) / col("den"))
          .cast("decimal(18,6)").as("lp"))
      .groupBy(col("doc_id"), col("cand"))
      .agg(sum(col("lp")).as("ltok"))
    val scored = score.select(scoreId.as("doc_id"))
      .crossJoin(broadcast(cand.select(col("cand"), col("lprior"))))
      .join(ltok, Seq("doc_id", "cand"), "left")
      .select(col("doc_id"), col("cand"),
        (col("lprior") + coalesce(col("ltok"), lit(0).cast("decimal(28,6)")))
          .as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("cand").asc)
    scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("doc_id"), col("cand").as("lang"), col("score"))
  }
}
