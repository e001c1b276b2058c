package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al., ACL 2016) — the
  * tokenizer-training primitive of an LLM data pipeline (extension; the
  * reference has no text surface at all).
  *
  * Scale shape: the ONLY corpus-scale stage is the word census (one
  * map-side-combined hash aggregate); every merge round then operates
  * on the censused VOCABULARY — the bounded model artifact (sub-linear
  * in the corpus), exactly how production BPE trainers consume a
  * 100 TB corpus. Per round: one pair-count aggregate over the vocab,
  * one O(1)-row argmax collect (count DESC, pair ASC — deterministic),
  * one map-only merge rewrite. All arithmetic is exact integer counts,
  * so every round replays bit-for-bit in a SQL oracle.
  *
  * Word representation: characters space-separated with a trailing
  * `</w>` end-of-word token (`"low"` → `"l o w </w>"`). A merge
  * (a, b) rewrites `" a b "` → `" ab "` on the space-padded form —
  * the space sentinels make token boundaries explicit, and both
  * engines' `replace` scan left-to-right non-overlapping, which IS
  * the classic BPE greedy application order.
  */
object Bpe {

  /** One BPE merge step. */
  final case class Merge(step: Int, left: String, right: String, cnt: Long)

  /** The space-separated character form with the `</w>` marker. */
  def spacedForm(word: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(regexp_replace(word, "(.)", "$1 "), lit("</w>"))

  /** The `(word-form, cnt)` vocabulary census of a text column —
    * the single corpus-scale aggregate. */
  def vocabCensus(df: DataFrame, text: org.apache.spark.sql.Column): DataFrame =
    df.select(explode(split(text, " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(spacedForm(col("tok")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Learn `nMerges` merges from a vocabulary census. Returns the
    * merge table in order; each round's argmax collects exactly one
    * row (count DESC, left ASC, right ASC). Rounds short-circuit when
    * no pair remains (fully merged vocabulary). */
  def learnMerges(vocab0: DataFrame, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = vocab0.sparkSession
    var vocab = vocab0.localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val toks = vocab.select(split(col("w"), " ").as("t"), col("cnt"))
      val pairs = toks
        .filter(size(col("t")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("a"),
            element_at(col("t"), i + 1).as("b")))).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("s"))
      val best = pairs.orderBy(col("s").desc, col("a"), col("b")).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, s) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(step, a, b, s)
        vocab = vocab.select(
            trim(replace(concat(lit(" "), col("w"), lit(" ")),
              lit(s" $a $b "), lit(s" $a$b "))).as("w"),
            col("cnt"))
          .localCheckpoint()
        step += 1
      }
    }
    merges.toSeq
  }

  /** End-to-end: census + merges as a DataFrame gate surface. */
  def learn(df: DataFrame, text: org.apache.spark.sql.Column,
      nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    learnMerges(vocabCensus(df, text), nMerges).toDF()
      .select(col("step"), col("left"), col("right"), col("cnt"))
  }

  /** Apply a learned merge table to one spaced word form — the ENCODE
    * side of the tokenizer: the merge list is the bounded driver-side
    * model artifact, folded in order into a chain of codegen'd
    * `replace` expressions (each with the same space-sentinel
    * left-to-right contract the trainer used), so encoding is
    * map-only at any corpus size and encodes UNSEEN words by
    * construction. */
  def applyMerges(spaced: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column =
    merges.foldLeft(spaced)((c, m) =>
      trim(replace(concat(lit(" "), c, lit(" ")),
        lit(s" ${m.left} ${m.right} "), lit(s" ${m.left}${m.right} "))))

  /** Encode a text column into sub-word tokens under a merge table:
    * one row per (doc token occurrence, sub-word token). */
  def encode(df: DataFrame, text: org.apache.spark.sql.Column,
      merges: Seq[Merge]): DataFrame =
    df.select(explode(split(text, " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(explode(split(applyMerges(spacedForm(col("tok")), merges), " "))
        .as("subtok"))
}
