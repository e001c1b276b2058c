package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM stage A/B for the NB scoring rewrite (the WarcAbBench
  * precedent): times the OLD fanned-out scoring pipeline against the
  * NEW wide pivoted one over the identical sf fixture, interleaved
  * reps, noop sink. Dev tool only — `Test/runMain graft.NbAbBench
  * [sfDir]`. */
object NbAbBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions.tokens

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tok = docs
      .repartition(32, col("doc_id"))
      .select(col("doc_id"), col("source").cast("string").as("g"),
        explode(tokens(col("text"))).as("tok"))
    val cg = tok.groupBy("g", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val vocab = cg.select(col("tok")).distinct().count()
    val ng = cg.groupBy("g").agg(sum(col("c")).as("n_g"))
    val prior = docs.select(col("source").cast("string").as("g")).groupBy("g")
      .agg(count(lit(1)).as("d_g"))
    val nDocs = docs.count()
    val cand = ng.join(prior, "g")
      .select(col("g").as("cand"),
        (col("n_g") + lit(vocab)).cast("double").as("den"),
        log(col("d_g").cast("double") / lit(nDocs.toDouble))
          .cast("decimal(18,6)").as("lprior"))
        .localCheckpoint()

    // OLD shape, FULL query: model build + ×|groups| fan-out + window
    def oldScored(): DataFrame = {
      val tok = docs
        .repartition(32, col("doc_id"))
        .select(col("doc_id"), col("source").cast("string").as("g"),
          explode(tokens(col("text"))).as("tok"))
      val cg = tok.groupBy("g", "tok").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val vocab = cg.select(col("tok")).distinct().count()
      val ng = cg.groupBy("g").agg(sum(col("c")).as("n_g"))
      val prior = docs.select(col("source").cast("string").as("g")).groupBy("g")
        .agg(count(lit(1)).as("d_g"))
      val nDocs = docs.count()
      val cand = ng.join(prior, "g")
        .select(col("g").as("cand"),
          (col("n_g") + lit(vocab)).cast("double").as("den"),
          log(col("d_g").cast("double") / lit(nDocs.toDouble))
            .cast("decimal(18,6)").as("lprior"))
      val ltok = tok
        .crossJoin(broadcast(cand))
        .join(broadcast(cg.select(col("g").as("cand"), col("tok"), col("c"))),
          Seq("cand", "tok"), "left")
        .select(col("doc_id"), col("cand"),
          log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) / col("den"))
            .cast("decimal(18,6)").as("lp"))
        .groupBy(col("doc_id"), col("cand"))
        .agg(sum(col("lp")).as("ltok"))
      val scored = docs
        .select(col("doc_id"), col("source").cast("string").as("g"))
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

    // NEW shape, FULL query: the production confusion() end to end
    def newScored(): DataFrame =
      graft.operators.NaiveBayes.confusion(
        docs, col("doc_id"), col("source"), col("text"))

    // stage-isolated: just the token->sums aggregate of each shape
    def oldSums(): DataFrame = tok
      .crossJoin(broadcast(cand))
      .join(broadcast(cg.select(col("g").as("cand"), col("tok"), col("c"))),
        Seq("cand", "tok"), "left")
      .select(col("doc_id"), col("cand"),
        log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) / col("den"))
          .cast("decimal(18,6)").as("lp"))
      .groupBy(col("doc_id"), col("cand"))
      .agg(sum(col("lp")).as("ltok"))

    def time(name: String, mk: () => DataFrame, reps: Int = 5): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"[nbab] $name%-10s min ${ts.min}%8.1f  med ${ts.sorted.apply(reps / 2)}%8.1f  max ${ts.max}%8.1f ms")
    }

    // warm both once
    time("warm-old", oldScored, 1)
    time("warm-new", newScored, 1)
    for (_ <- 1 to 2) {
      time("OLD-full", oldScored)
      time("NEW-full", newScored)
      time("OLD-sums", oldSums)
    }
    spark.stop()
  }
}
