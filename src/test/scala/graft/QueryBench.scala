package graft

import org.apache.spark.sql.SparkSession

/** Generic same-JVM per-query repetition bench (the NbAbBench/WarcAbBench
  * precedent, generalized): times named registry queries with the exact
  * Bench methodology (same session confs, `.count()` action, one untimed
  * warmup), reporting min/med/max over N reps plus per-rep shuffle byte
  * deltas. Dev tool only —
  *   `Test/runMain graft.QueryBench [sfDir] [reps] [q1,q2,...]`
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val names = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q_knn_exact"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    val unknown = names.filterNot(qs.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def drain(): Unit =
      try org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      catch { case scala.util.control.NonFatal(_) => () }

    // warm every named query once (JIT + codegen + footer cache)
    names.foreach { n => try qs(n)(spark, dir).count() catch { case _: Throwable => () } }

    // interleave reps across queries so rig drift hits all alike
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val shuf = scala.collection.mutable.Map[String, (Long, Long)]()
    for (r <- 1 to reps; n <- names) {
      drain()
      val (r0, w0) = (shufRead.get(), shufWrite.get())
      val t0 = System.nanoTime()
      qs(n)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      drain()
      times(n) = times(n) :+ dt
      shuf(n) = (shufRead.get() - r0, shufWrite.get() - w0)
      if (r == reps) () // keep last rep's shuffle bytes
    }
    for (n <- names) {
      val ts = times(n).sorted
      val (sr, sw) = shuf(n)
      println(f"[qbench] $n%-28s min ${ts.head}%7.3f  med ${ts(ts.size / 2)}%7.3f  max ${ts.last}%7.3f s  shufR ${sr}%10d  shufW ${sw}%10d")
    }
    spark.stop()
  }
}
