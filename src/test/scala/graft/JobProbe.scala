package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-job wall-clock probe for registry queries: runs each query
  * (warm once, then timed) and prints every Spark job's duration,
  * call site, and max-stage task count, so a query's time can be
  * attributed to its driver actions (checkpoints, collects, counts,
  * broadcasts) and single-task stages surface. Dev tool only —
  *   `Test/runMain graft.JobProbe [sfDir] [q1,q2,...] [minMs]`
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("q_langid_nb").split(",").map(_.trim).filter(_.nonEmpty)
    val minMs = args.lift(2).map(_.toDouble).getOrElse(80.0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probeT0 = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(si =>
          si.name.take(60) + " | " + si.details.linesIterator
            .find(l => l.contains("graft") && !l.contains("JobProbe"))
            .getOrElse("").trim.take(80)).getOrElse("?")
        jobStages.put(j.jobId, j.stageInfos.map(_.stageId))
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stageTasks.put(s.stageInfo.stageId, s.stageInfo.numTasks)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, site) = starts.getOrDefault(j.jobId, (0L, "?"))
        val ms = (System.nanoTime() - t0) / 1e6
        val off = (t0 - probeT0.get()) / 1e6
        if (ms >= minMs) {
          val tasks = jobStages.getOrDefault(j.jobId, Seq.empty)
            .map(sid => stageTasks.getOrDefault(sid, -1))
          lines.add(f"[job] ${j.jobId}%4d start ${off}%9.1f  dur ${ms}%9.1f ms  tasks ${tasks.mkString("/")}  $site")
        }
      }
    })
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm
      lines.clear()
      val t0 = System.nanoTime()
      probeT0.set(t0)
      val df = fn(spark, dir)
      val buildMs = (System.nanoTime() - t0) / 1e6
      df.count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[probe] ===== $name TOTAL $total%.3f s (build $buildMs%.0f ms)")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
