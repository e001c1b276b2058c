package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job wall-clock probe for one registry query: runs the query
  * (warm once, then timed) and prints every Spark job's duration and
  * call site, so a query's time can be attributed to its driver
  * actions (checkpoints, collects, counts, broadcasts). Dev tool only —
  *   `Test/runMain graft.JobProbe [sfDir] [query]`
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q_langid_nb")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, dir).count() // warm
    val probeT0 = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(si =>
          si.name.take(60) + " | " + si.details.linesIterator
            .find(l => l.contains("graft") && !l.contains("JobProbe"))
            .getOrElse("").trim.take(80)).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, site) = starts.getOrDefault(j.jobId, (0L, "?"))
        val ms = (System.nanoTime() - t0) / 1e6
        val off = (t0 - probeT0.get()) / 1e6
        lines.add(f"[job] ${j.jobId}%4d start ${off}%9.1f  dur ${ms}%9.1f ms  $site")
      }
    })
    val t0 = System.nanoTime()
    probeT0.set(t0)
    val df = fn(spark, dir)
    println(f"[job] build done at ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
    df.count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    lines.forEach(l => println(l))
    println(f"[job] TOTAL $total%.3f s for $name")
    spark.stop()
  }
}
