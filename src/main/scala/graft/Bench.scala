package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    // per-query shuffle volume: wall-clock in the fixed-cost regime
    // hides data-movement growth, so record task-level shuffle
    // read/write deltas alongside the timings (the scale sweep flags
    // super-linear BYTES growth too)
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
    // listener events are async: drain before each snapshot so deltas
    // attribute to the query that ran them. Drains happen OUTSIDE the
    // timed window — the wait is instrumentation cost, not query cost.
    def drain(): Unit =
      try org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      catch { case scala.util.control.NonFatal(_) => () }
    // one untimed warmup pass: JVM/JIT + codegen compilation + parquet
    // footer caching are session costs, not per-query engine cost
    sorted.foreach { case (_, fn) =>
      try fn(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val rowCounts = scala.collection.mutable.LinkedHashMap[String, Long]()
    val shuffles = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
    val results = sorted.flatMap { case (name, fn) =>
      drain()
      val (r0, w0) = (shufRead.get(), shufWrite.get())
      val t0 = System.nanoTime()
      try {
        rowCounts(name) = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        drain()
        shuffles(name) = (shufRead.get() - r0, shufWrite.get() - w0)
        Some(name -> dt)
      } catch {
        // NonFatal only: a dying JVM (OOM, interrupt) must kill the
        // bench loudly, not mask itself as one query's error and
        // mis-attribute the next query's shuffle delta
        case scala.util.control.NonFatal(e) =>
          errors(name) = e.getClass.getSimpleName
          None
      }
    }
    // STDOUT gets the COMPACT line (times at 3dp + errors only): the
    // round-5/6 full line (rows + shuffle bytes) grew past what the
    // driver capture keeps intact, truncating mid-record and losing the
    // per-query times. The full detail still lands in the JSON file.
    // Locale.ROOT: a non-dot-decimal default locale must not emit
    // "0,123" into the JSON
    def fmt(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", d)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // the FULL file keeps raw doubles — sub-ms queries must not
    // truncate to 0.000 in the line the scale sweep consumes
    val qsFull = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val rows = rowCounts.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val shufR = shuffles.map { case (k, v) => s"\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    val shufW = shuffles.map { case (k, v) => s"\"" + k + "\":" + v._2 }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val compact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
        s""""errors":$errs,"sf":"$sfDir","detail":"/tmp/graft_bench.json"}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"rows":$rows,""" +
        s""""shuffle_read":$shufR,"shuffle_write":$shufW,"errors":$errs,"sf":"$sfDir"}"""
    println(compact)
    // persist the full line: stdout can be lost to log truncation when
    // the harness captures only a tail
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_bench.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
