package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Dev-loop stage profiler: run ONE registered query (`graft.ProfileQuery
  * <sfDir> <queryName> [nRuns]`) under a stage listener and print each
  * stage's wall time, task count, shuffle read/write and spill — the
  * "where do the seconds go" view the bench total hides. Results are
  * fully consumed via `.count()`-style foreach (no parquet write, so the
  * numbers isolate compute+shuffle from the output sink). Not part of
  * the driver contract; purely a builder tool. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))

    final case class St(id: Int, nameLine: String, ms: Long, tasks: Int,
        shufReadMB: Double, shufWriteMB: Double, spillMB: Double,
        recordsRead: Long)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += St(si.stageId, si.name.linesIterator.next(),
            (for (a <- si.completionTime; b <- si.submissionTime) yield a - b)
              .getOrElse(-1L),
            si.numTasks,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
            m.inputMetrics.recordsRead)
        }
      }
    })

    for (r <- 1 to runs) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before printing
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      println(f"== run $r: $name -> $n rows in $sec%.3f s ==")
      val snap = stages.synchronized(stages.sortBy(-_.ms).toVector)
      snap.take(20).foreach { s =>
        println(f"  stage ${s.id}%4d ${s.ms}%6d ms  tasks=${s.tasks}%3d  " +
          f"shufR=${s.shufReadMB}%8.1f MB shufW=${s.shufWriteMB}%8.1f MB " +
          f"spill=${s.spillMB}%7.1f MB inRec=${s.recordsRead}%9d  ${s.nameLine}")
      }
      println(f"  [${snap.size} stages, sum ${snap.map(_.ms).sum / 1000.0}%.2f s stage-time]")
    }
    spark.stop()
  }
}
