package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query job/stage breakdown: run named queries once (plus an
  * untimed warm pass when SPARK_GRAFT_WARM=1) and print every Spark
  * job's wall time and task-time sum, so a slow query separates into
  * "N sequential tiny jobs" (driver/scheduling bound) vs "one big
  * stage" (compute bound) vs "gaps" (driver-side planning/collect).
  * Diagnostic only — Bench stays the timing contract. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.quietCheckpointNoise()

    case class Job(id: Int, start: Long, var end: Long = -1L,
        var stages: Int = 0, var tasks: Int = 0, var taskTimeMs: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(e.jobId) = Job(e.jobId, e.time) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          jobs.values.lastOption.foreach { j => j.stages += 1 }
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          // attribute to the most recent open job (local mode, serial)
          jobs.values.find(j => j.end < 0).orElse(jobs.values.lastOption)
            .foreach { j =>
              j.tasks += 1
              if (e.taskInfo != null)
                j.taskTimeMs += (e.taskInfo.finishTime - e.taskInfo.launchTime)
            }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val names = args.filter(graft.SparkEntry.queries.contains)
    val warm = sys.env.get("SPARK_GRAFT_WARM").contains("1")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      if (warm) { fn(spark, sfDir).count(); spark.catalog.clearCache(); System.gc() }
      jobs.synchronized { jobs.clear() }
      val t0 = System.nanoTime()
      val cnt = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc()
      println(f"===== $n: wall $wall%.3f s, rows $cnt =====")
      val snap = jobs.synchronized { jobs.values.toSeq }
      var prevEnd = -1L
      snap.foreach { j =>
        val gap = if (prevEnd > 0) f"${(j.start - prevEnd) / 1e3}%.2f" else "-"
        prevEnd = j.end
        println(f"  job ${j.id}%4d wall ${(j.end - j.start) / 1e3}%7.2f s  " +
          f"stages ${j.stages}%3d tasks ${j.tasks}%5d taskSum ${j.taskTimeMs / 1e3}%8.2f s  gapBefore $gap s")
      }
      val jobWall = snap.map(j => j.end - j.start).sum / 1e3
      println(f"  jobs ${snap.size}, jobWallSum $jobWall%.2f s, outsideJobs ${wall - jobWall}%.2f s")
    }
    spark.stop()
  }
}
