package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Job-level profile of one `SparkEntry.queries` entry: counts the
  * Spark jobs/stages/tasks one warm + one timed pass submits and the
  * wall time per job, so a driver-loop-bound entry (many small
  * sequential jobs) is distinguishable from a compute-bound one (few
  * jobs, high task time) without the UI. Diagnostic only — the driver
  * uses Verify (correctness) and Bench (timing).
  *
  * Usage: runMain graft.Profile <query_name>[,name2...] <sfDir>
  */
object Profile {

  private final class JobLog extends SparkListener {
    case class J(id: Int, start: Long, var end: Long = -1L,
        var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    override def onJobStart(js: SparkListenerJobStart): Unit =
      jobs.put(js.jobId, J(js.jobId, js.time))
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val j = jobs.get(je.jobId); if (j != null) j.end = je.time
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      // attribute the stage to the most recent covering job
      val j = jobs.values().stream()
        .filter(jj => jj.start <= si.submissionTime.getOrElse(Long.MaxValue))
        .max(java.util.Comparator.comparingLong(_.start))
      if (j.isPresent) {
        j.get.stages += 1
        j.get.tasks += si.numTasks
        j.get.taskMs += si.taskMetrics.executorRunTime
      }
    }
    def reset(): Unit = jobs.clear()
    def report(): String = {
      import scala.jdk.CollectionConverters._
      val js = jobs.values().asScala.toSeq.sortBy(_.id)
      val lines = js.map { j =>
        val wall = if (j.end < 0) -1.0 else (j.end - j.start) / 1e3
        f"  job ${j.id}%4d wall=${wall}%7.3f s stages=${j.stages}%3d tasks=${j.tasks}%5d taskRun=${j.taskMs / 1e3}%8.2f s"
      }
      val totWall = js.map(j => math.max(0L, j.end - j.start)).sum / 1e3
      (lines :+ f"  TOTAL jobs=${js.size} jobWall=${totWall}%.3f s tasks=${js.map(_.tasks).sum} taskRun=${js.map(_.taskMs).sum / 1e3}%.2f s").mkString("\n")
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate("graft-profile")
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def go(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = go()
      Thread.sleep(300) // let listener drain
      log.reset()
      val t = go()
      Thread.sleep(500)
      println(f"==== $name warm=$warm%.3f timed=$t%.3f ====")
      println(log.report())
      log.reset()
    }
    spark.stop()
  }
}
