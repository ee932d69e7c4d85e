package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool: run one declared query a few times and print per-job wall
  * times plus per-stage task/shuffle metrics — the measure-first
  * microscope for multi-job iterative queries, where a suite-level
  * per-query number cannot say whether the time went to compute,
  * shuffle, or driver-side planning between jobs.
  * Usage: runMain graft.JobProfile <sfDir> <query> [trials]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      println("usage: runMain graft.JobProfile <sfDir> <query> [trials]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val name = args(1)
    val trials = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.getOrCreate()
    // (jobId, wallNanos) in completion order; stage rows carry the
    // executor-side aggregates Spark already collected per task set.
    val jobs = mutable.ArrayBuffer.empty[(Int, Long)]
    val stages = mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Long, Long, String)]
    val jobStart = mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart(js.jobId) = System.nanoTime()
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach(t => jobs += ((je.jobId, System.nanoTime() - t)))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += ((si.stageId,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          si.numTasks.toLong, si.name))
      }
    })
    for (t <- 1 to trials) {
      jobs.clear(); stages.clear(); jobStart.clear()
      val start = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - start) / 1e9
      // Let straggler listener events drain before reading the buffers.
      Thread.sleep(300)
      val jobSum = jobs.map(_._2).sum / 1e9
      println(f"== trial $t: $name total $total%.3f s, ${jobs.size} jobs, " +
        f"job-wall sum $jobSum%.3f s (gap = driver/planning ${total - jobSum}%.3f s)")
      jobs.sortBy(_._1).foreach { case (id, dur) =>
        println(f"  job $id%4d ${dur / 1e9}%8.3f s")
      }
      println("  top stages by wall ms (stage, wall ms, exec-run ms, shuf-read, shuf-write, tasks, name):")
      stages.sortBy(-_._2).take(20).foreach {
        case (id, wall, run, sr, sw, n, nm) =>
          println(f"  stage $id%4d $wall%6d ms run=$run%6d ms sr=$sr%9d B sw=$sw%9d B tasks=$n%3d  ${nm.take(90)}")
      }
    }
    spark.stop()
  }
}
