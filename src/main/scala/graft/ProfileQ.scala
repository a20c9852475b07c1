package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job profile of one query run: job count, per-job wall time, task
  * counts — the "where do the seconds go" readout for iterative queries
  * whose cost is spread over many tiny jobs. Dev tool, not driver surface.
  *
  * Run: sbt "runMain graft.ProfileQ <sfDir> <name> [name...]"
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.local("graft-profile")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.mutable.ArrayBuffer[(Int, Double, String)]()
    var stageTasks = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = jobs.remove(j.jobId)
        if (st != null)
          done.synchronized {
            done += ((j.jobId, (System.nanoTime() - st._1) / 1e9, st._2))
          }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stageTasks += s.stageInfo.numTasks
    })
    for (name <- args.drop(1)) {
      done.synchronized(done.clear())
      stageTasks = 0
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val snap = done.synchronized(done.toSeq.sortBy(_._1))
      println(f"[profile] $name wall=$wall%.2f s jobs=${snap.size} tasks=$stageTasks")
      snap.foreach { case (id, sec, desc) =>
        println(f"[profile]   job $id%4d $sec%7.3f s  ${desc.take(80)}")
      }
    }
    spark.stop()
  }
}
