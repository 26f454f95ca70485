package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev utility: run ONE inventory query end-to-end and print every
  * Spark job's wall-clock and every stage's task-time sum — the
  * guide-§1 "where is the time going" read when the UI is disabled.
  * Usage: tools/run.sh graft.tools.JobProbe <queryName> [sfDir] [cpus]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProbe <queryName> [sfDir] [cpus]")
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = graft.Graft.session(master = s"local[$cpus]",
      appName = "job-probe", shufflePartitions = cpus.toInt)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = Option(starts.get(j.jobId)).getOrElse(j.time)
        lines.add(f"job ${j.jobId}%3d  ${(j.time - t0) / 1000.0}%8.3f s")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val run = si.taskMetrics.executorRunTime / 1000.0
        lines.add(f"  stage ${si.stageId}%3d ${si.numTasks}%4d tasks  " +
          f"taskTime ${run}%8.2f s  ${si.name.takeWhile(_ != '\n').take(80)}")
      }
    })
    // warmup (codegen/session init) with a cheap query first
    graft.SparkEntry.queries("q05_groupby_sum")(spark, d)
      .write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    lines.clear()
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, d)
    val built = (System.nanoTime() - t0) / 1e9
    df.write.mode("overwrite").format("noop").save()
    val total = (System.nanoTime() - t0) / 1e9
    spark.stop()
    lines.forEach(println)
    println(f"[jobprobe] $name plan-build $built%.3f s total $total%.3f s")
  }
}
