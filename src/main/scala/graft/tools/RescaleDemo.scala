package graft.tools

import org.apache.spark.sql.functions._

/** Demonstrated rescale — the reference's elastic shrink/expand as a
  * scripted receipt, not just a config preset.
  *
  * The reference's server handles shrink/expand requests by migrating
  * chares and restarting on a new PE set (`src/server.hpp:26-49`), and
  * its client auto-shrinks the job after an inactivity timeout and
  * re-expands on the next request (`charmpandas/interface.py:415-461`).
  * Spark's spelling of the same contract is dynamic allocation +
  * decommissioning (Graft.elasticity): the cluster manager retires idle
  * executors (shrink-on-inactivity) and requests new ones when load
  * returns (expand-on-demand), with shuffle/RDD blocks migrated off
  * retiring executors.
  *
  * This main PROVES the behavior on a `local-cluster[2,2,1024]` master
  * (real separate executor JVMs, unlike local[N]):
  *   1. run a query with 2 executors up → record the result;
  *   2. go idle past the inactivity timeout → poll until the executor
  *      count DROPS (the reference's auto-shrink);
  *   3. run the same query again → dynamic allocation re-requests
  *      executors; assert the count GREW back and the result is
  *      IDENTICAL to step 1 (rescale is invisible to query semantics).
  *
  * Prints one JSON receipt line and writes it to target/rescale.json.
  * Timeouts are tightened (4s idle) so the demo runs in ~30s; on a real
  * cluster the same preset runs with production timeouts.
  *
  * Usage: tools/run.sh graft.tools.RescaleDemo [sfDir]
  */
object RescaleDemo {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rescale_ckpt")
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = graft.Graft.session(
      master = "local-cluster[2,2,1024]",
      appName = "graft-rescale",
      shufflePartitions = 8,
      extra = graft.Graft.elasticityWith(ckpt.toString) ++ Map(
        // local-cluster executors are separate JVMs launched from the
        // Spark dist — ship the engine classes to them
        "spark.executor.extraClassPath" -> classes,
        "spark.executor.memory" -> "512m",
        // the demo's inactivity timeout (reference default is minutes;
        // 4s keeps the receipt cheap). shuffleTracking.timeout too:
        // executors holding shuffle files are otherwise kept alive.
        "spark.dynamicAllocation.executorIdleTimeout" -> "4s",
        "spark.dynamicAllocation.cachedExecutorIdleTimeout" -> "4s",
        "spark.dynamicAllocation.shuffleTracking.timeout" -> "4s",
        "spark.dynamicAllocation.schedulerBacklogTimeout" -> "1s",
        "spark.dynamicAllocation.minExecutors" -> "0",
        "spark.dynamicAllocation.initialExecutors" -> "2",
        "spark.dynamicAllocation.maxExecutors" -> "2"))
    try {
      val sc = spark.sparkContext
      // statusTracker counts the driver too — executors = infos - 1
      def executors(): Int = sc.statusTracker.getExecutorInfos.length - 1
      def await(label: String, deadlineSec: Int)(cond: Int => Boolean): Int = {
        val t0 = System.nanoTime()
        var n = executors()
        while (!cond(n) && (System.nanoTime() - t0) / 1e9 < deadlineSec) {
          Thread.sleep(500); n = executors()
        }
        require(cond(n), s"$label: executor count stuck at $n")
        n
      }

      def query(): Array[(String, Long)] = {
        val li = graft.sources.Tables.read(spark, sfDir, "lineitem")
        li.groupBy("l_returnflag")
          .agg(sum("l_quantity").cast("long").as("sum_qty"))
          .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      }

      val up0 = await("startup", 90)(_ >= 1)
      val r1 = query()
      val busy = executors()
      // 2. inactivity shrink: no work submitted; idle+shuffle timeouts
      //    retire every executor (minExecutors=0)
      val shrunk = await("shrink", 60)(_ == 0)
      // 3. expand on demand: the next query re-requests executors
      val r2 = query()
      val grown = executors()
      require(grown >= 1, s"expand: executor count still $grown")
      require(r1.sameElements(r2),
        s"rescale changed results: ${r1.toSeq} vs ${r2.toSeq}")
      val receipt =
        s"""{"master":"local-cluster[2,2,1024]","executors_at_start":$up0,
           |"executors_busy":$busy,"executors_after_idle":$shrunk,
           |"executors_after_requery":$grown,"results_match":true,
           |"rows":${r1.length}}""".stripMargin.replace("\n", "")
      println(receipt)
      val p = java.nio.file.Paths.get("target/rescale.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, receipt.getBytes("UTF-8"))
    } finally spark.stop()
  }
}
