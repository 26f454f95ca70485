package graft.tools

/** Dev utility: run ONE inventory query end-to-end and time it.
  * Materializes through the noop sink (no driver-side gather — a
  * collect() here would OOM on large results and time the gather, not
  * the query). Usage: tools/run.sh graft.tools.QueryProbe <queryName> [sfDir] [cpus]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: QueryProbe <queryName> [sfDir] [cpus]")
      sys.exit(2)
    }
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2) else "4"
    val spark = graft.Graft.session(master = s"local[$cpus]",
      appName = "query-probe", shufflePartitions = cpus.toInt)
    val reps = if (args.length > 3) args(3).toInt else 1
    for (i <- 1 to reps) {
      // query CONSTRUCTION stays inside the timer: iterative operators
      // (pageRank, k-means) run eager lineage-cut actions while the
      // plan is being built, exactly as Bench times them
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, d)
      df.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$name run $i in $secs%.3f s (noop-materialized)")
    }
    spark.stop()
  }
}
