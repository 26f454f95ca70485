package graft.tools

/** Dev utility: print ONE inventory query's formatted physical plan and
  * the partition counts of its scan/source RDD lineage — the follow-up
  * read when a scale sweep flags a query (sized-by-bytes scans vs
  * compute-heavy operators show up here as a 1-2 partition source
  * feeding an explosion). Usage:
  *   tools/run.sh graft.tools.PlanDump <queryName> [sfDir] [cpus] [exec]
  *
  * With the 4th arg `exec`, the query is ALSO materialized through the
  * noop sink and the FINAL executed plan printed — the one AQE
  * re-optimized at runtime. Static explain under AQE shows the initial
  * plan only (isFinalPlan=false), which can NOT show runtime effects
  * like exchange/stage reuse (guide §7.2): q226's two canonically
  * identical scan+distinct subtrees print twice statically but
  * execute once (the second reads the first's shuffle as a reused
  * stage) — only the executed plan proves it.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName> [sfDir] [cpus] [exec]")
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = graft.Graft.session(master = s"local[$cpus]",
      appName = "plan-dump", shufflePartitions = cpus.toInt)
    val df = graft.SparkEntry.queries(name)(spark, d)
    df.explain("formatted")
    println(s"[plandump] result rdd partitions = ${df.rdd.getNumPartitions}")
    if (args.length > 3 && args(3) == "exec") {
      // run THIS QueryExecution's plan (a df.write would clone the plan
      // into its own QE, leaving this one unexecuted / isFinalPlan=false)
      // — foreachPartition over the internal rows is the no-gather drive
      val qe = df.queryExecution
      qe.executedPlan.execute()
        .foreachPartition((_: Iterator[_]) => ())
      println("== Executed Plan (AQE final) ==")
      println(qe.executedPlan.toString.take(20000))
    }
    spark.stop()
  }
}
