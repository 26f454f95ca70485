package graft.tools

/** Dev utility: print ONE inventory query's formatted physical plan and
  * the partition counts of its scan/source RDD lineage — the follow-up
  * read when a scale sweep flags a query (sized-by-bytes scans vs
  * compute-heavy operators show up here as a 1-2 partition source
  * feeding an explosion). Usage:
  *   tools/run.sh graft.tools.PlanDump <queryName> [sfDir] [cpus]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName> [sfDir] [cpus]")
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = graft.Graft.session(master = s"local[$cpus]",
      appName = "plan-dump", shufflePartitions = cpus.toInt)
    val df = graft.SparkEntry.queries(name)(spark, d)
    df.explain("formatted")
    println(s"[plandump] result rdd partitions = ${df.rdd.getNumPartitions}")
    spark.stop()
  }
}
