package graft.tools

/** Dev utility: run ONE inventory query end-to-end and time it.
  * Usage: tools/run.sh graft.tools.QueryProbe <queryName> [sfDir] [cpus]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2) else "4"
    val spark = graft.Graft.session(master = s"local[$cpus]",
      appName = "query-probe", shufflePartitions = cpus.toInt)
    val t0 = System.nanoTime()
    val out = graft.SparkEntry.queries(name)(spark, d).collect()
    println(s"$name rows=${out.length} in ${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
