package graft.tools
object Q75Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session(master = "local[4]", appName = "q75probe", shufflePartitions = 4)
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val t0 = System.nanoTime()
    val out = graft.SparkEntry.queries("q75_embed_dup_clusters")(spark, d).collect()
    println(s"q75 rows=${out.length} in ${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}
