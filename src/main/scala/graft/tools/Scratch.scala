package graft.tools

/** Throwaway A/B harness (dev only): noop-materialize lshKnnJoin under
  * several bandings in one JVM, bracketing drift. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session(appName = "scratch-ab")
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def run(tag: String, nBits: Int, bandBits: Int): Unit = {
      val t0 = System.nanoTime()
      graft.operators.Similarity
        .lshKnnJoin(e, "vec_id", "embedding", 3, nBits, bandBits)
        .write.mode("overwrite").format("noop").save()
      println(f"[ab] $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
    }
    run("16/4 a", 16, 4)
    run("32/8  ", 32, 8)
    run("36/9  ", 36, 9)
    run("16/4 b", 16, 4)
    spark.stop()
  }
}
