package graft.tools

/** Dev instrument: print [[graft.operators.Par.widen]]'s decision —
  * Catalyst size estimate, planned scan partitions, fired-or-not —
  * for the text/vector operator-head tables at each corpus scale.
  * This is the receipt behind the widen FLOOR placement (SURVEY §6
  * r14): the gate corpus (~0.6 MB heads) must pass through untouched
  * (the r14 A/B measured the floorless widen costing ~20 s across the
  * sf0.1 suite for zero benefit), while sf1 (~5 MB) and sf10 (~60 MB)
  * single-row-group files must widen (q135 at sf1: 61.2 s unwidened
  * vs 7.7 s widened).
  *
  * Usage: tools/run.sh graft.tools.WidenProbe [sfDir ...]
  */
object WidenProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session(appName = "widen-probe")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10")
    for (sf <- dirs if new java.io.File(sf).isDirectory) {
      for (t <- Seq("documents", "embeddings")) {
        val df = graft.sources.Tables.read(spark, sf, t)
        val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
        val out = graft.operators.Par.widen(df)
        println(s"""{"probe":"widen","sf":"$sf","table":"$t",""" +
          s""""est_bytes":$est,"planned":${df.rdd.getNumPartitions},""" +
          s""""widened":${!(out eq df)}}""")
      }
    }
    spark.stop()
  }
}
