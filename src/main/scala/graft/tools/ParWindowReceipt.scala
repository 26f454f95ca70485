package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Receipt runner for the ParWindow gate (r17): at a beyond-gate scale
  * (sf1, 60M lineitem rows), run q22's exact projection through BOTH
  * physical plans — the classic single-exchange window (gateRows =
  * MaxValue) and the chunk-parallel two-phase merge (gateRows = 0) —
  * and adjudicate FULL-ROW equality via count + bit_xor(xxhash64(*))
  * (commutative, overflow-free), plus the wall-time comparison that
  * justifies the gate's direction. Usage:
  *   tools/run.sh graft.tools.ParWindowReceipt [sfDir] [cpus]
  */
object ParWindowReceipt {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/tmp/sf1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = graft.Graft.session(master = s"local[$cpus]",
      appName = "parwindow-receipt", shufflePartitions = cpus.toInt)

    def q22shape(gate: Long): DataFrame =
      graft.operators.ParWindow.runningWindow(
          graft.sources.Tables.read(spark, d, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_returnflag",
              "l_extendedprice", "l_quantity"),
          "l_returnflag",
          Seq(("l_extendedprice", false), ("l_orderkey", true),
            ("l_linenumber", true)),
          lagCol = "l_quantity",
          sumCol = graft.functions.DetMath.fixed(col("l_quantity"), 2),
          rnName = "rn", rkName = "rk", prevName = "prev_qty",
          runName = "_rc", gateBytes = gate)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("rn"), col("rk"), col("prev_qty"),
          (col("_rc") / 100.0).as("run_qty"))

    def timeNoop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def rowHash(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(df.columns.map(col): _*))).head()
      (r.getLong(0), r.getLong(1))
    }

    val li0 = graft.sources.Tables.read(spark, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag",
        "l_extendedprice", "l_quantity")
    val n = li0.count()
    println(s"[parwindow-receipt] corpus $d lineitem rows = $n, " +
      s"input sizeInBytes estimate = " +
      s"${li0.queryExecution.optimizedPlan.stats.sizeInBytes} " +
      s"(gate = ${graft.operators.ParWindow.GateBytes} bytes -> " +
      (if (li0.queryExecution.optimizedPlan.stats.sizeInBytes <=
           BigInt(graft.operators.ParWindow.GateBytes)) "CLASSIC"
       else "PARALLEL") + " at default gate)")

    // warm the page cache evenly with one uncounted scan
    graft.sources.Tables.read(spark, d, "lineitem").write
      .mode("overwrite").format("noop").save()

    val tClassic = timeNoop(q22shape(Long.MaxValue))
    spark.catalog.clearCache()
    val tPar = timeNoop(q22shape(0L))
    spark.catalog.clearCache()
    val (cn, ch) = rowHash(q22shape(Long.MaxValue))
    spark.catalog.clearCache()
    val (pn, ph) = rowHash(q22shape(0L))
    println(f"[parwindow-receipt] classic wall $tClassic%.1f s | " +
      f"parallel wall $tPar%.1f s")
    println(s"[parwindow-receipt] classic rows=$cn xor=$ch | " +
      s"parallel rows=$pn xor=$ph | " +
      s"FULL-ROW ${if (cn == pn && ch == ph) "IDENTICAL" else "MISMATCH"}")
    spark.stop()
  }
}
