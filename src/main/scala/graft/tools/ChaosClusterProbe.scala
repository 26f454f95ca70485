package graft.tools

import org.apache.spark.sql.functions._

/** Streaming kill/restart chaos under REAL executor JVMs — the last
  * single-JVM-only evidence class (VERDICT r15 optional 7).
  *
  * StreamingSpec proves the checkpoint-recovery contracts (a stream
  * killed after N committed micro-batches restarts at the first
  * uncommitted batch, replaying none and skipping none) on `local[4]`,
  * where state-store files, checkpoint offsets and shuffle blocks
  * never cross a process boundary. This probe replays the two
  * ADDITIVE-lattice cases — the family with zero tolerance for commit
  * drift, since partial counts/sums are associative but NOT
  * idempotent — under `local-cluster[2,16,...]`: two separate executor
  * JVMs, real task serialization, real shuffle transport.
  *
  *   - q142 rollup lattice (count + scaled-cents sum partials,
  *     [[graft.streaming.EventStreams.incrementalRollupStream]]),
  *     chaos-killed after 3 committed batches, vs the one-shot batch
  *     recompute.
  *   - q273 CMS lattice (cell SUMs,
  *     [[graft.streaming.EventStreams.incrementalCmsStream]]), same
  *     kill, vs the one-shot sketch — a single replayed batch would
  *     inflate cells and move the heavy-hitter estimates.
  *
  * Prints one JSON line per case plus a trailing summary line.
  *
  * Usage: tools/run.sh graft.tools.ChaosClusterProbe [sfDir]
  * (SPARK_GRAFT_MASTER overrides the default local-cluster[2,16,8192];
  *  SPARK_GRAFT_EXEC_MEM sizes the executor JVMs.)
  */
object ChaosClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val master =
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,16,8192]")
    val spark = graft.Graft.session(
      master = master,
      appName = "graft-chaos-cluster-probe",
      shufflePartitions = 8,
      extra = Map(
        "spark.executor.extraClassPath" ->
          new java.io.File("target/scala-2.13/classes").getAbsolutePath,
        "spark.executor.memory" ->
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "4g")))
    import graft.streaming.EventStreams
    var fails = 0

    def leg(name: String)(run: => (Long, Long, Long)): Unit = {
      val t0 = System.nanoTime()
      val (rows, extra, missing) =
        try run catch { case e: Throwable =>
          System.err.println(s"[chaos] $name crashed: $e")
          (-1L, -1L, -1L)
        }
      val secs = (System.nanoTime() - t0) / 1e9
      val ok = rows > 0 && extra == 0 && missing == 0
      if (!ok) fails += 1
      println(s"""{"probe":"chaos_cluster","case":"$name","master":"$master",""" +
        s""""sf":"$sfDir","rows":$rows,"extra_vs_oneshot":$extra,""" +
        s""""missing_vs_oneshot":$missing,"ok":$ok,""" +
        s""""secs":${(secs * 1000).round / 1000.0}}""")
    }

    leg("rollup_additive_kill3") {
      val merged = EventStreams.incrementalRollupStream(
        spark, sfDir, maxFilesPerTrigger = Some(1), deltaFiles = 8,
        chaosKillAfter = Some(3))
      val full = graft.sources.Tables.read(spark, sfDir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          (sum(graft.functions.DetMath.fixed(col("value"), 2)) / lit(100.0))
            .as("sum_val"))
      (merged.count(), merged.exceptAll(full).count(),
        full.exceptAll(merged).count())
    }

    leg("cms_sum_kill3") {
      import graft.operators.Sketches
      import graft.operators.Sketches.{CmsDefD, CmsDefW}
      val merged = EventStreams.incrementalCmsStream(
        spark, sfDir, maxFilesPerTrigger = Some(1), deltaFiles = 6,
        chaosKillAfter = Some(3))
      val toks = graft.sources.Tables.read(spark, sfDir, "documents")
        .select(explode(expr(
          graft.functions.TextExpr.toksSpark("text"))).as("tok"))
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      val oneShot = Sketches.cmsEstimate(exact.select("tok"), "tok",
          Sketches.cmsBuild(toks, "tok", CmsDefD, CmsDefW),
          CmsDefD, CmsDefW)
        .join(exact, "tok")
        .orderBy(col("est").desc, col("tok")).limit(20)
      (merged.count(), merged.exceptAll(oneShot).count(),
        oneShot.exceptAll(merged).count())
    }

    println(s"""{"probe":"chaos_cluster","summary":true,""" +
      s""""master":"$master","failed_cases":$fails}""")
    // teardown races on local-cluster must not flip the exit code
    try spark.stop() catch { case e: Throwable =>
      System.err.println(s"[chaos] spark.stop() failed (ignored): $e")
    }
    if (fails > 0) sys.exit(1)
  }
}
