package graft.tools

import org.apache.spark.sql.functions._

/** Dev utility: decompose the demo pipelines so the bench's numbers are
  * tuned and adjudicated from measurements, not guesses.
  *
  * Two modes:
  *   - width sweep (default, the original):  scan cost vs join+agg cost
  *     at several shuffle widths / AQE settings at 20M rows.
  *     Usage: tools/run.sh graft.tools.DemoProbe [nRows] [cpus]
  *   - `demo2m` bisect: the BASELINE.md flagship shape (2M-row
  *     two-string-key inner join → groupby-count → collect) in a FRESH
  *     session — no 26-query headline warmup — A/B'd over the join
  *     strategy preference, with per-run GC millis. Adjudicates whether
  *     a bench demo_2m move is JVM aging (fresh-session runs fast),
  *     join-strategy config (SHJ vs SMJ differ), or the machine
  *     (everything slow).
  *     Usage: tools/run.sh graft.tools.DemoProbe demo2m [nRows] [cpus] [reps]
  */
object DemoProbe {

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  def main(args: Array[String]): Unit =
    if (args.nonEmpty && args(0) == "demo2m") demo2m(args.drop(1))
    else widthSweep(args)

  /** Identical input shape to Bench.writeDemoInputs / the reference's
    * examples/datagen.py: all-distinct string keys, ~101 cities, right
    * side a permutation of the left keys. */
  private def writeInputs(spark: org.apache.spark.sql.SparkSession,
      n: Long, dir: String): Unit = {
    val userIds = spark.range(n).select(
      concat(lit("A"), col("id")).as("first_name"),
      concat(lit("B"), col("id")).as("last_name"),
      col("id").cast("int").as("user_id"),
      concat(lit("C"), pmod(hash(col("id")), lit(101))).as("city"))
    val perm = spark.range(n)
      .select(pmod(col("id") * 2654435761L + 12345L, lit(n)).as("pid"))
    val ages = perm.select(
      concat(lit("A"), col("pid")).as("first_name"),
      concat(lit("B"), col("pid")).as("last_name"),
      (col("pid") % 100).as("age"))
    userIds.write.mode("overwrite").parquet(s"$dir/u")
    ages.write.mode("overwrite").parquet(s"$dir/a")
  }

  private def timedDemo(spark: org.apache.spark.sql.SparkSession,
      dir: String): Double = {
    val t0 = System.nanoTime()
    val out = spark.read.parquet(s"$dir/u")
      .join(spark.read.parquet(s"$dir/a"),
        Seq("first_name", "last_name"), "inner")
      .groupBy("city").agg(count(col("user_id")).as("count(user_id)"))
      .collect()
    require(out.nonEmpty)
    (System.nanoTime() - t0) / 1e9
  }

  private def demo2m(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val cpus = if (args.length > 1) args(1) else "32"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.Graft.session(master = s"local[$cpus]",
      appName = "demo2m-probe", shufflePartitions = cpus.toInt)
    val dir = sys.props("java.io.tmpdir") + "/graft_demo2m_probe"
    writeInputs(spark, n, dir)
    // one untimed warmup absorbs codegen/session init exactly like
    // Bench's warmup query, so the A/B measures the plan, not the JIT
    timedDemo(spark, dir)
    for (preferShj <- Seq(true, false)) {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", (!preferShj).toString)
      val strat = if (preferShj) "shuffled-hash" else "sort-merge"
      for (i <- 1 to reps) {
        val g0 = gcMillis()
        val s = timedDemo(spark, dir)
        println(f"demo2m n=$n strat=$strat%-13s rep=$i ${s}%6.2f s gc=${gcMillis() - g0} ms")
      }
    }
    spark.stop()
  }

  private def widthSweep(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = graft.Graft.session(master = s"local[$cpus]",
      appName = "demo-probe", shufflePartitions = cpus.toInt)
    val dir = sys.props("java.io.tmpdir") + "/graft_demo_probe"
    writeInputs(spark, n, dir)

    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    t("scan users (count)") {
      spark.read.parquet(s"$dir/u").write.format("noop").mode("overwrite").save()
    }
    t("scan ages (count)") {
      spark.read.parquet(s"$dir/a").write.format("noop").mode("overwrite").save()
    }
    for (w <- Seq(cpus, "128", "256"); aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.shuffle.partitions", w)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      t(s"join+agg width=$w aqe=$aqe") {
        require(spark.read.parquet(s"$dir/u")
          .join(spark.read.parquet(s"$dir/a"),
            Seq("first_name", "last_name"), "inner")
          .groupBy("city").agg(count(col("user_id")))
          .collect().nonEmpty)
      }
    }
    spark.stop()
  }
}
