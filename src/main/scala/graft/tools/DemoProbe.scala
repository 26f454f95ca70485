package graft.tools

import org.apache.spark.sql.functions._

/** Dev utility: decompose the demo_20m pipeline — scan cost vs
  * join+agg cost at several shuffle widths — so the bench's scale-up
  * line is tuned from measurements, not guesses.
  * Usage: tools/run.sh graft.tools.DemoProbe [nRows] [cpus]
  */
object DemoProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = graft.Graft.session(master = s"local[$cpus]",
      appName = "demo-probe", shufflePartitions = cpus.toInt)
    val dir = sys.props("java.io.tmpdir") + "/graft_demo_probe"

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
        val out = spark.read.parquet(s"$dir/u")
          .join(spark.read.parquet(s"$dir/a"),
            Seq("first_name", "last_name"), "inner")
          .groupBy("city").agg(count(col("user_id")))
          .collect()
        require(out.nonEmpty)
      }
    }
    spark.stop()
  }
}
