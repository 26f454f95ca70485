package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (dev iteration
    // on a subset; the driver always runs the full inventory)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.session(
      master = s"local[$cpus]",
      appName = "graft-verify",
      shufflePartitions = cpus.toInt)
    new java.io.File(outDir).mkdirs()
    // Submit queries concurrently: most are small jobs, so overlapping
    // them keeps the local cores busy instead of serializing 51 rounds
    // of job-submission latency. Spark actions are thread-safe.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // Failures are DATA, not just stderr: a throwing query writes a 1-row
    // error-marker parquet under its own output name (the downstream
    // compare then reports a red row instead of silent absence — the r7
    // lesson, where 9 analysis-time errors showed up as missing rows) and
    // lands in errors.json for the gate to print verbatim.
    val errs = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val futures = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      scala.concurrent.Future {
        // Plain multi-file write: no coalesce(1) funnel — at sf0.1+ a
        // single-task write serializes the whole result through one core;
        // pyarrow/duckdb read part-file directories natively.
        try fn(spark, sfDir).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          errs.put(name, String.valueOf(e.toString).take(800))
          try {
            import spark.implicits._
            Seq(String.valueOf(e.toString).take(800)).toDF("graft_error")
              .write.mode("overwrite").parquet(s"$outDir/$name")
          } catch { case _: Throwable => () }
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // a filtered dev run dumps only the matching oracle entries so
    // tools/check.py gates exactly the subset that was produced
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    import scala.jdk.CollectionConverters._
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errs.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
