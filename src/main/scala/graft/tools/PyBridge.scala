package graft.tools

import org.apache.spark.sql.functions._

/** Engine side of the Python client bridge (tools/pyclient.py).
  *
  * The reference's user-facing artifact is a Python pandas client that
  * drives the engine and receives results as Arrow IPC record batches
  * (`charmpandas/interface.py:23-33` decodes the fetch payload to
  * pandas; `examples/Demo.ipynb` is the published workflow:
  * read_parquet → merge on two string keys → groupby count → get).
  * This main reproduces exactly that contract on graft: it runs the
  * pipeline THROUGH THE Table FAÇADE (the user API, not raw Spark) and
  * ships the result as one Arrow IPC STREAM — executor-encoded batches,
  * schema header, EOS — that `pyarrow.ipc.open_stream` reads directly.
  *
  * Modes:
  *  - `demo <workDir> [nRows]` — generate the Demo tables (same shapes
  *    as Bench's demo gate / examples/datagen.py: n-row users with two
  *    string key columns + int id + low-card city; a permuted ages
  *    table with the same keys), run merge→groupby-count via the
  *    façade, write `<workDir>/result.arrows`. The inputs stay in
  *    `<workDir>/{users,ages}` so the client can replay the same query
  *    in its DuckDB oracle over the identical files.
  *  - `facade <sfDir> <workDir>` — run q66's five-op pandas-façade
  *    chain (set_column → fillna → astype → rename → value_counts /
  *    groupby-sum → merge) on the driver corpus and ship the result;
  *    the client re-runs the SAME chain in real pandas and asserts
  *    frame equality — the façade-parity contract, driven end to end
  *    from Python.
  *
  * Output protocol (stdout, last line): one JSON object with the mode,
  * result row count, and pipeline seconds — mirroring the Demo
  * notebook's "Total time" print.
  */
object PyBridge {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PyBridge demo <workDir> [nRows] | " +
      "facade <sfDir> <workDir>")
    val spark = graft.Graft.session(appName = "graft-pybridge")
    val (mode, workDir, payload, rows, secs) = args(0) match {
      case "demo" =>
        val work = args(1)
        val n = if (args.length > 2) args(2).toLong else 2000000L
        // identical input shapes to Bench's demo gate (which mirrors
        // examples/datagen.py): two string join keys, full-match perm
        val users = spark.range(n).select(
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
        users.write.mode("overwrite").parquet(s"$work/users")
        ages.write.mode("overwrite").parquet(s"$work/ages")
        val t0 = System.nanoTime()
        // the Demo pipeline, through the user façade: read_parquet →
        // merge on 2 string keys → groupby count → get (as Arrow)
        val result = graft.Table.readParquet(spark, s"$work/users")
          .merge(graft.Table.readParquet(spark, s"$work/ages"),
            on = Seq("first_name", "last_name"), how = "inner")
          .groupby("city").agg("user_id" -> "count")
        val bytes = result.getArrowStream()
        val dt = (System.nanoTime() - t0) / 1e9
        ("demo", work, bytes, result.count(), dt)
      case "facade" =>
        val (sf, work) = (args(1), args(2))
        val t0 = System.nanoTime()
        val result = graft.Table(
          graft.SparkEntry.queries("q66_pandas_facade")(spark, sf))
        val bytes = result.getArrowStream()
        val dt = (System.nanoTime() - t0) / 1e9
        ("facade", work, bytes, result.count(), dt)
      case other => sys.error(s"unknown mode $other")
    }
    new java.io.File(workDir).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$workDir/result.arrows"), payload)
    println(s"""{"mode":"$mode","rows":$rows,"secs":$secs,""" +
      s""""payload_bytes":${payload.length}}""")
    spark.stop()
  }
}
