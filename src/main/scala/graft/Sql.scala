package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ANSI SQL surface over the corpus (superset polish — the reference
  * has NO SQL string interface; its only "planner" is eager per-op
  * dispatch, SURVEY.md §3). Registering the tables as temp views makes
  * every engine capability reachable from `spark.sql(...)` strings,
  * and because views resolve to the SAME `Tables.read` DataFrames the
  * façade uses, both spellings meet in one Catalyst pipeline — the
  * optimized plans are identical, which SqlSurfaceSpec pins with
  * canonicalized-plan equality (no second oracle needed: a SQL string
  * IS the façade query after analysis).
  *
  * graft's native expressions (graft_dot, graft_tokens, …) are already
  * SQL-reachable via [[GraftExtensions]] function injection.
  */
object Sql {

  val tables: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register every `{dir}/{table}.parquet` of the corpus as a temp
    * view named after the table. Views go through [[sources.Tables.read]],
    * so the events `ts` vintage canonicalization applies identically to
    * SQL and façade reads. Tables absent from `dir` are skipped. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    tables.foreach { name =>
      val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(path))
        sources.Tables.read(spark, dir, name).createOrReplaceTempView(name)
    }

  /** Run a SQL string against the registered views (thin wrapper kept
    * for API symmetry with the façade's Table entry points). */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
