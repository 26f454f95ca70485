package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-gated operator inventory: every operator from
  * SURVEY.md §2 (plus the LLM-pipeline extension ops) appears as one entry,
  * with a DuckDB-equivalent SQL oracle in `oracleSql` keyed identically.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 — the reference Demo.ipynb
    * pipeline shape (join → groupby-count); driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q27_demo_pipeline")(spark, "/root/testdata/sf0.001")

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Temporal.queries ++
      graft.queries.TextDedup.queries ++
      graft.queries.Vectors.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.Ranges.queries ++
      graft.queries.Fingerprints.queries ++
      graft.queries.Shapes.queries ++
      graft.queries.Pipelines.queries ++
      graft.queries.Ingest.queries ++
      graft.queries.Curation.queries ++
      graft.queries.Graphs.queries

  lazy val oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Temporal.oracles ++
      graft.queries.TextDedup.oracles ++
      graft.queries.Vectors.oracles ++
      graft.queries.Analytics.oracles ++
      graft.queries.Ranges.oracles ++
      graft.queries.Fingerprints.oracles ++
      graft.queries.Shapes.oracles ++
      graft.queries.Pipelines.oracles ++
      graft.queries.Ingest.oracles ++
      graft.queries.Curation.oracles ++
      graft.queries.Graphs.oracles
}
