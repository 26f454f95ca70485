package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to `private[sql]` constructors needed to materialize a
  * DataFrame from a custom logical plan (graft.plans.ZipRows). Standard
  * technique for Spark extension libraries; nothing else lives in this
  * package. */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Arrow record-batch payloads of `df`, one byte[] per produced batch
    * — the IPC wire format the reference's fetch ships to its Python
    * client. Computation stays distributed; only the encoded batches
    * are collected (exactly what collectAsArrowToPython does). */
  def toArrowBatches(df: DataFrame): Array[Array[Byte]] =
    df.asInstanceOf[classic.Dataset[_]].toArrowBatchRdd.collect()

  /** Decode Arrow record batches (as produced by [[toArrowBatches]])
    * back into a DataFrame, given the schema's JSON rendering. */
  def fromArrowBatches(spark: SparkSession, batches: Iterator[Array[Byte]],
      schemaJson: String): DataFrame =
    execution.arrow.ArrowConverters.toDataFrame(
      batches, schemaJson, spark.asInstanceOf[classic.SparkSession])
}
