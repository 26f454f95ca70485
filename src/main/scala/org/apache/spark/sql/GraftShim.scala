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

  /** Full Arrow IPC STREAM encoding of `df`: one schema message, then
    * the executor-encoded record batches of [[toArrowBatches]] VERBATIM
    * (they are already encapsulated IPC record-batch messages — no
    * re-encode, no row materialization on the driver), then the
    * end-of-stream marker. Any Arrow implementation decodes it directly
    * — pyarrow: `pa.ipc.open_stream(payload).read_all()` — which is the
    * reference's exact wire contract: its fetch response is an Arrow
    * IPC buffer the Python client materializes to pandas
    * (`charmpandas/interface.py:23-33`). tools/pyclient.py drives the
    * Demo pipeline over this. */
  def toArrowStream(df: DataFrame): Array[Byte] = {
    import org.apache.arrow.vector.ipc.WriteChannel
    import org.apache.arrow.vector.ipc.message.MessageSerializer
    val out = new java.io.ByteArrayOutputStream()
    val ch = new WriteChannel(java.nio.channels.Channels.newChannel(out))
    val arrowSchema = org.apache.spark.sql.util.ArrowUtils.toArrowSchema(
      df.schema, df.sparkSession.sessionState.conf.sessionLocalTimeZone,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    MessageSerializer.serialize(ch, arrowSchema)
    toArrowBatches(df).foreach(ch.write)
    ch.writeIntLittleEndian(MessageSerializer.IPC_CONTINUATION_TOKEN)
    ch.writeIntLittleEndian(0)
    out.toByteArray
  }

  /** Decode Arrow record batches (as produced by [[toArrowBatches]])
    * back into a DataFrame, given the schema's JSON rendering. */
  def fromArrowBatches(spark: SparkSession, batches: Iterator[Array[Byte]],
      schemaJson: String): DataFrame =
    execution.arrow.ArrowConverters.toDataFrame(
      batches, schemaJson, spark.asInstanceOf[classic.SparkSession])
}
