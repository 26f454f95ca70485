package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Continuous ingest with near-dup admission — the streaming face of
  * the incremental dedup family (Dedup.writeBandIndex /
  * incrementalPairs / admitBatch).
  *
  * Each micro-batch of documents is dedup'd against the PERSISTED
  * corpus state (band index + admitted-docs store), the admitted rows
  * land in the corpus store, and their minhash bands are APPENDED to
  * the band index — so later batches dedup against everything admitted
  * before them, exactly like a daily batch pipeline but per
  * micro-batch. foreachBatch is the right seam: the admission decision
  * is a batch computation (joins + anti-joins), and Spark hands each
  * micro-batch to it exactly-once per epoch.
  *
  * Scale shape per micro-batch: the batch's bands equi-join the
  * bucketed index (only the batch moves — zero corpus-side exchange),
  * verification reads texts only for candidate ids, and the index
  * append is a batch-sized bucketed write. Corpus size affects only
  * the (pre-bucketed, pruned) index probe, not a recompute.
  */
object IngestStream {

  /** Start the admission stream. `docs` is a STREAMING frame with at
    * least (idCol, textCol); `bandTable` must exist (create it with
    * Dedup.writeBandIndex over the initial corpus — possibly empty);
    * admitted docs accumulate under `corpusPath`. Batches must carry
    * ids disjoint from already-admitted ones (ingest ids are unique by
    * construction upstream). */
  def start(docs: DataFrame, bandTable: String, corpusPath: String,
      checkpointPath: String, idCol: String, textCol: String,
      k: Int = 8, rows: Int = 2, threshold: Double = 0.5,
      nBuckets: Int = 32): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col(idCol), col(textCol)).cache()
        try {
          val corpus = corpusDocs(spark, corpusPath, idCol, textCol)
          val pairs = Dedup.incrementalPairs(b, bandTable,
            corpus.unionByName(b), idCol, textCol, k, rows, threshold)
          val admitted = Dedup.admitBatch(b, pairs, idCol).cache()
          admitted.write.mode("append").parquet(corpusPath)
          // grow the index with the admitted docs' bands so the NEXT
          // micro-batch dedups against them; nBuckets MUST match the
          // writeBandIndex build so appended files keep the
          // bucket-pruned probe path
          Dedup.bandTable(admitted, idCol, textCol, k, rows)
            .write.mode("append")
            .bucketBy(nBuckets, "bi", "bv").sortBy("bi", "bv")
            .format("parquet").saveAsTable(bandTable)
          admitted.unpersist()
          ()
        } finally b.unpersist()
      }
      .start()

  /** Admitted-corpus reader: empty-but-typed before the first batch. */
  private def corpusDocs(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, textCol: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      spark.read.parquet(path).select(col(idCol), col(textCol))
    else
      spark.emptyDataFrame
        .withColumn(idCol, lit(0L)).withColumn(textCol, lit(""))
        .limit(0)
  }
}
