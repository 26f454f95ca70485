package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-rollup building blocks shared by the batch (q140) and
  * streaming (q142) maintenance paths — ONE spelling of the partials
  * and of the merge, so the two paths stay provably identical (both are
  * gated by the same full-recompute oracle; a drift between private
  * copies would silently break the claimed twin-hood).
  *
  * Partials are (count, exact scaled-cents sum) per (hour, event_type):
  * associative and commutative, so any grouping of the input into
  * batches merges to the same result, and the single final division
  * converts cents once.
  */
object Rollup {

  /** Hourly additive partials of an events slice. */
  def hourlyPartials(events: DataFrame): DataFrame = events
    .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
    .agg(count(lit(1)).as("cnt"),
      sum(graft.functions.DetMath.fixed(col("value"), 2)).as("cents"))

  /** Query-time merge: re-aggregate persisted partials — never raw
    * history — into the final rollup. */
  def mergePartials(spark: SparkSession, table: String): DataFrame =
    mergePartials(spark.table(table))

  /** [[mergePartials]] over an already-loaded partials frame — the
    * shape the streaming face (q142) uses now that its partials live in
    * a `batch_id=<bid>` Hive-layout directory rather than a table. */
  def mergePartials(partials: DataFrame): DataFrame =
    partials
      .groupBy("hr", "event_type")
      .agg(sum("cnt").as("cnt"),
        (sum("cents") / lit(100.0)).as("sum_val"))
}
