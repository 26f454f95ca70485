package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join — extension operator (no reference counterpart;
  * SURVEY.md §2.3 notes the reference has only the equi hash join).
  *
  * For each left row, attach the payload of the latest right row with
  * `rightTime <= leftTime` for the same key.
  *
  * Implementation is the scalable union-and-carry-forward pattern rather
  * than a per-key nested loop:
  *   1. tag both inputs and union them (right rows carry a payload
  *      struct, left rows a null payload);
  *   2. one shuffle on the key, per-key sort by (time, side) — right
  *      before left at equal timestamps so an exactly-equal right row
  *      matches;
  *   3. `last(payload, ignoreNulls)` over the running frame carries the
  *      most recent right payload forward;
  *   4. keep left rows, unpack the struct.
  *
  * Cost at scale: ONE hash shuffle + per-partition sort (same as any
  * shuffled join) — no range join explosion, no broadcast requirement,
  * skew handled by AQE like any other Exchange.
  *
  * Determinism: if several right rows share (key, time), `last` picks the
  * final one in sort order, which is unspecified — pre-deduplicate the
  * right side (e.g. max_by payload per (key, time)) for reproducible
  * output.
  */
object AsOfJoin {

  def leftAsOf(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payloadCols: Seq[String]): DataFrame = {

    val payload = struct(payloadCols.map(right(_)): _*)
    val r = right.select(
      right(rightKey).as("_k"), right(rightTime).as("_t"),
      payload.as("_p"), lit(0).as("_side"))
    val payloadType = r.schema("_p").dataType

    val leftCols = left.columns.map(left(_))
    val l = left.select(leftCols :+ left(leftKey).as("_k") :+
      left(leftTime).as("_t") :+ lit(null).cast(payloadType).as("_p") :+
      lit(1).as("_side"): _*)

    // align schemas: right side gets nulls for the left's columns
    val rAligned = left.columns.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l.columns.map(col): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(rAligned)
      .withColumn("_match", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"_match.$c").as(c)): _*)
  }
}
