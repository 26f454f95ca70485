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

  /** `direction`: "backward" (latest right with rightTime <= leftTime,
    * the default), "forward" (earliest right with rightTime >=
    * leftTime), or "nearest" (whichever of the two is closer in
    * absolute time; equidistant ties go BACKWARD, pandas merge_asof's
    * `<=` rule) — pandas merge_asof's direction parameter. The forward
    * pass is the same one-shuffle carry pattern traversed in reverse
    * time order (right still before left at equal timestamps, so an
    * exactly-equal right row matches either way). "nearest" computes
    * BOTH carries inside the one unioned pass — two window orderings
    * over the same key partitioning, so still ONE Exchange (two
    * per-partition sorts) — then picks per-row by gap; time columns
    * must be timestamps (the gap compare needs µs arithmetic).
    *
    * `toleranceMicros`: maximum |leftTime - matched rightTime|; a
    * nearest match farther away yields null payloads instead (pandas
    * tolerance semantics — correct to apply post-match, since in either
    * direction the nearest candidate is the only one that could be in
    * tolerance). Time columns must be timestamps when a tolerance is
    * given. */
  def leftAsOf(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payloadCols: Seq[String], direction: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    if (direction == "nearest")
      return leftAsOfNearest(left, leftKey, leftTime, right, rightKey,
        rightTime, payloadCols, toleranceMicros)

    // the carried struct also records the matched right TIME so a
    // tolerance can invalidate far-away matches after the carry
    val payload = struct(
      payloadCols.map(right(_)) :+ right(rightTime).as("_rt"): _*)
    val r = right.select(
      right(rightKey).as("_k"), right(rightTime).as("_t"),
      payload.as("_p"), lit(0).as("_side"))
    val payloadType = r.schema("_p").dataType

    val leftCols = left.columns.map(left(_))
    val l = left.select(leftCols :+ left(leftKey).as("_k") :+
      left(leftTime).as("_t") :+ lit(null).cast(payloadType).as("_p") :+
      lit(1).as("_side"): _*)

    // align schemas: right side gets nulls for the left's columns.
    // Null-TIME right rows are dropped — they sort to a frame edge and
    // would otherwise be carried as matches, where pandas/SQL semantics
    // give them to no one.
    val rAligned = left.columns.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .filter(col("_t").isNotNull)
      .select(l.columns.map(col): _*)

    val timeOrd =
      if (direction == "backward") col("_t").asc else col("_t").desc
    val w = Window.partitionBy(col("_k"))
      .orderBy(timeOrd, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(rAligned)
      .withColumn("_match", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    // a null-TIME left row matches nothing (it sorts to a frame edge —
    // under desc ordering its frame would span every right row);
    // pandas merge_asof yields no match for NaT
    val timeKnown = col("_t").isNotNull
    val valid = toleranceMicros match {
      case None => timeKnown && col("_match").isNotNull
      case Some(tol) =>
        // cast: tolerates TIMESTAMP_NTZ time columns (unix_micros only
        // accepts TIMESTAMP; the session is pinned UTC so the cast is
        // value-stable)
        val (lt, rt) = (unix_micros(col("_t").cast("timestamp")),
          unix_micros(col("_match._rt").cast("timestamp")))
        val gap = if (direction == "backward") lt - rt else rt - lt
        timeKnown && col("_match").isNotNull && gap <= tol
    }
    matched.select(left.columns.map(col) ++
      payloadCols.map(c => when(valid, col(s"_match.$c")).as(c)): _*)
  }

  /** direction="nearest": both carries in the one unioned pass. The
    * backward window orders (time asc, right-before-left) and carries
    * the last payload; the forward window orders (time asc,
    * LEFT-before-right) and takes the first payload in the FOLLOWING
    * frame — at equal timestamps the right row lands inside each
    * frame, so an exact-time match is found from either side. Same key
    * partitioning for both windows → one Exchange, two sorts. */
  private def leftAsOfNearest(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payloadCols: Seq[String],
      toleranceMicros: Option[Long]): DataFrame = {
    val payload = struct(
      payloadCols.map(right(_)) :+ right(rightTime).as("_rt"): _*)
    val r = right.select(
      right(rightKey).as("_k"), right(rightTime).as("_t"),
      payload.as("_p"), lit(0).as("_side"))
    val payloadType = r.schema("_p").dataType

    val leftCols = left.columns.map(left(_))
    val l = left.select(leftCols :+ left(leftKey).as("_k") :+
      left(leftTime).as("_t") :+ lit(null).cast(payloadType).as("_p") :+
      lit(1).as("_side"): _*)
    val rAligned = left.columns.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .filter(col("_t").isNotNull)
      .select(l.columns.map(col): _*)

    val wB = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val lt = unix_micros(col("_t").cast("timestamp"))
    val gapB = lt - unix_micros(col("_mb._rt").cast("timestamp"))
    val gapF = unix_micros(col("_mf._rt").cast("timestamp")) - lt
    // pandas nearest: backward wins when gapB <= gapF (merge.py's `<=`)
    val pickB = col("_mb").isNotNull &&
      (col("_mf").isNull || gapB <= gapF)
    val matched = l.unionByName(rAligned)
      .withColumn("_mb", last(col("_p"), ignoreNulls = true).over(wB))
      .withColumn("_mf", first(col("_p"), ignoreNulls = true).over(wF))
      .filter(col("_side") === 1)
      .withColumn("_match", when(pickB, col("_mb")).otherwise(col("_mf")))
    val gap = when(pickB, gapB).otherwise(gapF)
    val timeKnown = col("_t").isNotNull
    val valid = toleranceMicros match {
      case None => timeKnown && col("_match").isNotNull
      case Some(tol) =>
        timeKnown && col("_match").isNotNull && gap <= tol
    }
    matched.select(left.columns.map(col) ++
      payloadCols.map(c => when(valid, col(s"_match.$c")).as(c)): _*)
  }
}
