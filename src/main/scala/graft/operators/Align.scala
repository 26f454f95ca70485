package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Cross-table positional alignment — the one reference semantic with no
  * native Spark analog (SURVEY.md §7.4 #1).
  *
  * The reference allows `df1["ids"] + 2 * df2["age"]`: operands from two
  * different tables aligned by row position
  * (`/root/reference/examples/create_table.py:17-18`; server walks the AST
  * with per-chare positional identity from the hidden `local_index`
  * column, `/root/reference/src/partition.cpp:332-350,671-713`).
  *
  * Spark has no row identity, so we materialize one:
  *
  *  - [[withPosition]] assigns a global 0-based position via
  *    `RDD.zipWithIndex` — per-partition counts + offsets, ONE extra job
  *    and no single-partition window, so it scales to arbitrary row
  *    counts (a `row_number()` over an empty window would funnel 100 TB
  *    through one task).
  *  - [[alignByOrder]] joins two tables on that position. The join is a
  *    plain shuffled equi-join on a dense long key — perfectly uniform,
  *    AQE-friendly.
  *
  * Determinism: positions are only meaningful given an explicit total
  * order, so callers must pass sort keys (the reference's "file order" is
  * itself just the order of ingest). Same-lineage zip (the reference's
  * same-read alignment) is the degenerate case sortCols = ingest order.
  */
object Align {

  /** Append a global position column following the given total order. */
  def withPosition(df: DataFrame, sortCols: Seq[Column],
      posCol: String = "pos"): DataFrame = {
    val sorted = if (sortCols.isEmpty) df else df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(posCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Positional 1:1 join of two equal-length tables (inner on position, so
    * unequal lengths truncate to the shorter — the reference would
    * misalign instead; SURVEY.md §7.4 #5 says match results, not quirks).
    * Callers resolve column-name collisions before the call.
    */
  def alignByOrder(a: DataFrame, aSort: Seq[Column],
      b: DataFrame, bSort: Seq[Column]): DataFrame =
    withPosition(a, aSort).join(withPosition(b, bSort), Seq("pos"))
}
