package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-layout clustering: Morton (z-order) interleaving of two sort
  * dimensions, so a range-partitioned write co-locates rows that are
  * close in BOTH dimensions — the multi-dimensional generalization of
  * the single-column sort the reference relies on (sample sort,
  * `/root/reference/src/partition.cpp` redistribution). At 100 TB the
  * payoff is scan pruning: a file whose z-range is tight has tight
  * min/max on *both* source columns, so predicate pushdown on either
  * column skips it (the Delta/Iceberg OPTIMIZE ZORDER move, built here
  * from a plain integer expression + repartitionByRange).
  *
  * The z-value is pure integer arithmetic (bit i of each dimension via
  * `DIV 2^i % 2`, re-shifted by multiplication), so the DuckDB oracle
  * replays it exactly; no UDF, stays inside whole-stage codegen.
  */
object Layout {

  /** Spark SQL rendering of the `bits`-per-dimension Morton interleave
    * of integer expressions `a` and `b` (callers pre-mask each into
    * [0, 2^bits)). Bit i of `a` lands at z-bit 2i, of `b` at 2i+1. */
  def zExprSpark(a: String, b: String, bits: Int): String =
    zExpr(a, b, bits, "DIV")

  /** DuckDB rendering — same arithmetic, `//` for integer division. */
  def zExprDuck(a: String, b: String, bits: Int): String =
    zExpr(a, b, bits, "//")

  private def zExpr(a: String, b: String, bits: Int, div: String): String = {
    require(bits >= 1 && bits <= 31, "bits must be in 1..31")
    (0 until bits).map { i =>
      s"((($a) $div ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + ((($b) $div ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")
  }

  /** Write `df` clustered by the z-order of (aCol % 2^bits,
    * bCol % 2^bits): range-partition on the z-value into `nFiles`
    * output files, sorting within each partition so row groups are
    * z-contiguous. Range boundaries come from Spark's reservoir sample
    * — layout (which rows share a file) may vary slightly run to run,
    * but CONTENT is untouched, and every file's (aCol, bCol) min/max
    * stay tight, which is the property scan pruning uses. */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String,
      path: String, bits: Int = 8, nFiles: Int = 16): Unit =
    zOrdered(df, aCol, bCol, bits, nFiles)
      .write.mode("overwrite").parquet(path)

  /** The clustering transform behind [[writeZOrdered]], exposed so
    * specs can assert per-partition locality without a filesystem
    * round-trip. Keeps a `zval` column. */
  def zOrdered(df: DataFrame, aCol: String, bCol: String,
      bits: Int, nFiles: Int): DataFrame =
    df.withColumn("zval", expr(zExprSpark(
        s"$aCol % ${1L << bits}", s"$bCol % ${1L << bits}", bits)))
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
}
