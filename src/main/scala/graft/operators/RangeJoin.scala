package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval / range join — extension operator (reference has only the
  * equi hash join, SURVEY.md §2.3).
  *
  * Matches left "point" rows (a timestamp) to right "interval" rows
  * ([start, end)). Two strategies, chosen by whether an equi key exists:
  *
  *  - [[keyed]]: equi-join on the key + range post-filter. Catalyst plans
  *    the shuffle/broadcast on the key; the range predicate filters
  *    within key groups. Optimal whenever keys are selective — no custom
  *    machinery needed or wanted.
  *  - [[bucketed]]: NO key — the naive plan would be a nested-loop cross
  *    join (quadratic, a non-starter at scale). Instead both sides are
  *    bucketized on time: points map to one bucket, intervals explode to
  *    the ceil(len/g)+1 buckets they overlap, and the join becomes a
  *    plain equi-join on bucket id + exact containment filter. Work is
  *    O(points + intervals·span/g + output) with an ordinary hash
  *    shuffle — AQE-balanced, spillable, 100 TB-safe. Each (point,
  *    interval) pair meets in exactly one bucket (the point's), so no
  *    dedup pass is needed.
  */
object RangeJoin {

  def keyed(left: DataFrame, lKey: String, lTime: String,
      right: DataFrame, rKey: String, rStart: String, rEnd: String)
      : DataFrame =
    left.join(right,
      left(lKey) === right(rKey) &&
        left(lTime) >= right(rStart) && left(lTime) < right(rEnd))

  /** Time bucket id — the ONE bucketization both strategies share
    * (divergence here would silently split the join semantics). */
  private def bucketOf(c: Column, granularitySecs: Long): Column =
    floor(unix_timestamp(c) / lit(granularitySecs)).cast("long")

  def bucketed(left: DataFrame, lTime: String,
      right: DataFrame, rStart: String, rEnd: String,
      granularitySecs: Long): DataFrame = {
    def bucketOf(c: Column): Column = RangeJoin.bucketOf(c, granularitySecs)
    val pts = left.withColumn("_b", bucketOf(left(lTime)))
    val iv = right
      .withColumn("_b", explode(sequence(
        bucketOf(right(rStart)), bucketOf(right(rEnd)))))
    pts.join(iv, Seq("_b"))
      .filter(col(lTime) >= col(rStart) && col(lTime) < col(rEnd))
      .drop("_b")
  }

  /** Interval-OVERLAP join: BOTH sides are [start, end) intervals and a
    * pair matches when they intersect (a.start < b.end AND b.start <
    * a.end). Same bucketization as [[bucketed]], but an overlapping
    * pair shares EVERY bucket in its intersection, so the match is kept
    * only in the canonical bucket max(bucket(aStart), bucket(bStart)) —
    * exactly one per pair, no dedup shuffle. Column names must be
    * disjoint across the two inputs (rename before calling). Work is
    * O(Σ span/g + output) with one ordinary hash shuffle. */
  def overlapBucketed(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      granularitySecs: Long): DataFrame = {
    def bucketOf(c: Column): Column = RangeJoin.bucketOf(c, granularitySecs)
    val av = a.withColumn("_b", explode(sequence(
      bucketOf(a(aStart)), bucketOf(a(aEnd)))))
    val bv = b.withColumn("_b", explode(sequence(
      bucketOf(b(bStart)), bucketOf(b(bEnd)))))
    av.join(bv, Seq("_b"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("_b") ===
        greatest(bucketOf(col(aStart)), bucketOf(col(bStart))))
      .drop("_b")
  }
}
