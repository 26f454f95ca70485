package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys.
  *
  * The reference balances skew with a global bucket histogram and greedy
  * least-loaded assignment (`/root/reference/src/partition.cpp:1444-1482`).
  * On Spark the first line of defense is AQE's skew-join splitting
  * (enabled in Graft.session); this utility is the explicit fallback for
  * the cases AQE can't fix (e.g. a single key exceeding one executor's
  * memory in a shuffled hash join, or skew under `mapGroups`).
  *
  * Salting: the skewed (large) side gets a random-ish salt in [0, n);
  * the small side is replicated n times with every salt value; the join
  * key becomes (key, salt) so one hot key spreads over n tasks. Salt is
  * derived from a hash of stable columns, not rand(), so plans stay
  * deterministic and re-executable (rand() breaks retry semantics and
  * oracle checks).
  */
object Skew {

  /** Deterministic salt in [0, n) from arbitrary stable columns. */
  def salt(n: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(n))

  /** Two-stage (salted) aggregation for a skewed group key: stage 1
    * groups by (key, salt) so one hot key's partial aggregation spreads
    * over `n` tasks; stage 2 re-aggregates the ≤ n×|keys| partials with
    * SUM. Every aggregate passed in must therefore be sum-mergeable
    * (sums of exact integers, counts) — exactly the shapes DetMath
    * produces — which also makes the result byte-identical to the
    * unsalted groupBy (q104 is oracle-gated on that equality).
    *
    * Spark's hash aggregate already does map-side partials, which
    * handles most skew; this explicit form is for the residual case
    * where a single key's FINAL partial exceeds one reducer (e.g.
    * collect_list-style state or extreme row counts per key). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltCols: Seq[String],
      n: Int, aggs: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("_salt",
      salt(n, saltCols.map(df(_)): _*))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (nm, c) => c.as(nm) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (nm, _) => sum(col(nm)).as(nm) }: _*)
  }

  /** Inner/left salted equi-join of a skewed large side with a smaller
    * right side, spreading each key over `n` tasks. */
  def saltedJoin(large: DataFrame, largeKey: String, saltCols: Seq[String],
      small: DataFrame, smallKey: String, n: Int,
      how: String = "inner"): DataFrame = {
    val salted = large.withColumn("_salt",
      salt(n, saltCols.map(large(_)): _*))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated,
        salted(largeKey) === replicated(smallKey) &&
          salted("_salt") === replicated("_salt"), how)
      .drop("_salt")
  }
}
