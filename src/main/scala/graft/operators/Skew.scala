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
