package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic floating-point helpers for oracle-exact results.
  *
  * Two cross-engine hazards make naive `ROUND(SUM(x), 2)` non-reproducible
  * between Spark and any other engine (DuckDB oracle, future backends):
  *
  *  1. ROUND tie-breaking differs (Spark HALF_UP on the exact binary
  *     expansion vs C-library `x*100` tricks) — `12081.245` rounds to
  *     .24 on one engine and .25 on the other.
  *  2. SUM over doubles is order-dependent; partitioned/parallel execution
  *     makes the ulp noise nondeterministic even within one engine.
  *
  * Fixes, both built from individually-deterministic IEEE ops so the same
  * expression yields bit-identical doubles on every engine:
  *  - `rnd(c, n)` = floor(c * 10^n + 0.5) / 10^n  (one multiply, one add,
  *    one floor, one divide — no decimal string expansion involved).
  *  - `sumFixed(c, n)` sums `floor(c*10^n + 0.5)` as exact BIGINTs (order
  *    never matters for integer addition) and divides once at the end.
  *
  * At 100 TB these are also the *fast* path: integer sums are cheaper than
  * decimal aggregation and stay inside whole-stage codegen.
  */
object DetMath {

  private def p10(digits: Int): Double = math.pow(10, digits)

  /** Order-of-evaluation-stable round-half-up. */
  def rnd(c: Column, digits: Int): Column =
    floor(c * p10(digits) + 0.5) / p10(digits)

  /** Exact fixed-point value (e.g. cents for digits=2) as a long. */
  def fixed(c: Column, digits: Int): Column =
    floor(c * p10(digits) + 0.5).cast("long")

  /** Summation-order-independent SUM for values with `digits` decimal
    * places: sums exact scaled longs, divides once. */
  def sumFixed(c: Column, digits: Int): Column =
    sum(fixed(c, digits)) / p10(digits)

  /** Same, as a running window total (apply `.over(w)` to the result of
    * sum yourself if you need frames — this is the plain agg form). */
  def avgFixed(c: Column, digits: Int, outDigits: Int): Column =
    rnd(sumFixed(c, digits) / count(lit(1)), outDigits)

  // ---- SQL-string twins for the DuckDB oracle ----
  // Scale literals are spelled `CAST(p AS DOUBLE)`, not `p` / `p.0`:
  // bare `p.0` parses as DECIMAL in Spark SQL (and DuckDB), which under
  // ANSI typing drags the whole expression into decimal arithmetic —
  // a DIFFERENT optimized plan than the Column twins above (double
  // literals), breaking the SqlSurfaceSpec plan-equality pin. The CAST
  // is valid in both engines, constant-folds to the same double
  // literal in Spark, and is value-identical in DuckDB (double ops
  // either way), so the oracle hashes are unchanged.
  def rndSql(e: String, digits: Int): String = {
    val p = p10(digits).toLong
    s"FLOOR(($e) * CAST($p AS DOUBLE) + 0.5) / CAST($p AS DOUBLE)"
  }
  def fixedSql(e: String, digits: Int): String = {
    val p = p10(digits).toLong
    s"CAST(FLOOR(($e) * $p + 0.5) AS BIGINT)"
  }
  def sumFixedSql(e: String, digits: Int): String = {
    val p = p10(digits).toLong
    s"SUM(${fixedSql(e, digits)}) / CAST($p AS DOUBLE)"
  }
  def avgFixedSql(e: String, digits: Int, outDigits: Int): String =
    rndSql(s"(${sumFixedSql(e, digits)}) / COUNT(*)", outDigits)
}
