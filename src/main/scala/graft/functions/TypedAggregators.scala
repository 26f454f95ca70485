package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY.md §2.9 — the
  * reference has NO user-defined-function mechanism at all; this is the
  * Spark-native superset for custom aggregation logic, fully partial/
  * final decomposed like any built-in agg).
  */
object TypedAggregators {

  /** Numerically-stable streaming variance (Welford / Chan parallel
    * merge). Demonstrates a custom *algebraic* aggregate: reduce and
    * merge are both O(1) state, so Spark runs it partial→final exactly
    * like the reference's two-level sums. */
  case class VarState(n: Long, mean: Double, m2: Double)

  object WelfordVariance extends Aggregator[Double, VarState, Double] {
    override def zero: VarState = VarState(0L, 0.0, 0.0)
    override def reduce(s: VarState, x: Double): VarState = {
      val n = s.n + 1
      val d = x - s.mean
      val mean = s.mean + d / n
      VarState(n, mean, s.m2 + d * (x - mean))
    }
    override def merge(a: VarState, b: VarState): VarState = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        VarState(n, a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }
    override def finish(s: VarState): Double =
      if (s.n < 2) 0.0 else s.m2 / (s.n - 1)
    override def bufferEncoder: Encoder[VarState] = Encoders.product[VarState]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k accumulator: keeps only the k largest values per
    * group in the buffer, so group cardinality never inflates state —
    * the aggregation-side analog of TakeOrderedAndProject. */
  class TopK(k: Int) extends Aggregator[Double, List[Double], Seq[Double]] {
    override def zero: List[Double] = Nil
    override def reduce(buf: List[Double], x: Double): List[Double] =
      (x :: buf).sorted(Ordering[Double].reverse).take(k)
    override def merge(a: List[Double], b: List[Double]): List[Double] =
      (a ++ b).sorted(Ordering[Double].reverse).take(k)
    override def finish(r: List[Double]): Seq[Double] = r
    override def bufferEncoder: Encoder[List[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Exact-integer [[TopK]]: the oracle-gated variant (q96) — Long
    * values cross engines bit-exactly where Double top-k would hinge
    * on float totals. */
  class TopKLong(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    override def zero: List[Long] = Nil
    override def reduce(buf: List[Long], x: Long): List[Long] =
      (x :: buf).sorted(Ordering[Long].reverse).take(k)
    override def merge(a: List[Long], b: List[Long]): List[Long] =
      (a ++ b).sorted(Ordering[Long].reverse).take(k)
    override def finish(r: List[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
