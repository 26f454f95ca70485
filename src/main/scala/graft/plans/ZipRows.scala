package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Positional zip as a first-class plan node (SURVEY.md §7.3's "clean
  * version" of cross-table alignment).
  *
  * The reference aligns rows of two tables read side-by-side purely by
  * local position (`local_index`, /root/reference/src/partition.cpp:
  * 332-350): same chare, same row offset. The Spark analog of that
  * same-lineage case is `RDD.zipPartitions` — partition i of the left
  * zipped with partition i of the right, NO shuffle, NO extra job (the
  * generic Align.withPosition pays a zipWithIndex count job + join).
  *
  * Caller contract (checked at runtime per partition): both sides have
  * the same partition count and per-partition row counts — true exactly
  * when they share scan lineage through narrow transforms, which is the
  * only case the reference supports at all.
  *
  * Wiring is the standard extension path: logical [[ZipRows]] →
  * [[ZipRowsStrategy]] (injected by graft.GraftExtensions or applied via
  * [[ZipRows.zip]]) → [[ZipRowsExec]].
  */
case class ZipRows(left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): ZipRows =
    copy(left = newLeft, right = newRight)
}

case class ZipRowsExec(left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def doExecute(): RDD[InternalRow] = {
    val lw = left.output.length
    val rw = right.output.length
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      new Iterator[InternalRow] {
        override def hasNext: Boolean = {
          val l = li.hasNext; val r = ri.hasNext
          require(l == r,
            "ZipRows requires equal per-partition row counts " +
              "(same-lineage inputs)")
          l && r
        }
        override def next(): InternalRow = {
          // copy: upstream iterators commonly reuse UnsafeRow buffers
          val l = li.next().copy(); val r = ri.next().copy()
          val out = new Array[Any](lw + rw)
          var i = 0
          while (i < lw) { out(i) = l.get(i, left.output(i).dataType); i += 1 }
          var j = 0
          while (j < rw) { out(lw + j) = r.get(j, right.output(j).dataType); j += 1 }
          new GenericInternalRow(out)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): ZipRowsExec =
    copy(left = newLeft, right = newRight)
}

object ZipRowsStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ZipRows(l, r) => ZipRowsExec(planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object ZipRows {
  /** Ensure the strategy is installed in this session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val ss = spark.sessionState
    if (!ss.planner.extraPlanningStrategies.contains(ZipRowsStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ ZipRowsStrategy
    }
  }

  /** Same-lineage positional zip of two DataFrames. */
  def zip(a: DataFrame, b: DataFrame): DataFrame = {
    install(a.sparkSession)
    org.apache.spark.sql.GraftShim.ofRows(a.sparkSession,
      ZipRows(org.apache.spark.sql.GraftShim.analyzed(a),
        org.apache.spark.sql.GraftShim.analyzed(b)))
  }
}
