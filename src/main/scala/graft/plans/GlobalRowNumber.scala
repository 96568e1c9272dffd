package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, GenericInternalRow, JoinedRow, NamedExpression, RowNumber, SortOrder, UnsafeProjection, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

/** Scale-safe planning for the naive global row number.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY is the classic
  * scale-killer: Spark's built-in WindowExec requires ALL rows in one
  * partition (SinglePartition), so the whole table funnels through one
  * task — the very anti-pattern the reference's round-robin counter
  * translation avoids with the two-pass global-index plan
  * (keys/Keys.scala RoundRobin, pipeline.Corpus.withGlobalIndex). Users
  * writing plain SQL don't know that; this strategy makes the naive
  * query plan scale anyway.
  *
  * [[GlobalRowNumberStrategy]] matches a Window node that computes
  * EXACTLY one expression, a row_number over an empty partition spec,
  * and plans [[GlobalRowNumberExec]] instead of WindowExec. The exec
  * requires an [[OrderedDistribution]] — EnsureRequirements inserts the
  * same range exchange a global SORT uses (fully parallel) — and then
  * assigns indexes with the two-pass zipWithIndex scheme: one tiny job
  * counts rows per (already materialized) shuffle partition, and the
  * main pass adds the per-partition offsets. Row order within and
  * across partitions equals the sort order, so the assigned numbers are
  * identical to WindowExec's for any total (tie-free) ordering — ties
  * land arbitrarily in either plan (distributed sorts never promise
  * tie order).
  *
  * Opt-out: set `spark.graft.globalRowNumber.enabled=false` to fall
  * back to the built-in single-task WindowExec.
  */
object GlobalRowNumberStrategy extends SparkStrategy {

  val ConfKey = "spark.graft.globalRowNumber.enabled"

  private def isRowNumber(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(_: RowNumber, _), _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: logical.Window
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.size == 1 && isRowNumber(w.windowExpressions.head) &&
          SQLConf.get.getConfString(ConfKey, "true").toBoolean =>
      GlobalRowNumberExec(w.orderSpec, w.windowExpressions.head.toAttribute,
        planLater(w.child)) :: Nil
    case _ => Nil
  }
}

/** Physical two-pass global row number: range-shuffled, sorted input
  * (demanded via requiredChildDistribution/Ordering) + RDD zipWithIndex
  * (per-partition count job over the materialized shuffle, then offsets
  * added partition-locally — never a single-task stage). */
case class GlobalRowNumberExec(order: Seq[SortOrder], rowNumAttr: Attribute,
                               child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rowNumAttr

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val resultAttrs = output
    child.execute().zipWithIndex().mapPartitions { iter =>
      val joined = new JoinedRow
      val rn = new GenericInternalRow(1)
      val proj = UnsafeProjection.create(resultAttrs, resultAttrs)
      iter.map { case (row, idx) =>
        // row_number is IntegerType (as in WindowExec); past 2^31 rows the
        // built-in silently wraps — fail loudly instead
        rn.setInt(0, Math.toIntExact(idx + 1))
        proj(joined(row, rn))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
