package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, JoinedRow, MutableProjection, NamedExpression, SpecifiedWindowFrame, SpecificInternalRow, UnboundedFollowing, UnboundedPreceding, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, DeclarativeAggregate}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

/** Scale-safe planning for naive WHOLE-TABLE window aggregates.
  *
  * `SUM(x) OVER ()` — the "share of total" query (`x / SUM(x) OVER ()`)
  * and its count/min/max/avg siblings — is the single most common
  * global-window shape, and stock Spark plans it as a SinglePartition
  * WindowExec: the ENTIRE table shuffled into one task to compute one
  * number every row then shares. This is the same single-partition
  * funnel as the reference's motivating region-server hot-spot
  * (README:9-27), hit from plain SQL.
  *
  * The distributed shape is trivial because the frame is the whole
  * table: every output value is the SAME constant. So: one tiny job
  * aggregates each partition into a partial buffer (map-side partial
  * aggregation, exactly what groupBy().agg() would do), the driver
  * merges the #partitions buffers (constant work), evaluates once, and
  * a second NARROW pass attaches the constants to every row. NO shuffle
  * at all — where the built-in moves 100 TB into one task, this plan
  * moves zero bytes and runs both passes at full parallelism. (The
  * child lineage executes twice — two column-pruned scans, the same
  * cost as the agg-then-broadcast-join rewrite a careful user would
  * hand-write, without the join.)
  *
  * Matches Window nodes with an empty partition spec and UNBOUNDED
  * PRECEDING .. UNBOUNDED FOLLOWING frames — both the bare `OVER ()`
  * (empty order spec) and the explicit `OVER (ORDER BY k ROWS/RANGE
  * BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)` spelling: an
  * order spec cannot change a whole-table frame, so the value is the
  * same constant either way — for ORDER-INSENSITIVE aggregates.
  * First/Last are excluded EXPLICITLY (Catalyst marks them
  * deterministic, but their value depends on enumeration order, which
  * this exec — unordered partials merged in partition order — does not
  * honor; an ordered `first_value` is rewritten to the rescued
  * `nth_value(x, 1)` by the optimizer, and an ordered `last_value` is
  * claimed by [[GlobalNthValueStrategy]] as nth 1 FROM THE END — both
  * ride the ordered constant-lookup exec, so excluding them here costs
  * nothing). Aggregates are
  * deterministic [[DeclarativeAggregate]]s, driven through
  * their own init/update/merge/evaluate projections — sum/count/min/
  * max/avg and any other deterministic declarative aggregate, decimals
  * and all. For FLOATING-POINT sums the partial merge
  * associates additions differently than one sequential scan — last-ulp
  * differences, the same caveat as every parallel float sum.
  *
  * Opt-out: shares `spark.graft.globalRowNumber.enabled` — one switch
  * restores every built-in global window.
  */
object GlobalConstantAggStrategy extends SparkStrategy {
  import GlobalConstantAggExec.ConstAgg

  private def funcOf(e: NamedExpression): Option[ConstAgg] = e match {
    case Alias(WindowExpression(
          AggregateExpression(f: DeclarativeAggregate, Complete, false, None, _),
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing))), _)
        if f.deterministic &&
          !f.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.First] &&
          !f.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.Last] =>
      Some(ConstAgg(f, e.toAttribute))
    case _ => None
  }

  /** Per-expression categorizer for [[GlobalWindowSplit]]. */
  private[plans] def rescuable(e: NamedExpression): Boolean = funcOf(e).isDefined

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: logical.Window
        if w.partitionSpec.isEmpty &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          SQLConf.get.getConfString(GlobalRowNumberStrategy.ConfKey, "true").toBoolean =>
      GlobalConstantAggExec(
        w.windowExpressions.map(funcOf(_).get), planLater(w.child)) :: Nil
    case _ => Nil
  }
}

object GlobalConstantAggExec {
  /** One whole-table aggregate column (value constant across all rows). */
  case class ConstAgg(agg: DeclarativeAggregate, attr: Attribute)
}

/** Physical whole-table window aggregation: per-partition partial
  * buffers (one tiny job, no exchange), driver merge + single evaluate,
  * then a narrow second pass attaching the constant values to every
  * row. Driver state is #partitions aggregation buffers — independent
  * of data size. */
case class GlobalConstantAggExec(funcs: Seq[GlobalConstantAggExec.ConstAgg],
                                 child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ funcs.map(_.attr)

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override def outputOrdering = child.outputOrdering
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val resultAttrs = output
    val aggs = funcs.map(_.agg)
    val bufAttrs = aggs.flatMap(_.aggBufferAttributes)
    val bufTypes = bufAttrs.map(_.dataType)
    val inputBufAttrs = aggs.flatMap(_.inputAggBufferAttributes)
    val initExprs = aggs.flatMap(_.initialValues)
    val updateExprs = aggs.flatMap(_.updateExpressions)
    val mergeExprs = aggs.flatMap(_.mergeExpressions)
    val evalExprs = funcs.map(_.agg.evaluateExpression)
    val rdd = child.execute()

    def newBuffer(): SpecificInternalRow = {
      val buf = new SpecificInternalRow(bufTypes)
      val p = MutableProjection.create(initExprs, Nil)
      p.target(buf)(InternalRow.empty)
      buf
    }

    // pass 1: one partial buffer per partition — the map-side partial
    // aggregation a groupBy would run, without the final exchange
    val partials: Array[UnsafeRow] = rdd.sparkContext.runJob(rdd,
      (iter: Iterator[InternalRow]) => {
        val buf = newBuffer()
        val update = MutableProjection.create(updateExprs, bufAttrs ++ childOutput)
        update.target(buf)
        val joinBI = new JoinedRow
        while (iter.hasNext) update(joinBI(buf, iter.next()))
        UnsafeProjection.create(bufAttrs, bufAttrs)(buf).copy()
      })

    // driver merge + one evaluation: #partitions buffer-sized rows of
    // work, independent of data size
    val constRow: UnsafeRow = {
      val running = newBuffer()
      val merge = MutableProjection.create(mergeExprs, bufAttrs ++ inputBufAttrs)
      merge.target(running)
      val joinBB = new JoinedRow
      partials.foreach(p => merge(joinBB(running, p)))
      UnsafeProjection.create(evalExprs, bufAttrs)(running).copy()
    }

    // pass 2: narrow attach of the constants — full parallelism, no state
    rdd.mapPartitions { iter =>
      val outProj = UnsafeProjection.create(resultAttrs, resultAttrs)
      val join = new JoinedRow
      iter.map(row => outProj(join(row, constRow)))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
