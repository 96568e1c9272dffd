package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, JoinedRow, MutableProjection, NamedExpression, SortOrder, SpecifiedWindowFrame, SpecificInternalRow, UnboundedFollowing, UnboundedPreceding, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, DeclarativeAggregate}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning, UnspecifiedDistribution}
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
  * PARTITIONED nodes — `x / SUM(x) OVER (PARTITION BY user)`, the
  * "share of GROUP total", an even more common spelling — are claimed
  * too: stock Spark's hash exchange sends every row of a hot key
  * through one task (the hot-region-server failure mode). Here the
  * exchange is a RANGE exchange over (partition keys ⧺ spread keys) —
  * the node's ORDER BY if it has one, else the aggregates' own
  * orderable input columns — so a hot key spans tasks; one stats job
  * ships each task's EDGE-group partial buffers (first and last key
  * group — the only slices visible across task edges), the driver
  * merges adjacent same-group partials into per-group constants
  * (bounded by two buffers per task), and pass 2 buffers one group at
  * a time (slice-bounded, the granularity WindowExec buffers at),
  * evaluating interior groups locally. A bare `OVER (PARTITION BY k)`
  * whose aggregates have no orderable input (e.g. only `COUNT(*)`)
  * has no spread dimension and stays with the built-in.
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

  /** Spread keys that let the range exchange split a hot key across
    * tasks: the ORDER BY if present, else the aggregates' orderable
    * deterministic input columns, else ANY orderable child column not
    * already in the partition spec (the spread only distributes rows —
    * which column is immaterial to a whole-group constant). Empty —
    * e.g. `COUNT(*) OVER (PARTITION BY the_only_column)` — declines. */
  private def spreadOf(w: logical.Window,
                       funcs: Seq[ConstAgg]): Seq[SortOrder] = {
    def orderable(c: Expression): Boolean =
      c.deterministic && !c.foldable &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(c.dataType)
    if (w.orderSpec.nonEmpty) w.orderSpec
    else {
      val fromInputs = funcs.flatMap(_.agg.children).distinct.filter(orderable)
      val candidates =
        if (fromInputs.nonEmpty) fromInputs
        else w.child.output
          .filter(a => orderable(a) && !w.partitionSpec.exists(_.semanticEquals(a)))
          .take(1)
      candidates.map(c => SortOrder(c, org.apache.spark.sql.catalyst.expressions.Ascending))
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: logical.Window
        if w.partitionSpec.isEmpty &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          SQLConf.get.getConfString(GlobalRowNumberStrategy.ConfKey, "true").toBoolean =>
      GlobalConstantAggExec(Nil, Nil,
        w.windowExpressions.map(funcOf(_).get), planLater(w.child)) :: Nil
    case w: logical.Window
        if w.partitionSpec.nonEmpty && w.partitionSpec.forall(_.deterministic) &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          SQLConf.get.getConfString(GlobalRowNumberStrategy.ConfKey, "true").toBoolean => {
      val funcs = w.windowExpressions.map(funcOf(_).get)
      val spread = spreadOf(w, funcs)
      if (spread.isEmpty) Nil
      else GlobalConstantAggExec(w.partitionSpec, spread, funcs,
        planLater(w.child)) :: Nil
    }
    case _ => Nil
  }
}

object GlobalConstantAggExec {
  /** One whole-table aggregate column (value constant across all rows). */
  case class ConstAgg(agg: DeclarativeAggregate, attr: Attribute)

  /** Per-task edge-group partials for the partitioned path: first/last
    * key groups and their slice aggregation buffers. Top-level so the
    * serialized task result carries no $outer. */
  private[plans] case class AggEdge(firstG: UnsafeRow, lastG: UnsafeRow,
                                    bufFirst: UnsafeRow, bufLast: UnsafeRow)
}

/** Physical whole-table window aggregation: per-partition partial
  * buffers (one tiny job, no exchange), driver merge + single evaluate,
  * then a narrow second pass attaching the constant values to every
  * row. Driver state is #partitions aggregation buffers — independent
  * of data size. Partitioned mode: per-GROUP constants over a range
  * exchange — edge groups merged on the driver, interior groups
  * evaluated locally from a one-group row buffer. */
case class GlobalConstantAggExec(partition: Seq[Expression],
                                 spread: Seq[SortOrder],
                                 funcs: Seq[GlobalConstantAggExec.ConstAgg],
                                 child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ funcs.map(_.attr)

  private def partOrders: Seq[SortOrder] =
    partition.map(e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partition.isEmpty) UnspecifiedDistribution :: Nil
    else OrderedDistribution(partOrders ++ spread) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partition.isEmpty) Seq(Nil) else Seq(partOrders ++ spread)
  override def outputOrdering =
    if (partition.isEmpty) child.outputOrdering else partOrders ++ spread
  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** Per-key path: edge-group partials → driver segment merge → pass 2
    * buffers one group at a time (slice-bounded), attaching the
    * driver's constant for edge groups and a locally-evaluated one for
    * interior groups. */
  private def doExecutePartitioned(): RDD[InternalRow] = {
    import GlobalConstantAggExec.AggEdge
    val childOutput = child.output
    val resultAttrs = output
    val partExprs = partition
    val aggs = funcs.map(_.agg)
    val bufAttrs = aggs.flatMap(_.aggBufferAttributes)
    val bufTypes = bufAttrs.map(_.dataType)
    val inputBufAttrs = aggs.flatMap(_.inputAggBufferAttributes)
    val initExprs = aggs.flatMap(_.initialValues)
    val updateExprs = aggs.flatMap(_.updateExpressions)
    val mergeExprs = aggs.flatMap(_.mergeExpressions)
    val evalExprs = funcs.map(_.agg.evaluateExpression)
    val rdd = child.execute()

    // pass 1: per task, the first and last key group's partial buffer
    val stats: Array[AggEdge] = rdd.sparkContext.runJob(rdd,
      (iter: Iterator[InternalRow]) => {
        val groupProj = UnsafeProjection.create(partExprs, childOutput)
        val bufProj = UnsafeProjection.create(bufAttrs, bufAttrs)
        def newBuffer(): SpecificInternalRow = {
          val buf = new SpecificInternalRow(bufTypes)
          MutableProjection.create(initExprs, Nil).target(buf)(InternalRow.empty)
          buf
        }
        var buf = newBuffer()
        val update = MutableProjection.create(updateExprs, bufAttrs ++ childOutput)
        update.target(buf)
        val joinBI = new JoinedRow
        var firstG: UnsafeRow = null
        var curG: UnsafeRow = null
        var bufFirst: UnsafeRow = null
        while (iter.hasNext) {
          val row = iter.next()
          val g = groupProj(row)
          if (curG == null) { curG = g.copy(); firstG = curG }
          else if (!g.equals(curG)) {
            if (bufFirst == null) bufFirst = bufProj(buf).copy()
            curG = g.copy()
            buf = newBuffer(); update.target(buf)
          }
          update(joinBI(buf, row))
        }
        val bufLast = bufProj(buf).copy()
        if (bufFirst == null) bufFirst = bufLast
        AggEdge(firstG, curG, bufFirst, bufLast)
      })
    val nParts = stats.length

    // driver segment merge: adjacent edge slices with equal group keys
    // belong to one group (contiguity under the sort); merge their
    // partials left-to-right and evaluate once per group. Driver work
    // is bounded by two buffers per task.
    val firstConst = new Array[UnsafeRow](nParts)
    val lastConst = new Array[UnsafeRow](nParts)
    locally {
      case class Seg(p: Int, isFirst: Boolean, isLast: Boolean,
                     g: UnsafeRow, buf: UnsafeRow)
      val segs = new scala.collection.mutable.ArrayBuffer[Seg]
      var p = 0
      while (p < nParts) {
        val e = stats(p)
        if (e.firstG != null) {
          if (e.lastG.equals(e.firstG))
            segs += Seg(p, isFirst = true, isLast = true, e.firstG, e.bufLast)
          else {
            segs += Seg(p, isFirst = true, isLast = false, e.firstG, e.bufFirst)
            segs += Seg(p, isFirst = false, isLast = true, e.lastG, e.bufLast)
          }
        }
        p += 1
      }
      val merge = MutableProjection.create(mergeExprs, bufAttrs ++ inputBufAttrs)
      val evalProj = UnsafeProjection.create(evalExprs, bufAttrs)
      val joinBB = new JoinedRow
      var i = 0
      while (i < segs.length) {
        var j = i + 1
        while (j < segs.length && segs(j).g.equals(segs(i).g)) j += 1
        val running = new SpecificInternalRow(bufTypes)
        MutableProjection.create(initExprs, Nil).target(running)(InternalRow.empty)
        merge.target(running)
        var k = i
        while (k < j) { merge(joinBB(running, segs(k).buf)); k += 1 }
        val const = evalProj(running).copy()
        k = i
        while (k < j) {
          if (segs(k).isFirst) firstConst(segs(k).p) = const
          if (segs(k).isLast) lastConst(segs(k).p) = const
          k += 1
        }
        i = j
      }
    }

    // pass 2: buffer one group at a time; edge groups take the driver's
    // constant, interior groups evaluate their own local buffer
    rdd.mapPartitionsWithIndex { (pid, iter) =>
      val groupProj = UnsafeProjection.create(partExprs, childOutput)
      val outProj = UnsafeProjection.create(resultAttrs, resultAttrs)
      val join = new JoinedRow
      val update = MutableProjection.create(updateExprs, bufAttrs ++ childOutput)
      val evalProj = UnsafeProjection.create(evalExprs, bufAttrs)
      val joinBI = new JoinedRow

      new Iterator[InternalRow] {
        private val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
        private var bufPos = 0
        private var constRow: UnsafeRow = _
        private var pendingNext: InternalRow = _
        private var firstGroupOfTask = true

        private def fillGroup(): Unit = {
          buf.clear(); bufPos = 0
          if (pendingNext != null) { buf += pendingNext; pendingNext = null }
          else if (iter.hasNext) buf += iter.next().copy()
          else return
          val g = groupProj(buf.head).copy()
          val agg = new SpecificInternalRow(bufTypes)
          MutableProjection.create(initExprs, Nil).target(agg)(InternalRow.empty)
          update.target(agg)
          update(joinBI(agg, buf.head))
          var done = false
          while (!done && iter.hasNext) {
            val r = iter.next().copy()
            if (groupProj(r).equals(g)) { buf += r; update(joinBI(agg, r)) }
            else { pendingNext = r; done = true }
          }
          val isFirst = firstGroupOfTask
          firstGroupOfTask = false
          val isLast = pendingNext == null && !iter.hasNext
          constRow =
            if (isFirst) firstConst(pid)
            else if (isLast) lastConst(pid)
            else evalProj(agg).copy()
        }

        override def hasNext: Boolean =
          bufPos < buf.length || pendingNext != null || iter.hasNext

        override def next(): InternalRow = {
          if (bufPos >= buf.length) fillGroup()
          val out = outProj(join(buf(bufPos), constRow))
          bufPos += 1
          out
        }
      }
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    if (partition.nonEmpty) return doExecutePartitioned()
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
