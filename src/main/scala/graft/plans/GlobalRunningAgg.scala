package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, CurrentRow, Descending, JoinedRow, MutableProjection, NamedExpression, NullsFirst, NullsLast, RangeFrame, SortOrder, SpecificInternalRow, SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, DeclarativeAggregate, First, Last}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

/** Scale-safe planning for naive global RUNNING aggregates.
  *
  * `SUM(x) OVER (ORDER BY ts)` — the canonical cumulative total — and
  * its count/min/max/avg siblings plan as a SinglePartition WindowExec
  * in stock Spark whenever the partition spec is empty: the whole table
  * through one task, the same trap as the ranking family
  * ([[GlobalRowNumberStrategy]]) but hit by the single most common
  * analytics query there is. The distributed shape is the classic
  * PREFIX SCAN: range-shuffle on the order key (fully parallel), one
  * tiny job aggregates each partition into a partial buffer, the driver
  * prefix-MERGES the partials (#partitions buffers — constant work),
  * and each partition then runs its local running aggregation seeded
  * with the merged prefix of everything before it.
  *
  * Generic over Catalyst [[DeclarativeAggregate]]s: the exec drives each
  * function's own initialValues/updateExpressions/mergeExpressions/
  * evaluateExpression through projections — exactly the machinery
  * AggregationIterator uses — so sum/count/min/max/avg (and any other
  * deterministic declarative aggregate) are supported without
  * re-implementing their arithmetic, decimals and all.
  *
  * Frames: both `ROWS` and `RANGE` `UNBOUNDED PRECEDING → CURRENT ROW`
  * (the latter is what a bare ORDER BY means — peers of the current row
  * are INCLUDED, so tied rows share their value). Range semantics are
  * computed per tie run, which is exact per partition because the range
  * exchange co-locates equal sort keys — a tie run never spans a
  * partition boundary. Mixed frames in one node are handled.
  *
  * SUFFIX frames — `CURRENT ROW → UNBOUNDED FOLLOWING`, the "remaining
  * total" query — are the mirror image and reuse this exec verbatim:
  * the strategy flips every sort direction (and its null ordering), so
  * the range exchange enumerates the table in exact reverse order and
  * the same prefix scan computes the suffix. Frame SETS are identical
  * under reversal ([peer-start, end] read backwards is [start,
  * peer-end]), so order-insensitive aggregates match the built-in
  * exactly; `first_value`/`last_value` are enumeration-sensitive and
  * are swapped (the first row of a suffix frame is the LAST row fed in
  * reverse), preserving ignoreNulls. Output rows emit in reverse key
  * order — SQL attaches no meaning to result order, and any outer
  * ORDER BY re-sorts.
  *
  * Values match the built-in for exact types (integral, decimal,
  * count/min/max). For FLOATING-POINT sums the distributed plan
  * associates additions differently than a single sequential scan —
  * last-ulp differences, inherent to any parallel float sum (the same
  * caveat as groupBy sums).
  *
  * Opt-out: shares `spark.graft.globalRowNumber.enabled` — one switch
  * restores every built-in global window.
  */
object GlobalRunningAggStrategy extends SparkStrategy {
  import GlobalRunningAggExec.RunningAgg

  private def funcOf(e: NamedExpression): Option[RunningAgg] = e match {
    case Alias(WindowExpression(
          AggregateExpression(f: DeclarativeAggregate, Complete, false, None, _),
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(ft, UnboundedPreceding, CurrentRow))), _)
        // First/Last declare deterministic=false because they are order-
        // dependent in a groupBy — but a window's frame IS ordered, and
        // this exec feeds them rows in exactly the sort order, so
        // first_value/last_value are deterministic here (that is how
        // WindowExec runs them too)
        if f.deterministic || f.isInstanceOf[First] || f.isInstanceOf[Last] =>
      Some(RunningAgg(f, ft == RangeFrame, e.toAttribute))
    case _ => None
  }

  private def suffixOf(e: NamedExpression): Option[RunningAgg] = e match {
    case Alias(WindowExpression(
          AggregateExpression(f: DeclarativeAggregate, Complete, false, None, _),
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(ft, CurrentRow, UnboundedFollowing))), _)
        if f.deterministic || f.isInstanceOf[First] || f.isInstanceOf[Last] =>
      // reverse enumeration: the frame's first row is the last one fed
      val g = f match {
        case First(c, ign) => Last(c, ign)
        case Last(c, ign)  => First(c, ign)
        case other         => other
      }
      Some(RunningAgg(g, ft == RangeFrame, e.toAttribute))
    case _ => None
  }

  /** Per-expression categorizers for [[GlobalWindowSplit]] — running and
    * suffix frames need OPPOSITE exchange directions, so they are
    * distinct split groups. */
  private[plans] def rescuableRunning(e: NamedExpression): Boolean =
    funcOf(e).isDefined
  private[plans] def rescuableSuffix(e: NamedExpression): Boolean =
    suffixOf(e).isDefined

  private def reversed(s: SortOrder): SortOrder = SortOrder(
    s.child,
    if (s.direction == Ascending) Descending else Ascending,
    if (s.nullOrdering == NullsFirst) NullsLast else NullsFirst,
    s.sameOrderExpressions)

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: logical.Window
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          SQLConf.get.getConfString(GlobalRowNumberStrategy.ConfKey, "true").toBoolean =>
      GlobalRunningAggExec(w.orderSpec,
        w.windowExpressions.map(funcOf(_).get), planLater(w.child)) :: Nil
    case w: logical.Window
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(suffixOf(_).isDefined) &&
          SQLConf.get.getConfString(GlobalRowNumberStrategy.ConfKey, "true").toBoolean =>
      GlobalRunningAggExec(w.orderSpec.map(reversed),
        w.windowExpressions.map(suffixOf(_).get), planLater(w.child)) :: Nil
    case _ => Nil
  }
}

object GlobalRunningAggExec {
  /** One running aggregate column; `isRange` = bare-ORDER-BY peer
    * semantics (tied rows share the run-end value). */
  case class RunningAgg(agg: DeclarativeAggregate, isRange: Boolean,
                        attr: Attribute)
}

/** Physical distributed prefix scan over declarative aggregates. */
case class GlobalRunningAggExec(order: Seq[SortOrder],
                                funcs: Seq[GlobalRunningAggExec.RunningAgg],
                                child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ funcs.map(_.attr)

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning

  // concatenated buffer layout across all functions
  private def bufferAttrs = funcs.flatMap(_.agg.aggBufferAttributes)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val resultAttrs = output
    val keyExprs = order.map(_.child)
    val aggsLocal = funcs.map(_.agg)
    val isRangeLocal = funcs.map(_.isRange).toArray
    val anyRange = isRangeLocal.contains(true)
    val bufAttrs = bufferAttrs
    val bufTypes = bufAttrs.map(_.dataType)
    val inputBufAttrs = funcs.flatMap(_.agg.inputAggBufferAttributes)
    val initExprs = aggsLocal.flatMap(_.initialValues)
    val updateExprs = aggsLocal.flatMap(_.updateExpressions)
    val mergeExprs = aggsLocal.flatMap(_.mergeExpressions)
    val evalExprs = funcs.map(_.agg.evaluateExpression)
    val rdd = child.execute()

    def newBuffer(): SpecificInternalRow = {
      val buf = new SpecificInternalRow(bufTypes)
      val p = MutableProjection.create(initExprs, Nil)
      p.target(buf)(InternalRow.empty)
      buf
    }

    // pass 1: one partial buffer per partition (reads the materialized
    // shuffle; cost = one streaming aggregation, no extra exchange)
    val partials: Array[UnsafeRow] = rdd.sparkContext.runJob(rdd,
      (iter: Iterator[InternalRow]) => {
        val buf = newBuffer()
        val update = MutableProjection.create(updateExprs, bufAttrs ++ childOutput)
        update.target(buf)
        val joinBI = new JoinedRow
        while (iter.hasNext) update(joinBI(buf, iter.next()))
        UnsafeProjection.create(bufAttrs, bufAttrs)(buf).copy()
      })

    // driver prefix-merge: prefix(p) = fold of partials 0..p-1. A few
    // buffer-sized rows of work, independent of data size.
    val nParts = partials.length
    val prefixes = new Array[UnsafeRow](nParts)
    locally {
      val running = newBuffer()
      val toUnsafe = UnsafeProjection.create(bufAttrs, bufAttrs)
      val merge = MutableProjection.create(mergeExprs, bufAttrs ++ inputBufAttrs)
      merge.target(running)
      val joinBB = new JoinedRow
      var p = 0
      while (p < nParts) {
        prefixes(p) = toUnsafe(running).copy()
        merge(joinBB(running, partials(p)))
        p += 1
      }
    }

    // pass 2: local running aggregation seeded with the prefix
    rdd.mapPartitionsWithIndex { (pid, iter) =>
      val buf = new SpecificInternalRow(bufTypes)
      val prefix = prefixes(pid)
      var i = 0
      while (i < bufTypes.length) {
        buf.update(i, prefix.get(i, bufTypes(i)))
        i += 1
      }
      val update = MutableProjection.create(updateExprs, bufAttrs ++ childOutput)
      update.target(buf)
      val evalProj = UnsafeProjection.create(evalExprs, bufAttrs)
      val outProj = UnsafeProjection.create(resultAttrs, resultAttrs)
      val joinBI = new JoinedRow
      val joinOut = new JoinedRow

      if (!anyRange) {
        // ROWS frames only: stream — update, then emit after each row
        iter.map { row =>
          update(joinBI(buf, row))
          outProj(joinOut(row, evalProj(buf)))
        }
      } else {
        // RANGE (peer) semantics need the run-end value for every row of
        // a tie run: buffer one run at a time (rows copied — the scan
        // iterator reuses its row), update through the whole run, then
        // emit. Mixed ROWS funcs keep their own per-row snapshots.
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val sameRun = KeyRunEquality.create(keyExprs.map(_.dataType))
        val attrTypes = funcs.map(_.attr.dataType).toArray
        new Iterator[InternalRow] {
          private val run = new scala.collection.mutable.ArrayBuffer[InternalRow]
          private val rowSnaps = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
          private var runEnd: UnsafeRow = _
          private var bufPos = 0
          private var pendingNext: InternalRow = _

          private def fillRun(): Unit = {
            run.clear(); rowSnaps.clear(); bufPos = 0
            if (pendingNext != null) { run += pendingNext; pendingNext = null }
            else if (iter.hasNext) run += iter.next().copy()
            else return
            val runKey = keyProj(run.head).copy()
            var done = false
            while (!done && iter.hasNext) {
              val r = iter.next().copy()
              if (sameRun(keyProj(r), runKey)) run += r
              else { pendingNext = r; done = true }
            }
            var j = 0
            while (j < run.length) {
              update(joinBI(buf, run(j)))
              rowSnaps += evalProj(buf).copy() // per-row value for ROWS funcs
              j += 1
            }
            runEnd = rowSnaps.last
          }

          override def hasNext: Boolean =
            bufPos < run.length || pendingNext != null || iter.hasNext

          override def next(): InternalRow = {
            if (bufPos >= run.length) fillRun()
            val row = run(bufPos)
            val snap = rowSnaps(bufPos)
            val vals = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(funcs.length)
            var k = 0
            while (k < attrTypes.length) {
              val src = if (isRangeLocal(k)) runEnd else snap
              vals.update(k, src.get(k, attrTypes(k)))
              k += 1
            }
            bufPos += 1
            outProj(joinOut(row, vals))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
