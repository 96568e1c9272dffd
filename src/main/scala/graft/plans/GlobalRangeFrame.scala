package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, CurrentRow, Expression, GenericInternalRow, JoinedRow, MutableProjection, NamedExpression, RangeFrame, SortOrder, SpecificInternalRow, SpecifiedWindowFrame, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, DeclarativeAggregate}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Scale-safe planning for naive global RANGE-interval frames — the
  * time-series trailing window: `SUM(x) OVER (ORDER BY ts RANGE BETWEEN
  * INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)` and its numeric-key
  * twin (`RANGE BETWEEN 3600000000 PRECEDING ...` over epoch micros).
  * Stock Spark plans the empty-partition form as a SinglePartition
  * WindowExec — the whole table through one task — like every other
  * member of the global-window family this package rescues.
  *
  * A value-based trailing frame needs the predecessor rows whose key
  * falls within `x` of the current key. After the range exchange those
  * are almost always partition-local; the only missing rows are each
  * partition's leading edge. So: one tiny job collects, per partition,
  * its trailing VALUE-window (the rows with key ≥ maxKey − x — the
  * same deque the local pass keeps) plus its first non-null key; the
  * driver ships partition p every predecessor row with key ≥
  * minKey(p) − x. Shipped volume is bounded by the frame's own row
  * density (the rows a single frame spans), not by data size — the
  * honest cost of a value window, and exactly what the frame itself
  * reads.
  *
  * Locally, rows are processed one TIE RUN at a time (the range
  * exchange co-locates equal keys, so a run never spans partitions):
  * the trailing deque is pruned to `key ≥ K − x`, each aggregate folds
  * deque + run left-to-right, and every row of the run shares the
  * result — RANGE upper bound CURRENT ROW is peer-inclusive in both
  * engines. Rows with NULL keys form their own peer group (frame = the
  * null run itself) and never enter any arithmetic frame, matching the
  * built-in's null-peer semantics.
  *
  * Matched shape: empty partition spec, ONE ascending order key of
  * integer / bigint / timestamp type, all window expressions
  * deterministic [[DeclarativeAggregate]]s over `RANGE (literal x)
  * PRECEDING .. CURRENT ROW` frames (interval literals allowed on
  * timestamp keys when month-free; month offsets are not fixed-width
  * in micros). Mixed widths in one node are fine — each function
  * prunes its own slice of the shared deque.
  *
  * Opt-out: shares `spark.graft.globalRowNumber.enabled`.
  */
object GlobalRangeFrameStrategy extends SparkStrategy {
  import GlobalRangeFrameExec.RangeAgg

  private val MicrosPerDay = 86400000000L

  /** Foldable lower bound → lookbehind width in key units (micros for
    * timestamp keys); None for unsupported shapes. */
  private def widthOf(lo: Expression): Option[Long] =
    if (!lo.foldable) None
    else lo.eval() match {
      case i: java.lang.Integer if i < 0 => Some(-i.longValue())
      case l: java.lang.Long if l < 0 => Some(-l.longValue())
      case ci: CalendarInterval if ci.months == 0 =>
        val micros = ci.days * MicrosPerDay + ci.microseconds
        if (micros < 0) Some(-micros) else None
      case _ => None
    }

  private def funcOf(e: NamedExpression): Option[RangeAgg] = e match {
    case Alias(WindowExpression(
          AggregateExpression(f: DeclarativeAggregate, Complete, false, None, _),
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(RangeFrame, lo, CurrentRow))), _)
        if f.deterministic =>
      widthOf(lo).map(x => RangeAgg(f, x, e.toAttribute))
    case _ => None
  }

  /** Per-expression / node-level categorizers for [[GlobalWindowSplit]]. */
  private[plans] def rescuable(e: NamedExpression): Boolean = funcOf(e).isDefined
  private[plans] def orderRescuable(w: logical.Window): Boolean =
    w.orderSpec.length == 1 && w.orderSpec.head.direction == Ascending &&
      (w.orderSpec.head.child.dataType match {
        case IntegerType | LongType | TimestampType => true
        case _ => false
      })

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: logical.Window
        if w.partitionSpec.isEmpty && orderRescuable(w) &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          SQLConf.get.getConfString(GlobalRowNumberStrategy.ConfKey, "true").toBoolean =>
      GlobalRangeFrameExec(w.orderSpec,
        w.windowExpressions.map(funcOf(_).get), planLater(w.child)) :: Nil
    case _ => Nil
  }
}

object GlobalRangeFrameExec {
  /** One value-window aggregate over `(x PRECEDING, CURRENT ROW]` in
    * key units. */
  case class RangeAgg(agg: DeclarativeAggregate, x: Long, attr: Attribute)
}

/** Physical distributed RANGE-frame aggregation: range-shuffled sorted
  * input + one boundary job shipping each partition's leading edge its
  * missing value-window, then tie-run-at-a-time frame folds over a
  * trailing deque. */
case class GlobalRangeFrameExec(order: Seq[SortOrder],
                                funcs: Seq[GlobalRangeFrameExec.RangeAgg],
                                child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ funcs.map(_.attr)

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val resultAttrs = output
    val funcsLocal = funcs.toArray
    val maxX = funcsLocal.map(_.x).max
    val keyExpr = order.head.child
    val keyIsInt = keyExpr.dataType == IntegerType
    val rdd = child.execute()

    // boundary job: per partition, (first non-null key, the trailing
    // value-window = rows with key ≥ maxKey − maxX). The deque is the
    // same structure the local pass keeps — memory bounded by one
    // frame's row span.
    val stats: Array[(Option[Long], Array[(Long, UnsafeRow)])] =
      rdd.sparkContext.runJob(rdd, (iter: Iterator[InternalRow]) => {
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        val keyProj = UnsafeProjection.create(Seq(keyExpr), childOutput)
        var firstKey: Option[Long] = None
        val tail = new scala.collection.mutable.ArrayDeque[(Long, UnsafeRow)]
        while (iter.hasNext) {
          val row = iter.next()
          val kr = keyProj(row)
          if (!kr.isNullAt(0)) {
            val k = if (keyIsInt) kr.getInt(0).toLong else kr.getLong(0)
            if (firstKey.isEmpty) firstKey = Some(k)
            tail += ((k, toUnsafe(row).copy()))
            while (tail.head._1 < k - maxX) tail.removeHead()
          }
        }
        (firstKey, tail.toArray)
      })
    // stitch: partition p receives every predecessor row with key ≥
    // minKey(p) − maxX (a subset of the collected tails, since
    // minKey(p) ≥ every predecessor maxKey)
    val nParts = stats.length
    val preTails: Array[Array[(Long, UnsafeRow)]] = Array.tabulate(nParts) { p =>
      stats(p)._1 match {
        case None => Array.empty[(Long, UnsafeRow)]
        case Some(minKey) =>
          val cut = minKey - maxX
          (0 until p).iterator.flatMap(q => stats(q)._2.iterator)
            .filter(_._1 >= cut).toArray
      }
    }

    rdd.mapPartitionsWithIndex { (pid, iter) =>
      val buffers = funcsLocal.map(f =>
        new SpecificInternalRow(f.agg.aggBufferAttributes.map(_.dataType)))
      val inits = funcsLocal.zipWithIndex.map { case (f, i) =>
        val p = MutableProjection.create(f.agg.initialValues, Nil)
        p.target(buffers(i)); p
      }
      val updates = funcsLocal.zipWithIndex.map { case (f, i) =>
        val p = MutableProjection.create(f.agg.updateExpressions,
          f.agg.aggBufferAttributes ++ childOutput)
        p.target(buffers(i)); p
      }
      val evals = funcsLocal.map(f =>
        UnsafeProjection.create(Seq(f.agg.evaluateExpression),
          f.agg.aggBufferAttributes))
      val attrTypes = funcsLocal.map(_.attr.dataType)
      val keyProj = UnsafeProjection.create(Seq(keyExpr), childOutput)
      val joinBI = new JoinedRow
      val joinOut = new JoinedRow
      val outProj = UnsafeProjection.create(resultAttrs, resultAttrs)

      // trailing value-window, seeded with the stitched predecessor edge
      val deque = new scala.collection.mutable.ArrayDeque[(Long, UnsafeRow)]
      preTails(pid).foreach(deque += _)

      new Iterator[InternalRow] {
        // current tie run (copies — the scan iterator reuses its row)
        private val run = new scala.collection.mutable.ArrayBuffer[InternalRow]
        private val runVals = new GenericInternalRow(funcsLocal.length)
        private var runPos = 0
        private var pendingNext: InternalRow = _
        private var pendingKey = 0L
        private var pendingNull = false

        private def fillRun(): Unit = {
          run.clear(); runPos = 0
          var runKey = 0L
          var runNull = false
          if (pendingNext != null) {
            run += pendingNext; runKey = pendingKey; runNull = pendingNull
            pendingNext = null
          } else if (iter.hasNext) {
            val r = iter.next().copy()
            val kr = keyProj(r)
            runNull = kr.isNullAt(0)
            runKey = if (runNull) 0L else if (keyIsInt) kr.getInt(0).toLong else kr.getLong(0)
            run += r
          } else return
          var done = false
          while (!done && iter.hasNext) {
            val r = iter.next().copy()
            val kr = keyProj(r)
            val isNull = kr.isNullAt(0)
            val k = if (isNull) 0L else if (keyIsInt) kr.getInt(0).toLong else kr.getLong(0)
            if (isNull == runNull && (isNull || k == runKey)) run += r
            else { pendingNext = r; pendingKey = k; pendingNull = isNull; done = true }
          }
          // frame for the whole run: null runs are their own peer group;
          // arithmetic runs take the deque slice within each width
          if (!runNull) while (deque.nonEmpty && deque.head._1 < runKey - maxX)
            deque.removeHead()
          var i = 0
          while (i < funcsLocal.length) {
            inits(i)(InternalRow.empty)
            if (!runNull) {
              val cut = runKey - funcsLocal(i).x
              var p = 0
              // skip entries below this function's narrower width
              while (p < deque.length && deque(p)._1 < cut) p += 1
              while (p < deque.length) {
                updates(i)(joinBI(buffers(i), deque(p)._2))
                p += 1
              }
            }
            var j = 0
            while (j < run.length) {
              updates(i)(joinBI(buffers(i), run(j)))
              j += 1
            }
            runVals.update(i, evals(i)(buffers(i)).get(0, attrTypes(i)))
            i += 1
          }
          // the run joins the trailing window for later rows (null-key
          // rows never do: they are outside every arithmetic frame)
          if (!runNull) {
            val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
            run.foreach(r => deque += ((runKey, r match {
              case u: UnsafeRow => u
              case other => toUnsafe(other).copy()
            })))
          }
        }

        override def hasNext: Boolean =
          runPos < run.length || pendingNext != null || iter.hasNext

        override def next(): InternalRow = {
          if (runPos >= run.length) fillRun()
          val row = run(runPos)
          runPos += 1
          outProj(joinOut(row, runVals))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
