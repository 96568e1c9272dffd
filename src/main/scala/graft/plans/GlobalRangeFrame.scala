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
  * time-series value windows: the trailing `SUM(x) OVER (ORDER BY ts
  * RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)`, the
  * CENTERED smoothing window `RANGE BETWEEN 30m PRECEDING AND 30m
  * FOLLOWING`, and the pure lookahead `CURRENT ROW AND 1h FOLLOWING` —
  * plus their numeric-key twins over epoch micros. Stock Spark plans
  * the empty-partition form as a SinglePartition WindowExec — the whole
  * table through one task — like every other member of the
  * global-window family this package rescues.
  *
  * A value frame `[K − x, K + y]` needs, per row, its key neighborhood.
  * After the range exchange that neighborhood is almost always
  * partition-local; the only missing rows are each partition's edges.
  * So one tiny job collects, per partition, its trailing x-window (the
  * rows with key ≥ maxKey − x — the same deque the local pass keeps),
  * its LEADING y-window (the rows with key ≤ minKey + y), and its
  * first/last non-null keys; the driver then ships partition p every
  * predecessor row with key ≥ minKey(p) − x and every successor row
  * with key ≤ maxKey(p) + y. Shipped volume is bounded by the frame's
  * own row density (the rows a single frame spans), not by data size —
  * the honest cost of a value window, and exactly what the frame itself
  * reads.
  *
  * Locally, rows are processed one TIE RUN at a time (the range
  * exchange co-locates equal keys, so a run never spans partitions):
  * the trailing deque is pruned to `key ≥ K − x`, runs are read AHEAD
  * until the first run past `K + y` (a bounded lookahead FIFO — the
  * frame's own forward span), and each aggregate folds deque + run +
  * ahead + stitched successors left-to-right in key order — the same
  * sequential fold WindowExec performs. Every row of the run shares the
  * result — RANGE bounds are peer-inclusive in both engines. Rows with
  * NULL keys form their own peer group (frame = the null run itself)
  * and never enter any arithmetic frame, matching the built-in's
  * null-peer semantics.
  *
  * Matched shape: empty partition spec, ONE ascending order key of
  * integer / bigint / timestamp type, all window expressions
  * deterministic [[DeclarativeAggregate]]s over `RANGE` frames with a
  * literal-or-CURRENT-ROW bound on each side (interval literals allowed
  * on timestamp keys when month-free; month offsets are not fixed-width
  * in micros). Mixed widths in one node are fine — each function reads
  * its own slice of the shared deque / lookahead.
  *
  * Opt-out: shares `spark.graft.globalRowNumber.enabled`.
  */
object GlobalRangeFrameStrategy extends SparkStrategy {
  import GlobalRangeFrameExec.RangeAgg

  private val MicrosPerDay = 86400000000L

  /** Foldable bound → |width| in key units (micros for timestamp keys),
    * requiring the bound's sign to match `sign` (PRECEDING bounds are
    * negative, FOLLOWING positive); None for unsupported shapes. */
  private def widthOf(bound: Expression, sign: Int): Option[Long] = bound match {
    case CurrentRow => Some(0L)
    case e if e.foldable =>
      val v = e.eval() match {
        case i: java.lang.Integer => Some(i.longValue())
        case l: java.lang.Long => Some(l.longValue())
        case ci: CalendarInterval if ci.months == 0 =>
          Some(ci.days * MicrosPerDay + ci.microseconds)
        case _ => None
      }
      v.collect { case w if w * sign > 0 => math.abs(w) }
    case _ => None
  }

  private def funcOf(e: NamedExpression): Option[RangeAgg] = e match {
    case Alias(WindowExpression(
          AggregateExpression(f: DeclarativeAggregate, Complete, false, None, _),
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(RangeFrame, lo, hi))), _)
        if f.deterministic =>
      for {
        x <- widthOf(lo, -1)
        y <- widthOf(hi, 1)
        if x + y > 0 // both CURRENT ROW = peers-only; leave to the built-in
      } yield RangeAgg(f, x, y, e.toAttribute)
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
  /** One value-window aggregate over `[K − x, K + y]` in key units. */
  case class RangeAgg(agg: DeclarativeAggregate, x: Long, y: Long,
                      attr: Attribute)
}

/** Physical distributed RANGE-frame aggregation: range-shuffled sorted
  * input + one boundary job shipping each partition's missing edge
  * value-windows (trailing for PRECEDING, leading for FOLLOWING), then
  * tie-run-at-a-time frame folds over a trailing deque and a bounded
  * lookahead FIFO. */
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
    val maxY = funcsLocal.map(_.y).max
    val keyExpr = order.head.child
    val keyIsInt = keyExpr.dataType == IntegerType
    val rdd = child.execute()

    // boundary job: per partition, (first/last non-null key, the
    // trailing x-window = rows with key ≥ maxKey − maxX, the leading
    // y-window = rows with key ≤ minKey + maxY). Both edge windows are
    // the structures the local pass keeps anyway — memory bounded by
    // one frame's row span.
    val stats: Array[(Option[Long], Option[Long],
        Array[(Long, UnsafeRow)], Array[(Long, UnsafeRow)])] =
      rdd.sparkContext.runJob(rdd, (iter: Iterator[InternalRow]) => {
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        val keyProj = UnsafeProjection.create(Seq(keyExpr), childOutput)
        var firstKey: Option[Long] = None
        var lastKey: Option[Long] = None
        val tail = new scala.collection.mutable.ArrayDeque[(Long, UnsafeRow)]
        val head = new scala.collection.mutable.ArrayBuffer[(Long, UnsafeRow)]
        while (iter.hasNext) {
          val row = iter.next()
          val kr = keyProj(row)
          if (!kr.isNullAt(0)) {
            val k = if (keyIsInt) kr.getInt(0).toLong else kr.getLong(0)
            if (firstKey.isEmpty) firstKey = Some(k)
            lastKey = Some(k)
            if (maxX > 0) {
              tail += ((k, toUnsafe(row).copy()))
              while (tail.head._1 < k - maxX) tail.removeHead()
            }
            if (maxY > 0 && k <= firstKey.get + maxY)
              head += ((k, toUnsafe(row).copy()))
          }
        }
        (firstKey, lastKey, tail.toArray, head.toArray)
      })
    val nParts = stats.length
    // stitch (predecessor side): partition p receives every predecessor
    // row with key ≥ minKey(p) − maxX (a subset of the collected tails,
    // since minKey(p) ≥ every predecessor maxKey)
    val preTails: Array[Array[(Long, UnsafeRow)]] = Array.tabulate(nParts) { p =>
      stats(p)._1 match {
        case Some(minKey) if maxX > 0 =>
          val cut = minKey - maxX
          (0 until p).iterator.flatMap(q => stats(q)._3.iterator)
            .filter(_._1 >= cut).toArray
        case _ => Array.empty[(Long, UnsafeRow)]
      }
    }
    // stitch (successor side): partition p receives every successor row
    // with key ≤ maxKey(p) + maxY (a subset of the collected heads,
    // since maxKey(p) ≤ every successor minKey), in key order
    val postHeads: Array[Array[(Long, UnsafeRow)]] = Array.tabulate(nParts) { p =>
      stats(p)._2 match {
        case Some(maxKey) if maxY > 0 =>
          val cut = maxKey + maxY
          (p + 1 until nParts).iterator.flatMap(q => stats(q)._4.iterator)
            .filter(_._1 <= cut).toArray
        case _ => Array.empty[(Long, UnsafeRow)]
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
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val joinBI = new JoinedRow
      val joinOut = new JoinedRow
      val outProj = UnsafeProjection.create(resultAttrs, resultAttrs)
      val post = postHeads(pid)

      // one tie run: equal-key rows (or one run of null-key rows)
      final class Run(val key: Long, val isNull: Boolean) {
        val rows = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
      }

      // trailing value-window, seeded with the stitched predecessor edge
      val deque = new scala.collection.mutable.ArrayDeque[(Long, UnsafeRow)]
      preTails(pid).foreach(deque += _)

      new Iterator[InternalRow] {
        // runs read from iter but not yet emitted; head = current run
        private val pending = new scala.collection.mutable.ArrayDeque[Run]
        private val runVals = new GenericInternalRow(funcsLocal.length)
        private var cur: Run = _
        private var curPos = 0
        private var readDone = false

        private def readRun(): Unit = {
          if (readDone || !iter.hasNext) { readDone = true; return }
          var r = toUnsafe(iter.next()).copy()
          var kr = keyProj(r)
          val isNull = kr.isNullAt(0)
          val key = if (isNull) 0L else if (keyIsInt) kr.getInt(0).toLong else kr.getLong(0)
          // continue the previous run if this row is its peer
          pending.lastOption match {
            case Some(run) if run.isNull == isNull && (isNull || run.key == key) =>
              run.rows += r
            case _ =>
              val run = new Run(key, isNull)
              run.rows += r
              pending += run
          }
          if (!iter.hasNext) readDone = true
        }

        /** Read ahead until the lookahead horizon for key K is covered:
          * a run with key > K + maxY exists, a null run follows (null
          * keys are outside every arithmetic frame), or input ends.
          * At maxY = 0 this still reads one run past K — which is what
          * COMPLETES the current tie run before its frame is folded. */
        private def fillAhead(k: Long): Unit = {
          var done = false
          while (!done) {
            val last = pending.lastOption
            val covered = last.exists(r =>
              (r ne cur) && (r.isNull || r.key > k + maxY))
            if (covered || readDone) done = true else readRun()
          }
        }

        private def advance(): Unit = {
          if (pending.isEmpty) readRun()
          if (pending.isEmpty) return
          cur = pending.head
          curPos = 0
          if (cur.isNull) {
            // null peer group: frame = the run itself — complete it first
            while (!readDone && pending.length < 2) readRun()
            var i = 0
            while (i < funcsLocal.length) {
              inits(i)(InternalRow.empty)
              var j = 0
              while (j < cur.rows.length) {
                updates(i)(joinBI(buffers(i), cur.rows(j))); j += 1
              }
              runVals.update(i, evals(i)(buffers(i)).get(0, attrTypes(i)))
              i += 1
            }
          } else {
            val k = cur.key
            fillAhead(k)
            while (deque.nonEmpty && deque.head._1 < k - maxX) deque.removeHead()
            var i = 0
            while (i < funcsLocal.length) {
              val f = funcsLocal(i)
              inits(i)(InternalRow.empty)
              // 1) trailing deque slice within this function's x-width
              val cut = k - f.x
              var p = 0
              while (p < deque.length && deque(p)._1 < cut) p += 1
              while (p < deque.length) {
                updates(i)(joinBI(buffers(i), deque(p)._2)); p += 1
              }
              // 2) the run itself
              var j = 0
              while (j < cur.rows.length) {
                updates(i)(joinBI(buffers(i), cur.rows(j))); j += 1
              }
              // 3) lookahead runs within this function's y-width
              if (f.y > 0) {
                val it = pending.iterator
                it.next() // skip cur
                var stop = false
                while (!stop && it.hasNext) {
                  val r = it.next()
                  if (r.isNull || r.key > k + f.y) stop = true
                  else {
                    var j2 = 0
                    while (j2 < r.rows.length) {
                      updates(i)(joinBI(buffers(i), r.rows(j2))); j2 += 1
                    }
                  }
                }
                // 4) stitched successors past the partition end
                var q = 0
                while (q < post.length && post(q)._1 <= k + f.y) {
                  updates(i)(joinBI(buffers(i), post(q)._2)); q += 1
                }
              }
              runVals.update(i, evals(i)(buffers(i)).get(0, attrTypes(i)))
              i += 1
            }
            // the run joins the trailing window for later rows (null-key
            // rows never do: they are outside every arithmetic frame)
            if (maxX > 0) cur.rows.foreach(r => deque += ((k, r)))
          }
          pending.removeHead()
        }

        override def hasNext: Boolean =
          (cur != null && curPos < cur.rows.length) ||
            pending.nonEmpty || !readDone && iter.hasNext

        override def next(): InternalRow = {
          if (cur == null || curPos >= cur.rows.length) advance()
          val row = cur.rows(curPos)
          curPos += 1
          outProj(joinOut(row, runVals))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
