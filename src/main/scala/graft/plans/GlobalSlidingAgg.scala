package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CurrentRow, GenericInternalRow, JoinedRow, Literal, MutableProjection, NamedExpression, RowFrame, SortOrder, SpecificInternalRow, SpecifiedWindowFrame, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, DeclarativeAggregate, First, Last}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Scale-safe planning for naive global SLIDING aggregates — the moving
  * average: `AVG(x) OVER (ORDER BY ts ROWS BETWEEN k PRECEDING AND
  * CURRENT ROW)` and friends, the last member of the global-window
  * family ([[GlobalRowNumberStrategy]] ranks, [[GlobalOffsetWindowStrategy]]
  * offsets, [[GlobalRunningAggStrategy]] running frames) that stock
  * Spark funnels through one task.
  *
  * A k-preceding frame needs exactly k predecessor rows — the lag
  * problem, solved the same way: range-shuffle, then one tiny job
  * collects each partition's last max-k rows and the driver stitches
  * each partition's missing predecessors (bounded by k × partitions
  * rows). Locally every row re-aggregates its frame from a ring of the
  * trailing rows — O(k) updates per row, the same work WindowExec does
  * for non-invertible frames, but spread over every core instead of
  * one. Aggregates are generic [[DeclarativeAggregate]]s (sum, count,
  * min, max, avg, first/last), each driven through its own
  * init/update/evaluate projections; mixed frame widths in one node
  * are fine (each function folds its own k rows).
  *
  * The floating-point caveat of the running rescue does NOT apply
  * here: each output value is one sequential left-to-right fold over
  * its frame rows — the same association WindowExec uses — so even
  * double sums match the built-in bit-for-bit.
  *
  * Opt-out: shares `spark.graft.globalRowNumber.enabled`.
  */
object GlobalSlidingAggStrategy extends SparkStrategy {
  import GlobalSlidingAggExec.SlidingAgg

  private def funcOf(e: NamedExpression): Option[SlidingAgg] = e match {
    case Alias(WindowExpression(
          AggregateExpression(f: DeclarativeAggregate, Complete, false, None, _),
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(RowFrame, Literal(lo, IntegerType | LongType),
              CurrentRow))), _)
        if (f.deterministic || f.isInstanceOf[First] || f.isInstanceOf[Last]) &&
          (lo match {
            case i: java.lang.Integer => i < 0
            case l: java.lang.Long => l < 0L
            case _ => false
          }) =>
      val k = lo match {
        case i: java.lang.Integer => -i.intValue()
        case l: java.lang.Long => Math.toIntExact(-l.longValue())
      }
      Some(SlidingAgg(f, k, e.toAttribute))
    case _ => None
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: logical.Window
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          SQLConf.get.getConfString(GlobalRowNumberStrategy.ConfKey, "true").toBoolean =>
      GlobalSlidingAggExec(w.orderSpec,
        w.windowExpressions.map(funcOf(_).get), planLater(w.child)) :: Nil
    case _ => Nil
  }
}

object GlobalSlidingAggExec {
  /** One sliding aggregate column over `(k PRECEDING, CURRENT ROW)`. */
  case class SlidingAgg(agg: DeclarativeAggregate, k: Int, attr: Attribute)
}

/** Physical distributed sliding-frame aggregation: range-shuffled
  * sorted input + the boundary job of [[GlobalOffsetWindowExec]]
  * (per-partition tails, driver stitch), then per-row frame folds over
  * a trailing ring. */
case class GlobalSlidingAggExec(order: Seq[SortOrder],
                                funcs: Seq[GlobalSlidingAggExec.SlidingAgg],
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
    val maxK = funcsLocal.map(_.k).max
    val rdd = child.execute()

    // boundary job: each partition's last maxK rows (full child rows —
    // the frames may reference any column)
    val stats: Array[(Long, Array[UnsafeRow])] =
      rdd.sparkContext.runJob(rdd, (iter: Iterator[InternalRow]) => {
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        var cnt = 0L
        val tail = new Array[UnsafeRow](math.max(maxK, 1))
        while (iter.hasNext) {
          val u = toUnsafe(iter.next())
          if (maxK > 0) tail((cnt % maxK).toInt) = u.copy()
          cnt += 1
        }
        val tailSeq =
          if (maxK == 0 || cnt == 0) Array.empty[UnsafeRow]
          else {
            val n = math.min(cnt, maxK).toInt
            Array.tabulate(n)(i => tail(((cnt - n + i) % maxK).toInt))
          }
        (cnt, tailSeq)
      })
    val nParts = stats.length
    def predecessorTail(p: Int): Array[UnsafeRow] = {
      val out = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
      var i = p - 1
      while (i >= 0 && out.length < maxK) {
        val t = stats(i)._2
        var j = t.length - 1
        while (j >= 0 && out.length < maxK) { out += t(j); j -= 1 }
        i -= 1
      }
      out.reverse.toArray // oldest-to-newest
    }
    val preTails = Array.tabulate(nParts)(predecessorTail)

    rdd.mapPartitionsWithIndex { (pid, iter) =>
      // per-function machinery: own buffer + projections, folded over
      // its own k-row suffix of the ring
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
      val joinBI = new JoinedRow
      val joinOut = new JoinedRow
      val valueRow = new GenericInternalRow(funcsLocal.length)
      val outProj = UnsafeProjection.create(resultAttrs, resultAttrs)

      // trailing ring of up to maxK+1 rows (stitched predecessors +
      // this partition's recent rows, copies — the scan iterator
      // reuses its row); emitted rows are only this partition's own
      val ring = new scala.collection.mutable.ArrayDeque[InternalRow]
      preTails(pid).foreach(ring += _)

      iter.map { rawRow =>
        val row = rawRow.copy()
        ring += row
        if (ring.length > maxK + 1) ring.removeHead()
        var i = 0
        while (i < funcsLocal.length) {
          inits(i)(InternalRow.empty)
          // left-to-right fold over the last (k_i + 1) ring rows —
          // the same association WindowExec uses
          val from = math.max(0, ring.length - (funcsLocal(i).k + 1))
          var j = from
          while (j < ring.length) {
            updates(i)(joinBI(buffers(i), ring(j)))
            j += 1
          }
          valueRow.update(i, evals(i)(buffers(i)).get(0, attrTypes(i)))
          i += 1
        }
        outProj(joinOut(row, valueRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
