package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, CurrentRow, Expression, GenericInternalRow, JoinedRow, Literal, MutableProjection, NamedExpression, RowFrame, SortOrder, SpecificInternalRow, SpecifiedWindowFrame, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, DeclarativeAggregate, First, Last}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Scale-safe planning for naive global SLIDING aggregates — the moving
  * average: `AVG(x) OVER (ORDER BY ts ROWS BETWEEN k PRECEDING AND
  * CURRENT ROW)`, the centered variant `... k PRECEDING AND j
  * FOLLOWING`, and the lookahead variant `... CURRENT ROW AND j
  * FOLLOWING` — the sliding members of the global-window family
  * ([[GlobalRowNumberStrategy]] ranks, [[GlobalOffsetWindowStrategy]]
  * offsets, [[GlobalRunningAggStrategy]] running frames,
  * [[GlobalConstantAggStrategy]] whole-table constants) that stock
  * Spark funnels through one task.
  *
  * A (k PRECEDING, j FOLLOWING) frame needs exactly k predecessor and j
  * successor rows — the lag/lead problem, solved the same way:
  * range-shuffle, then one tiny job collects each partition's first
  * max-j and last max-k rows and the driver stitches each partition's
  * missing neighbors (bounded by (k + j) × partitions rows). Locally
  * every row re-aggregates its frame from a trailing ring plus a
  * lookahead queue — O(k + j) updates per row, the same work WindowExec
  * does for non-invertible frames, but spread over every core instead
  * of one. Aggregates are generic [[DeclarativeAggregate]]s (sum,
  * count, min, max, avg, first/last), each driven through its own
  * init/update/evaluate projections; mixed frame shapes in one node are
  * fine (each function folds its own slice of the buffers).
  *
  * The floating-point caveat of the running rescue does NOT apply
  * here: each output value is one sequential left-to-right fold over
  * its frame rows — the same association WindowExec uses — so even
  * double sums match the built-in bit-for-bit.
  *
  * Frames that exclude the current row (`5 PRECEDING AND 2 PRECEDING`)
  * are NOT matched: they can be empty, which needs per-function
  * empty-frame null semantics — rare enough to leave to the built-in.
  *
  * PARTITIONED sliding frames — the per-key moving average, `AVG(x)
  * OVER (PARTITION BY user ORDER BY ts ROWS k PRECEDING)` — ride the
  * same machinery over a range exchange on (partition keys ⧺ order
  * key): a key's rows are contiguous under that sort, so the per-key
  * frame is the global frame CLIPPED at the key boundary, and the clip
  * is one byte-equality per fold row (trailing rows of a foreign key
  * are skipped, lookahead stops at the first foreign key). A hot key
  * spans tasks instead of pinning one; frames containing the current
  * row can still never be empty per key.
  *
  * Opt-out: shares `spark.graft.globalRowNumber.enabled`.
  */
object GlobalSlidingAggStrategy extends SparkStrategy {
  import GlobalSlidingAggExec.SlidingAgg

  /** Row-frame boundary as a signed row offset (negative = preceding);
    * None for unbounded or non-literal bounds. */
  private def boundOf(e: Expression): Option[Int] = e match {
    case CurrentRow => Some(0)
    case Literal(i: java.lang.Integer, IntegerType) => Some(i.intValue())
    case Literal(l: java.lang.Long, LongType) => Some(Math.toIntExact(l.longValue()))
    case _ => None
  }

  private def funcOf(e: NamedExpression): Option[SlidingAgg] = e match {
    case Alias(WindowExpression(
          AggregateExpression(f: DeclarativeAggregate, Complete, false, None, _),
          WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, lo, hi))), _)
        if f.deterministic || f.isInstanceOf[First] || f.isInstanceOf[Last] =>
      (boundOf(lo), boundOf(hi)) match {
        // frame must CONTAIN the current row (lo ≤ 0 ≤ hi): it can then
        // never be empty, so no empty-frame null semantics are needed
        case (Some(l), Some(h)) if l <= 0 && h >= 0 && (l < 0 || h > 0) =>
          Some(SlidingAgg(f, -l, h, e.toAttribute))
        case _ => None
      }
    case _ => None
  }

  /** Per-expression categorizer for [[GlobalWindowSplit]]. */
  private[plans] def rescuable(e: NamedExpression): Boolean = funcOf(e).isDefined

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: logical.Window
        if w.partitionSpec.forall(_.deterministic) && w.orderSpec.nonEmpty &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          (w.partitionSpec.isEmpty || GlobalWindowGate.perKeyWorthwhile(w)) &&
          SQLConf.get.getConfString(GlobalRowNumberStrategy.ConfKey, "true").toBoolean =>
      GlobalSlidingAggExec(w.partitionSpec, w.orderSpec,
        w.windowExpressions.map(funcOf(_).get), planLater(w.child)) :: Nil
    case _ => Nil
  }
}

object GlobalSlidingAggExec {
  /** One sliding aggregate column over `(k PRECEDING, j FOLLOWING)`
    * (j = 0 ⇒ `CURRENT ROW` upper bound). */
  case class SlidingAgg(agg: DeclarativeAggregate, k: Int, j: Int,
                        attr: Attribute)
}

/** Physical distributed sliding-frame aggregation: range-shuffled
  * sorted input + the boundary job of [[GlobalOffsetWindowExec]]
  * (per-partition heads and tails, driver stitch), then per-row frame
  * folds over a trailing ring and a lookahead queue. */
case class GlobalSlidingAggExec(partition: Seq[Expression],
                                order: Seq[SortOrder],
                                funcs: Seq[GlobalSlidingAggExec.SlidingAgg],
                                child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ funcs.map(_.attr)

  private def partOrders: Seq[SortOrder] =
    partition.map(e => SortOrder(e, Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(partOrders ++ order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partOrders ++ order)
  override def outputOrdering: Seq[SortOrder] = partOrders ++ order
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val resultAttrs = output
    val partExprs = partition
    val keyGuard = partExprs.nonEmpty
    val funcsLocal = funcs.toArray
    val maxK = funcsLocal.map(_.k).max // deepest lookbehind
    val maxJ = funcsLocal.map(_.j).max // deepest lookahead
    val rdd = child.execute()

    // boundary job: each partition's (count, first maxJ rows, last maxK
    // rows) — full child rows, the frames may reference any column
    val stats: Array[(Long, Array[UnsafeRow], Array[UnsafeRow])] =
      rdd.sparkContext.runJob(rdd, (iter: Iterator[InternalRow]) => {
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        var cnt = 0L
        val head = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
        val tail = new Array[UnsafeRow](math.max(maxK, 1))
        while (iter.hasNext) {
          val u = toUnsafe(iter.next())
          if (cnt < maxJ) head += u.copy()
          if (maxK > 0) tail((cnt % maxK).toInt) = u.copy()
          cnt += 1
        }
        val tailSeq =
          if (maxK == 0 || cnt == 0) Array.empty[UnsafeRow]
          else {
            val n = math.min(cnt, maxK).toInt
            Array.tabulate(n)(i => tail(((cnt - n + i) % maxK).toInt))
          }
        (cnt, head.toArray, tailSeq)
      })
    val nParts = stats.length
    val counts = stats.map(_._1)
    def predecessorTail(p: Int): Array[UnsafeRow] = {
      val out = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
      var i = p - 1
      while (i >= 0 && out.length < maxK) {
        val t = stats(i)._3
        var j = t.length - 1
        while (j >= 0 && out.length < maxK) { out += t(j); j -= 1 }
        i -= 1
      }
      out.reverse.toArray // oldest-to-newest
    }
    def successorHead(p: Int): Array[UnsafeRow] = {
      val out = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
      var i = p + 1
      while (i < nParts && out.length < maxJ) {
        val h = stats(i)._2
        var j = 0
        while (j < h.length && out.length < maxJ) { out += h(j); j += 1 }
        i += 1
      }
      out.toArray
    }
    val preTails = Array.tabulate(nParts)(predecessorTail)
    val sucHeads = Array.tabulate(nParts)(successorHead)

    // each task ships only its own edge rows + count ([[PerPartition.stitch]])
    PerPartition.stitch(rdd, (0 until nParts).map(p =>
      (preTails(p), sucHeads(p), counts(p)))) { (slice, iter) =>
      val (preTail, sucHead, partCount) = slice
      // per-function machinery: own buffer + projections, folded over
      // its own slice of the trailing ring and lookahead queue
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
      // TWO projection instances (separate buffers) so the current row's
      // key and a fold candidate's key compare without copying; window
      // partition keys are float-normalized upstream, byte equality is
      // exact
      val rowKeyProj = UnsafeProjection.create(partExprs, childOutput)
      val neighKeyProj = UnsafeProjection.create(partExprs, childOutput)

      // trailing ring of up to maxK predecessor rows (stitched + own,
      // copies — the scan iterator reuses its row); lookahead queue of
      // the current row + up to maxJ successors, extended past the
      // partition end with the stitched successor head. Emitted rows are
      // only this partition's own (counts(pid) of them).
      val lagBuf = new scala.collection.mutable.ArrayDeque[InternalRow]
      preTail.foreach(lagBuf += _)
      val source: Iterator[InternalRow] =
        iter.map(_.copy()) ++ sucHead.iterator
      val leadBuf = new scala.collection.mutable.ArrayDeque[InternalRow]

      new Iterator[InternalRow] {
        private var emitted = 0L
        override def hasNext: Boolean = emitted < partCount
        override def next(): InternalRow = {
          while (leadBuf.length < maxJ + 1 && source.hasNext)
            leadBuf += source.next()
          val row = leadBuf.head
          val rowKey = if (keyGuard) rowKeyProj(row) else null
          // per-key clip: a key's rows are contiguous, so same-key rows
          // form a SUFFIX of the trailing ring and a PREFIX of the
          // lookahead queue — the first same-key trailing index and the
          // first foreign lookahead index bound every function's fold
          var clipStart = 0
          var clipEnd = leadBuf.length
          if (keyGuard) {
            clipStart = lagBuf.length
            while (clipStart > 0 &&
              neighKeyProj(lagBuf(clipStart - 1)).equals(rowKey)) clipStart -= 1
            var e = 1 // leadBuf(0) is the current row
            while (e < leadBuf.length &&
              neighKeyProj(leadBuf(e)).equals(rowKey)) e += 1
            clipEnd = e
          }
          var i = 0
          while (i < funcsLocal.length) {
            inits(i)(InternalRow.empty)
            // left-to-right fold over the last k_i trailing rows, the
            // current row, then the next j_i lookahead rows — the same
            // association WindowExec uses — clipped at the key boundary
            var p = math.max(clipStart, lagBuf.length - funcsLocal(i).k)
            while (p < lagBuf.length) {
              updates(i)(joinBI(buffers(i), lagBuf(p)))
              p += 1
            }
            var q = 0
            val qEnd = math.min(clipEnd, funcsLocal(i).j + 1)
            while (q < qEnd) {
              updates(i)(joinBI(buffers(i), leadBuf(q)))
              q += 1
            }
            valueRow.update(i, evals(i)(buffers(i)).get(0, attrTypes(i)))
            i += 1
          }
          val out = outProj(joinOut(row, valueRow))
          // slide: current row becomes lag history
          if (maxK > 0) {
            lagBuf += row
            if (lagBuf.length > maxK) lagBuf.removeHead()
          }
          leadBuf.removeHead()
          emitted += 1
          out
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
