package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, FrameLessOffsetWindowFunction, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

/** Scale-safe planning for naive lag()/lead().
  *
  * `lag(x) OVER (ORDER BY ...)` / `lead(x) OVER (ORDER BY ...)` with no
  * PARTITION BY are frameless OFFSET window functions: like the global
  * ranking family ([[GlobalRowNumberStrategy]]) Spark's WindowExec
  * demands SinglePartition for them, funneling the whole table through
  * one task. But an offset function needs only a CONSTANT number of
  * neighbor rows, so the distributed plan is natural: range-shuffle
  * (the same fully-parallel exchange a global sort uses), then give
  * each partition the few boundary rows it's missing — the max-lag
  * tail of its predecessors and the max-lead head of its successors,
  * collected in one tiny job and shipped driver-side (bounded by
  * offset × partitions rows, independent of data size).
  *
  * PARTITIONED lag/lead — `lag(x) OVER (PARTITION BY user ORDER BY
  * ts)`, sessionization's workhorse — ride the SAME machinery over a
  * range exchange on (partition keys ⧺ order key): a key's rows are
  * contiguous under that sort, so the per-key n-th neighbor IS the
  * global n-th neighbor exactly when its key matches, and a null-safe
  * byte-equality key guard (partition keys are float-normalized
  * upstream) turns a cross-key neighbor into the default — the
  * SkewWindow.offset composition promoted into the planner, so plain
  * SQL gets it. Stock Spark's hash exchange puts every row of a hot
  * key in ONE task; here the key spans tasks, and a chain of windows
  * over the same (key, order) — lag for the session break, a running
  * sum for the session id — reuses ONE range exchange end to end.
  *
  * Matches a Window node whose expressions are ALL
  * [[FrameLessOffsetWindowFunction]]s (lag/lead, mixed offsets fine)
  * with foldable offsets and ignoreNulls = false. Defaults are
  * evaluated against the CURRENT row, exactly as WindowExec's offset
  * frame does. Values match WindowExec on any tie-free total order
  * (with ties, neighbor identity is arbitrary in either plan —
  * distributed sorts never promise tie order).
  *
  * Opt-out: shares `spark.graft.globalRowNumber.enabled` with the
  * ranking rescue — one switch restores every built-in global window.
  */
object GlobalOffsetWindowStrategy extends SparkStrategy {

  private def funcOf(e: NamedExpression): Option[(Expression, Int, Expression)] =
    e match {
      case Alias(WindowExpression(f: FrameLessOffsetWindowFunction, _), _)
          if !f.ignoreNulls && f.offset.foldable =>
        f.offset.eval() match {
          case o: Integer => Some((f.input, o.intValue(), f.default))
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
      val funcs = w.windowExpressions.map { e =>
        val (input, off, dflt) = funcOf(e).get
        GlobalOffsetWindowExec.OffsetFunc(input, off, dflt, e.toAttribute)
      }
      GlobalOffsetWindowExec(w.partitionSpec, w.orderSpec, funcs,
        planLater(w.child)) :: Nil
    case _ => Nil
  }
}

object GlobalOffsetWindowExec {
  /** One lag/lead column: evaluate `input` on the row `offset` positions
    * away (negative = earlier), `default` on the current row when the
    * target falls outside the table (or outside the current partition
    * key's run, in partitioned mode). */
  case class OffsetFunc(input: Expression, offset: Int, default: Expression,
                        attr: Attribute)
}

/** Physical distributed lag/lead: range-shuffled sorted input + one
  * boundary job. The boundary job collects, per partition, its first
  * maxLead and last maxLag rows (copies of full child rows — offset
  * functions may reference any column); the driver stitches each
  * partition's missing neighbors from them. The main pass then runs a
  * sliding window entirely partition-locally: a ring of the trailing
  * maxLag rows (seeded with the stitched predecessor tail) and a
  * lookahead queue of the next maxLead rows (extended with the stitched
  * successor head). Per-partition memory is (maxLag + maxLead + 1)
  * rows — constant, never data-sized. In partitioned mode the neighbor
  * additionally must carry the current row's partition key (the sort
  * makes a key's rows contiguous, so the check is one byte-equality);
  * otherwise the function's default applies — WindowExec's
  * out-of-partition semantics. */
case class GlobalOffsetWindowExec(partition: Seq[Expression],
                                  order: Seq[SortOrder],
                                  funcs: Seq[GlobalOffsetWindowExec.OffsetFunc],
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
    val funcsLocal = funcs.toArray
    val partExprs = partition
    val keyGuard = partExprs.nonEmpty
    val maxLag = math.max(0, -funcsLocal.map(_.offset).min)
    val maxLead = math.max(0, funcsLocal.map(_.offset).max)
    val rdd = child.execute()

    // pass 1: per-partition (count, first maxLead rows, last maxLag
    // rows) — copied UnsafeRows, a few per partition. Reads the
    // materialized shuffle, not upstream lineage.
    val stats: Array[(Long, Array[UnsafeRow], Array[UnsafeRow])] =
      rdd.sparkContext.runJob(rdd, (iter: Iterator[InternalRow]) => {
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        var cnt = 0L
        val head = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
        // ring of the last maxLag rows
        val tail = new Array[UnsafeRow](math.max(maxLag, 1))
        while (iter.hasNext) {
          val u = toUnsafe(iter.next())
          if (cnt < maxLead) head += u.copy()
          if (maxLag > 0) tail((cnt % maxLag).toInt) = u.copy()
          cnt += 1
        }
        val tailSeq =
          if (maxLag == 0 || cnt == 0) Array.empty[UnsafeRow]
          else {
            val n = math.min(cnt, maxLag).toInt
            // oldest-to-newest of the last n rows
            Array.tabulate(n)(i => tail(((cnt - n + i) % maxLag).toInt))
          }
        (cnt, head.toArray, tailSeq)
      })
    val counts = stats.map(_._1)
    val rowOffsets = counts.scanLeft(0L)(_ + _)
    val totalRows = rowOffsets.last
    val nParts = stats.length

    // stitch each partition's missing neighbors. A partition with fewer
    // rows than the offset is walked through — but no partition ever
    // contributes more than its first maxLead / last maxLag rows, which
    // is exactly what was collected. Stitched rows may carry a FOREIGN
    // partition key — the key guard in pass 2 turns those into defaults.
    def predecessorTail(p: Int): Array[UnsafeRow] = {
      val out = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
      var i = p - 1
      while (i >= 0 && out.length < maxLag) {
        val t = stats(i)._3
        // prepend newest-missing-first from the end of partition i's tail
        var j = t.length - 1
        while (j >= 0 && out.length < maxLag) { out += t(j); j -= 1 }
        i -= 1
      }
      out.reverse.toArray // oldest-to-newest
    }
    def successorHead(p: Int): Array[UnsafeRow] = {
      val out = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
      var i = p + 1
      while (i < nParts && out.length < maxLead) {
        val h = stats(i)._2
        var j = 0
        while (j < h.length && out.length < maxLead) { out += h(j); j += 1 }
        i += 1
      }
      out.toArray
    }
    val preTails = Array.tabulate(nParts)(predecessorTail)
    val sucHeads = Array.tabulate(nParts)(successorHead)

    // pass 2: sliding window per partition; each task ships only its
    // own offsets and edge rows ([[PerPartition.stitch]])
    PerPartition.stitch(rdd, (0 until nParts).map(p =>
      (rowOffsets(p), counts(p), preTails(p), sucHeads(p)))) { (slice, iter) =>
      val (rowOffset, partCount, preTail, sucHead) = slice
      val joined = new JoinedRow
      val valueRow = new GenericInternalRow(funcsLocal.length)
      val proj = UnsafeProjection.create(resultAttrs, resultAttrs)
      // one projection per func: input on the target row, default on the
      // current row (each instance's buffer survives until ITS next call,
      // so all values stay valid through the final projection)
      val inputProjs = funcsLocal.map(f =>
        UnsafeProjection.create(Seq(f.input), childOutput))
      val defaultProjs = funcsLocal.map(f =>
        UnsafeProjection.create(Seq(f.default), childOutput))
      val dtypes = funcsLocal.map(_.attr.dataType)
      // TWO projection instances (separate buffers) so the current row's
      // key and a neighbor's key can be compared without copying
      val rowKeyProj = UnsafeProjection.create(partExprs, childOutput)
      val neighKeyProj = UnsafeProjection.create(partExprs, childOutput)

      // trailing ring seeded with the stitched predecessor rows
      val lagBuf = new scala.collection.mutable.ArrayDeque[InternalRow]
      preTail.foreach(lagBuf += _)
      // lookahead: partition rows then stitched successor rows
      val source: Iterator[InternalRow] =
        iter.map(_.copy()) ++ sucHead.iterator
      val leadBuf = new scala.collection.mutable.ArrayDeque[InternalRow]

      new Iterator[InternalRow] {
        private var emitted = 0L
        override def hasNext: Boolean = emitted < partCount
        override def next(): InternalRow = {
          while (leadBuf.length < maxLead + 1 && source.hasNext)
            leadBuf += source.next()
          val row = leadBuf.head
          val rowKey = if (keyGuard) rowKeyProj(row) else null
          val globalIdx = rowOffset + emitted
          var i = 0
          while (i < funcsLocal.length) {
            val off = funcsLocal(i).offset
            val target = globalIdx + off
            val neighbor: InternalRow =
              if (target < 0 || target >= totalRows) null
              else if (off < 0) {
                // lagBuf holds the last maxLag rows before `row`,
                // oldest first; wanted is |off| back from the end
                lagBuf(lagBuf.length + off)
              } else if (off > 0) leadBuf(off)
              else row
            // per-key window: a neighbor of a DIFFERENT key is outside
            // the frame — default, exactly as WindowExec at a partition
            // edge (byte equality is exact: window partition keys are
            // float-normalized by the optimizer)
            val inFrame = neighbor != null &&
              (!keyGuard || neighKeyProj(neighbor).equals(rowKey))
            val value: Any =
              if (inFrame) inputProjs(i)(neighbor).get(0, dtypes(i))
              else defaultProjs(i)(row).get(0, dtypes(i))
            valueRow.update(i, value)
            i += 1
          }
          val out = proj(joined(row, valueRow))
          // slide: current row becomes lag history
          if (maxLag > 0) {
            lagBuf += row
            if (lagBuf.length > maxLag) lagBuf.removeHead()
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
