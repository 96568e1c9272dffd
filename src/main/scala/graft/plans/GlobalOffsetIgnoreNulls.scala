package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, FrameLessOffsetWindowFunction, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

/** Scale-safe planning for naive global lag()/lead() with IGNORE NULLS.
  *
  * `lag(x, n) IGNORE NULLS OVER (ORDER BY ...)` is the gap-filling
  * query of sparse time series ("previous non-null reading") — and like
  * its respect-nulls sibling ([[GlobalOffsetWindowStrategy]]) it plans
  * as a SinglePartition WindowExec in stock Spark. The distributed
  * shape differs in one way: the lookbehind is VARIABLE — the n-th
  * non-null value may be arbitrarily far back — so fixed-size row
  * stitching doesn't work. But the function only ever needs n non-null
  * VALUES per direction, so the boundary job collects, per partition
  * and per function, the first/last n non-null input values; the
  * driver stitches each partition's missing neighbor values (bounded by
  * Σ offsets × partitions single-column values, independent of data
  * size and of null-run lengths).
  *
  * Locally, lag is a streaming ring of the last n non-null values. Lead
  * needs lookahead: rows park in a pending FIFO and each arriving
  * non-null value resolves exactly the row whose n-th successor it is
  * (arrival-counter matching — O(1) per value); rows left unresolved
  * when the stitched successor values run out take their default. The
  * pending buffer spans only the distance from a row to its n-th
  * non-null successor — the data-inherent minimum (the built-in buffers
  * the whole partition).
  *
  * Matches Window nodes whose expressions are ALL frameless offset
  * functions with ignoreNulls = true and foldable non-zero offsets,
  * over an empty partition spec (mixed IGNORE/RESPECT nodes fall back
  * to the built-in). Defaults are evaluated against the current row,
  * exactly as WindowExec's offset frame does.
  *
  * Opt-out: shares `spark.graft.globalRowNumber.enabled`.
  */
object GlobalOffsetIgnoreNullsStrategy extends SparkStrategy {

  private def funcOf(e: NamedExpression): Option[(Expression, Int, Expression)] =
    e match {
      case Alias(WindowExpression(f: FrameLessOffsetWindowFunction, _), _)
          if f.ignoreNulls && f.offset.foldable =>
        f.offset.eval() match {
          case o: Integer if o.intValue() != 0 =>
            Some((f.input, o.intValue(), f.default))
          case _ => None
        }
      case _ => None
    }

  /** Per-expression categorizer for [[GlobalWindowSplit]]. */
  private[plans] def rescuable(e: NamedExpression): Boolean = funcOf(e).isDefined

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: logical.Window
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          SQLConf.get.getConfString(GlobalRowNumberStrategy.ConfKey, "true").toBoolean =>
      val funcs = w.windowExpressions.map { e =>
        val (input, off, dflt) = funcOf(e).get
        GlobalOffsetIgnoreNullsExec.NnOffsetFunc(input, off, dflt, e.toAttribute)
      }
      GlobalOffsetIgnoreNullsExec(w.orderSpec, funcs, planLater(w.child)) :: Nil
    case _ => Nil
  }
}

object GlobalOffsetIgnoreNullsExec {
  /** One IGNORE NULLS lag/lead column: the |offset|-th NON-NULL `input`
    * value before (offset < 0) / after (offset > 0) the current row;
    * `default` on the current row when fewer exist. */
  case class NnOffsetFunc(input: Expression, offset: Int, default: Expression,
                          attr: Attribute)
}

/** Physical distributed IGNORE NULLS lag/lead: range-shuffled sorted
  * input + one boundary job collecting per-partition per-function
  * first/last n non-null input VALUES (1-column UnsafeRows); locally a
  * value ring per lag function and a pending-FIFO resolution per lead
  * function. */
case class GlobalOffsetIgnoreNullsExec(
    order: Seq[SortOrder],
    funcs: Seq[GlobalOffsetIgnoreNullsExec.NnOffsetFunc],
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
    val nFuncs = funcsLocal.length
    val needs = funcsLocal.map(f => math.abs(f.offset)) // values per direction
    val isLead = funcsLocal.map(_.offset > 0)
    val rdd = child.execute()

    // boundary job: per partition and per function, the first and last
    // n_f non-null input values (single-column UnsafeRow copies)
    val stats: Array[(Array[Array[UnsafeRow]], Array[Array[UnsafeRow]])] =
      rdd.sparkContext.runJob(rdd, (iter: Iterator[InternalRow]) => {
        val inputProjs = funcsLocal.map(f =>
          UnsafeProjection.create(Seq(f.input), childOutput))
        val heads = Array.fill(nFuncs)(
          new scala.collection.mutable.ArrayBuffer[UnsafeRow])
        val tails = Array.fill(nFuncs)(
          new scala.collection.mutable.ArrayDeque[UnsafeRow])
        while (iter.hasNext) {
          val row = iter.next()
          var i = 0
          while (i < nFuncs) {
            val v = inputProjs(i)(row)
            if (!v.isNullAt(0)) {
              val c = v.copy()
              if (heads(i).length < needs(i)) heads(i) += c
              tails(i) += c
              if (tails(i).length > needs(i)) tails(i).removeHead()
            }
            i += 1
          }
        }
        (heads.map(_.toArray), tails.map(_.toArray))
      })
    val nParts = stats.length

    // stitch: per partition, each lag function's missing predecessor
    // values (newest-first walk over earlier tails) and each lead
    // function's successor values (oldest-first walk over later heads)
    def predecessorVals(p: Int, f: Int): Array[UnsafeRow] = {
      val out = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
      var i = p - 1
      while (i >= 0 && out.length < needs(f)) {
        val t = stats(i)._2(f)
        var j = t.length - 1
        while (j >= 0 && out.length < needs(f)) { out += t(j); j -= 1 }
        i -= 1
      }
      out.reverse.toArray // oldest-to-newest
    }
    def successorVals(p: Int, f: Int): Array[UnsafeRow] = {
      val out = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
      var i = p + 1
      while (i < nParts && out.length < needs(f)) {
        val h = stats(i)._1(f)
        var j = 0
        while (j < h.length && out.length < needs(f)) { out += h(j); j += 1 }
        i += 1
      }
      out.toArray
    }
    val preVals = Array.tabulate(nParts, nFuncs)(predecessorVals)
    val sucVals = Array.tabulate(nParts, nFuncs)(successorVals)

    rdd.mapPartitionsWithIndex { (pid, iter) =>
      val inputProjs = funcsLocal.map(f =>
        UnsafeProjection.create(Seq(f.input), childOutput))
      val defaultProjs = funcsLocal.map(f =>
        UnsafeProjection.create(Seq(f.default), childOutput))
      val dtypes = funcsLocal.map(_.attr.dataType)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(resultAttrs, resultAttrs)

      // one pending entry per not-yet-emittable row
      final class Entry(val row: InternalRow) {
        val vals = new Array[Any](nFuncs)
        var remaining = 0 // unresolved lead slots
      }
      val pending = new scala.collection.mutable.ArrayDeque[Entry]
      // per lead function: arrival counter + FIFO of (entry, seq-at-park)
      val arrivals = new Array[Long](nFuncs)
      val waiting = Array.fill(nFuncs)(
        new scala.collection.mutable.ArrayDeque[(Entry, Long)])
      // per lag function: ring of the last n_f non-null values, seeded
      // with the stitched predecessor values
      val rings = Array.tabulate(nFuncs) { i =>
        val d = new scala.collection.mutable.ArrayDeque[UnsafeRow]
        if (!isLead(i)) preVals(pid)(i).foreach(d += _)
        d
      }

      def arrive(f: Int, v: UnsafeRow): Unit = {
        arrivals(f) += 1
        val w = waiting(f)
        // rows separated only by nulls park with the SAME counter value
        // and share their n-th non-null successor: resolve the whole
        // matching prefix, not just one entry
        while (w.nonEmpty && w.head._2 + needs(f) == arrivals(f)) {
          val (e, _) = w.removeHead()
          e.vals(f) = v.get(0, dtypes(f))
          e.remaining -= 1
        }
      }

      val emitQueue = new scala.collection.mutable.ArrayDeque[InternalRow]
      def drainReady(): Unit =
        while (pending.nonEmpty && pending.head.remaining == 0) {
          val e = pending.removeHead()
          val vr = new GenericInternalRow(e.vals)
          emitQueue += outProj(joined(e.row, vr)).copy()
        }

      def processRow(raw: InternalRow): Unit = {
        val row = raw.copy()
        val e = new Entry(row)
        // lag slots resolve from the rings BEFORE this row's own value
        // enters them (lag excludes the current row)
        var i = 0
        while (i < nFuncs) {
          if (!isLead(i)) {
            val ring = rings(i)
            e.vals(i) =
              if (ring.length >= needs(i))
                ring(ring.length - needs(i)).get(0, dtypes(i))
              else defaultProjs(i)(row).copy().get(0, dtypes(i))
          }
          i += 1
        }
        // this row's input values resolve EARLIER parked rows and join
        // the lag history
        i = 0
        while (i < nFuncs) {
          val v = inputProjs(i)(row)
          if (!v.isNullAt(0)) {
            val c = v.copy()
            if (isLead(i)) arrive(i, c)
            else {
              rings(i) += c
              if (rings(i).length > needs(i)) rings(i).removeHead()
            }
          }
          i += 1
        }
        // lead slots park AFTER the own-value arrival (lead excludes the
        // current row): the entry needs n_f FURTHER non-null arrivals
        i = 0
        while (i < nFuncs) {
          if (isLead(i)) {
            e.remaining += 1
            waiting(i) += ((e, arrivals(i)))
          }
          i += 1
        }
        pending += e
        drainReady()
      }

      def finish(): Unit = {
        // feed the stitched successor values, then default what's left
        var f = 0
        while (f < nFuncs) {
          if (isLead(f)) {
            sucVals(pid)(f).foreach(arrive(f, _))
            // entries still parked have no n_f-th non-null successor
            // anywhere in the table: default on their own row
            waiting(f).foreach { case (e, _) =>
              e.vals(f) = defaultProjs(f)(e.row).copy().get(0, dtypes(f))
              e.remaining -= 1
            }
            waiting(f).clear()
          }
          f += 1
        }
        drainReady()
      }

      new Iterator[InternalRow] {
        private var finished = false
        override def hasNext: Boolean = {
          while (emitQueue.isEmpty && (iter.hasNext || !finished)) {
            if (iter.hasNext) processRow(iter.next())
            else { finish(); finished = true }
          }
          emitQueue.nonEmpty
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          emitQueue.removeHead()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
