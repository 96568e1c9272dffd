package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, MutableProjection, NamedExpression, SortOrder, SpecifiedWindowFrame, SpecificInternalRow, UnboundedFollowing, UnboundedPreceding, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Complete, CountMinSketchAgg, DeclarativeAggregate, HyperLogLogPlusPlus, ImperativeAggregate, TypedImperativeAggregate}
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

  /** Imperative SKETCH aggregates safe under partial-then-merge.
    *
    * HLL++ (register-wise max) and count-min (counter addition) merge
    * to the IDENTICAL sketch the built-in's sequential scan builds.
    * approx_percentile merges to a DIFFERENT but equally valid sketch:
    * `QuantileSummaries`' merge is the Greenwald-Khanna merge, whose
    * result is a guaranteed ε-summary of the union — the same
    * guarantee the sequential build carries, and the same operation
    * stock Spark's own partial+final GROUP BY plan performs. Windowed
    * approx_percentile was never bit-stable across plans (a groupBy
    * twin of the same data already disagrees with the single-task
    * window in compress details), so the rescue holds the sketch's
    * documented contract — any returned value sits within ε of the
    * requested rank — not bit-parity with one arbitrary build order.
    * Order-SENSITIVE collect_list is rescued ONLY with an explicit
    * ORDER BY (see [[sortedCollect]]); a bare unordered collect stays
    * declined — its value IS the enumeration order, which no
    * distributed plan (or the built-in, across reruns) pins. */
  private def sketchLike(f: AggregateFunction): Boolean = f match {
    case _: HyperLogLogPlusPlus => true
    case _: CountMinSketchAgg => true
    case _: org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile => true
    case _ => false
  }

  /** ORDER-SENSITIVE collectors rescuable only under an explicit ORDER
    * BY: the exec's range exchange delivers task slices in key order,
    * rows sort within tasks, and `Collect.merge` APPENDS — so the
    * left-to-right edge merge reproduces exactly the sorted sequential
    * build. collect_set stays out (its output order is insertion order
    * of first occurrence — an enumeration artifact in any plan). */
  private[plans] def sortedCollect(f: AggregateFunction): Boolean =
    f.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.CollectList]

  private def funcOf(e: NamedExpression): Option[ConstAgg] = e match {
    case Alias(WindowExpression(
          AggregateExpression(f, Complete, false, None, _),
          WindowSpecDefinition(_, orderSpec,
            SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing))), _)
        if (f match {
          case d: DeclarativeAggregate =>
            d.deterministic &&
              !d.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.First] &&
              !d.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.Last]
          case other => sketchLike(other) ||
            (sortedCollect(other) && orderSpec.nonEmpty &&
              orderSpec.forall(_.deterministic))
        }) =>
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
          SQLConf.get.getConfString(GlobalRowNumberStrategy.ConfKey, "true").toBoolean => {
      val funcs = w.windowExpressions.map(funcOf(_).get)
      // an order-sensitive collector forces the ordered (range-exchange)
      // path even with no partition keys; order-insensitive constants
      // keep the zero-exchange two-pass
      val spread = if (funcs.exists(c => sortedCollect(c.agg))) w.orderSpec else Nil
      GlobalConstantAggExec(Nil, spread, funcs, planLater(w.child)) :: Nil
    }
    case w: logical.Window
        if w.partitionSpec.nonEmpty && w.partitionSpec.forall(_.deterministic) &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          GlobalWindowGate.perKeyWorthwhile(w) &&
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
  /** One whole-table aggregate column (value constant across all rows);
    * `agg` is a deterministic [[DeclarativeAggregate]] or a whitelisted
    * order-independent imperative sketch. */
  case class ConstAgg(agg: AggregateFunction, attr: Attribute)

  /** Per-task edge-group partials for the partitioned path: first/last
    * key groups, their declarative slice buffers, and their serialized
    * imperative sketch buffers. Top-level so the serialized task result
    * carries no $outer. */
  private[plans] case class AggEdge(firstG: UnsafeRow, lastG: UnsafeRow,
                                    bufFirst: UnsafeRow, bufLast: UnsafeRow,
                                    impFirst: Array[Array[Byte]],
                                    impLast: Array[Array[Byte]])

  /** Uniform driver/executor operations over one imperative sketch
    * aggregate: an opaque buffer with update / serialize / merge /
    * eval. Two shapes exist — typed (object buffer, own codec) and raw
    * (row buffer at offset 0, UnsafeRow bytes as the codec). */
  private[plans] sealed trait ImpOps extends Serializable {
    def newBuf(): AnyRef
    def update(buf: AnyRef, row: InternalRow): AnyRef
    def serialize(buf: AnyRef): Array[Byte]
    def mergeBytes(buf: AnyRef, bytes: Array[Byte]): AnyRef
    def eval(buf: AnyRef): Any
  }

  private[plans] final class TypedOps(f: TypedImperativeAggregate[Any])
      extends ImpOps {
    override def newBuf(): AnyRef = f.createAggregationBuffer().asInstanceOf[AnyRef]
    override def update(buf: AnyRef, row: InternalRow): AnyRef =
      f.update(buf.asInstanceOf[Any], row).asInstanceOf[AnyRef]
    override def serialize(buf: AnyRef): Array[Byte] =
      f.serialize(buf.asInstanceOf[Any])
    override def mergeBytes(buf: AnyRef, bytes: Array[Byte]): AnyRef =
      f.merge(buf.asInstanceOf[Any], f.deserialize(bytes)).asInstanceOf[AnyRef]
    override def eval(buf: AnyRef): Any = f.eval(buf.asInstanceOf[Any])
  }

  private[plans] final class RawOps(f0: ImperativeAggregate) extends ImpOps {
    private val f = f0.withNewMutableAggBufferOffset(0)
      .withNewInputAggBufferOffset(0).asInstanceOf[ImperativeAggregate]
    private val types = f.aggBufferAttributes.map(_.dataType)
    @transient private lazy val toBytes =
      UnsafeProjection.create(f.aggBufferAttributes, f.aggBufferAttributes)
    override def newBuf(): AnyRef = {
      val b = new SpecificInternalRow(types)
      f.initialize(b); b
    }
    override def update(buf: AnyRef, row: InternalRow): AnyRef = {
      f.update(buf.asInstanceOf[InternalRow], row); buf
    }
    override def serialize(buf: AnyRef): Array[Byte] =
      toBytes(buf.asInstanceOf[InternalRow]).copy().getBytes
    override def mergeBytes(buf: AnyRef, bytes: Array[Byte]): AnyRef = {
      val r = new UnsafeRow(types.length)
      r.pointTo(bytes, bytes.length)
      f.merge(buf.asInstanceOf[InternalRow], r); buf
    }
    override def eval(buf: AnyRef): Any = f.eval(buf.asInstanceOf[InternalRow])
  }

  private[plans] def opsFor(f: AggregateFunction,
                            childOutput: Seq[Attribute]): ImpOps = {
    val bound = BindReferences.bindReference[Expression](
      f, org.apache.spark.sql.catalyst.expressions.AttributeSeq(childOutput))
    bound match {
      case t: TypedImperativeAggregate[_] =>
        new TypedOps(t.asInstanceOf[TypedImperativeAggregate[Any]])
      case i: ImperativeAggregate => new RawOps(i)
      case other => throw new IllegalStateException(
        s"not an imperative aggregate: $other")
    }
  }
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

  import GlobalConstantAggExec.{ImpOps, opsFor}

  override def output: Seq[Attribute] = child.output ++ funcs.map(_.attr)

  private def partOrders: Seq[SortOrder] =
    partition.map(e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending))

  /** Ordered path — per-key constants OR an order-sensitive global
    * collector (partition empty, spread = the node's ORDER BY). */
  private def ordered: Boolean = partition.nonEmpty || spread.nonEmpty

  override def requiredChildDistribution: Seq[Distribution] =
    if (!ordered) UnspecifiedDistribution :: Nil
    else OrderedDistribution(partOrders ++ spread) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (!ordered) Seq(Nil) else Seq(partOrders ++ spread)
  override def outputOrdering =
    if (!ordered) child.outputOrdering else partOrders ++ spread
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
    val nF = funcs.length
    val dIdx = declIdx
    val iIdx = impIdx
    val declAggs = dIdx.map(i =>
      funcs(i).agg.asInstanceOf[DeclarativeAggregate]).toSeq
    val bufAttrs = declAggs.flatMap(_.aggBufferAttributes)
    val bufTypes = bufAttrs.map(_.dataType)
    val inputBufAttrs = declAggs.flatMap(_.inputAggBufferAttributes)
    val initExprs = declAggs.flatMap(_.initialValues)
    val updateExprs = declAggs.flatMap(_.updateExpressions)
    val mergeExprs = declAggs.flatMap(_.mergeExpressions)
    val evalExprs = declAggs.map(_.evaluateExpression)
    val impOps: Array[ImpOps] = iIdx.map(i => opsFor(funcs(i).agg, childOutput))
    val attrTypes = funcs.map(_.attr.dataType).toArray
    val rdd = child.execute()

    // pass 1: per task, the first and last key group's partials (decl
    // buffer + serialized sketches)
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
        var impBufs = impOps.map(_.newBuf())
        var firstG: UnsafeRow = null
        var curG: UnsafeRow = null
        var bufFirst: UnsafeRow = null
        var impFirst: Array[Array[Byte]] = null
        while (iter.hasNext) {
          val row = iter.next()
          val g = groupProj(row)
          if (curG == null) { curG = g.copy(); firstG = curG }
          else if (!g.equals(curG)) {
            if (bufFirst == null) {
              bufFirst = bufProj(buf).copy()
              impFirst = impOps.indices.map(j =>
                impOps(j).serialize(impBufs(j))).toArray
            }
            curG = g.copy()
            buf = newBuffer(); update.target(buf)
            impBufs = impOps.map(_.newBuf())
          }
          update(joinBI(buf, row))
          var j = 0
          while (j < impOps.length) {
            impBufs(j) = impOps(j).update(impBufs(j), row); j += 1
          }
        }
        val bufLast = bufProj(buf).copy()
        val impLast = impOps.indices.map(j =>
          impOps(j).serialize(impBufs(j))).toArray
        if (bufFirst == null) { bufFirst = bufLast; impFirst = impLast }
        AggEdge(firstG, curG, bufFirst, bufLast, impFirst, impLast)
      })
    val nParts = stats.length

    // driver segment merge: adjacent edge slices with equal group keys
    // belong to one group (contiguity under the sort); merge their
    // partials left-to-right and evaluate once per group. Driver work
    // is bounded by two partials per task.
    val firstConst = new Array[Array[Any]](nParts)
    val lastConst = new Array[Array[Any]](nParts)
    locally {
      case class Seg(p: Int, isFirst: Boolean, isLast: Boolean,
                     g: UnsafeRow, buf: UnsafeRow, imp: Array[Array[Byte]])
      val segs = new scala.collection.mutable.ArrayBuffer[Seg]
      var p = 0
      while (p < nParts) {
        val e = stats(p)
        if (e.firstG != null) {
          if (e.lastG.equals(e.firstG))
            segs += Seg(p, isFirst = true, isLast = true,
              e.firstG, e.bufLast, e.impLast)
          else {
            segs += Seg(p, isFirst = true, isLast = false,
              e.firstG, e.bufFirst, e.impFirst)
            segs += Seg(p, isFirst = false, isLast = true,
              e.lastG, e.bufLast, e.impLast)
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
        val impBufs = impOps.map(_.newBuf())
        var k = i
        while (k < j) {
          merge(joinBB(running, segs(k).buf))
          var m = 0
          while (m < impOps.length) {
            impBufs(m) = impOps(m).mergeBytes(impBufs(m), segs(k).imp(m)); m += 1
          }
          k += 1
        }
        val vals = new Array[Any](nF)
        val evalRow = evalProj(running)
        dIdx.zipWithIndex.foreach { case (slot, m) =>
          vals(slot) = InternalRow.copyValue(evalRow.get(m, attrTypes(slot)))
        }
        iIdx.zipWithIndex.foreach { case (slot, m) =>
          vals(slot) = InternalRow.copyValue(impOps(m).eval(impBufs(m)))
        }
        k = i
        while (k < j) {
          if (segs(k).isFirst) firstConst(segs(k).p) = vals
          if (segs(k).isLast) lastConst(segs(k).p) = vals
          k += 1
        }
        i = j
      }
    }

    // pass 2: buffer one group at a time; edge groups take the driver's
    // constants, interior groups evaluate their own local partials.
    // Each task receives ONLY its own pair of edge constants
    // ([[PerPartition.stitch]] — closure capture of the full
    // firstConst/lastConst arrays would ship O(#partitions) per task).
    PerPartition.stitch(rdd,
      (0 until nParts).map(p => (firstConst(p), lastConst(p)))) { (slice, iter) =>
      val (firstConstP, lastConstP) = slice
      val groupProj = UnsafeProjection.create(partExprs, childOutput)
      val outProj = UnsafeProjection.create(resultAttrs, resultAttrs)
      val join = new JoinedRow
      val update = MutableProjection.create(updateExprs, bufAttrs ++ childOutput)
      val evalProj = UnsafeProjection.create(evalExprs, bufAttrs)
      val joinBI = new JoinedRow

      new Iterator[InternalRow] {
        private val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
        private var bufPos = 0
        private var constRow: InternalRow = _
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
          val impBufs = impOps.map(_.newBuf())
          def consume(r: InternalRow): Unit = {
            update(joinBI(agg, r))
            var m = 0
            while (m < impOps.length) {
              impBufs(m) = impOps(m).update(impBufs(m), r); m += 1
            }
          }
          consume(buf.head)
          var done = false
          while (!done && iter.hasNext) {
            val r = iter.next().copy()
            if (groupProj(r).equals(g)) { buf += r; consume(r) }
            else { pendingNext = r; done = true }
          }
          val isFirst = firstGroupOfTask
          firstGroupOfTask = false
          val isLast = pendingNext == null && !iter.hasNext
          val vals: Array[Any] =
            if (isFirst) firstConstP
            else if (isLast) lastConstP
            else {
              val v = new Array[Any](nF)
              val evalRow = evalProj(agg)
              dIdx.zipWithIndex.foreach { case (slot, m) =>
                v(slot) = InternalRow.copyValue(evalRow.get(m, attrTypes(slot)))
              }
              iIdx.zipWithIndex.foreach { case (slot, m) =>
                v(slot) = InternalRow.copyValue(impOps(m).eval(impBufs(m)))
              }
              v
            }
          constRow = new GenericInternalRow(vals)
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

  import GlobalConstantAggExec.{ImpOps, opsFor}

  /** Declarative / imperative split: declaratives ride the projection
    * machinery, imperatives the [[ImpOps]] object buffers; slot indexes
    * map each back to its output column. */
  private def declIdx: Array[Int] = funcs.zipWithIndex.collect {
    case (c, i) if c.agg.isInstanceOf[DeclarativeAggregate] => i
  }.toArray
  private def impIdx: Array[Int] = funcs.zipWithIndex.collect {
    case (c, i) if !c.agg.isInstanceOf[DeclarativeAggregate] => i
  }.toArray

  override protected def doExecute(): RDD[InternalRow] = {
    if (ordered) return doExecutePartitioned()
    val childOutput = child.output
    val resultAttrs = output
    val nF = funcs.length
    val dIdx = declIdx
    val iIdx = impIdx
    val declAggs = dIdx.map(i =>
      funcs(i).agg.asInstanceOf[DeclarativeAggregate]).toSeq
    val bufAttrs = declAggs.flatMap(_.aggBufferAttributes)
    val bufTypes = bufAttrs.map(_.dataType)
    val inputBufAttrs = declAggs.flatMap(_.inputAggBufferAttributes)
    val initExprs = declAggs.flatMap(_.initialValues)
    val updateExprs = declAggs.flatMap(_.updateExpressions)
    val mergeExprs = declAggs.flatMap(_.mergeExpressions)
    val evalExprs = declAggs.map(_.evaluateExpression)
    val impOps: Array[ImpOps] = iIdx.map(i => opsFor(funcs(i).agg, childOutput))
    val attrTypes = funcs.map(_.attr.dataType).toArray
    val rdd = child.execute()

    def newBuffer(): SpecificInternalRow = {
      val buf = new SpecificInternalRow(bufTypes)
      val p = MutableProjection.create(initExprs, Nil)
      p.target(buf)(InternalRow.empty)
      buf
    }

    // pass 1: one partial (decl buffer + serialized sketches) per
    // partition — the map-side partial aggregation a groupBy would run,
    // without the final exchange
    val partials: Array[(UnsafeRow, Array[Array[Byte]])] =
      rdd.sparkContext.runJob(rdd, (iter: Iterator[InternalRow]) => {
        val buf = newBuffer()
        val update = MutableProjection.create(updateExprs, bufAttrs ++ childOutput)
        update.target(buf)
        val joinBI = new JoinedRow
        val impBufs = impOps.map(_.newBuf())
        while (iter.hasNext) {
          val row = iter.next()
          update(joinBI(buf, row))
          var j = 0
          while (j < impOps.length) {
            impBufs(j) = impOps(j).update(impBufs(j), row); j += 1
          }
        }
        (UnsafeProjection.create(bufAttrs, bufAttrs)(buf).copy(),
          impOps.indices.map(j => impOps(j).serialize(impBufs(j))).toArray)
      })

    // driver merge + one evaluation per function: #partitions
    // buffer-sized rows of work, independent of data size
    val constVals: Array[Any] = {
      val running = newBuffer()
      val merge = MutableProjection.create(mergeExprs, bufAttrs ++ inputBufAttrs)
      merge.target(running)
      val joinBB = new JoinedRow
      val impBufs = impOps.map(_.newBuf())
      partials.foreach { case (p, ib) =>
        merge(joinBB(running, p))
        var j = 0
        while (j < impOps.length) {
          impBufs(j) = impOps(j).mergeBytes(impBufs(j), ib(j)); j += 1
        }
      }
      val vals = new Array[Any](nF)
      val evalRow = UnsafeProjection.create(evalExprs, bufAttrs)(running)
      dIdx.zipWithIndex.foreach { case (slot, j) =>
        vals(slot) = InternalRow.copyValue(evalRow.get(j, attrTypes(slot)))
      }
      iIdx.zipWithIndex.foreach { case (slot, j) =>
        vals(slot) = InternalRow.copyValue(impOps(j).eval(impBufs(j)))
      }
      vals
    }

    // pass 2: narrow attach of the constants — full parallelism, no state
    rdd.mapPartitions { iter =>
      val outProj = UnsafeProjection.create(resultAttrs, resultAttrs)
      val join = new JoinedRow
      val constRow = new GenericInternalRow(constVals)
      iter.map(row => outProj(join(row, constRow)))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
