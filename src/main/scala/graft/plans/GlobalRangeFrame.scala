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
import org.apache.spark.sql.types.{ByteType, CalendarIntervalType, DataType, DateType, DayTimeIntervalType, IntegerType, LongType, ShortType, TimestampType, YearMonthIntervalType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Scale-safe planning for RANGE-interval frames — the time-series
  * value windows: the trailing `SUM(x) OVER (ORDER BY ts RANGE BETWEEN
  * INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)`, the CENTERED smoothing
  * window `RANGE BETWEEN 30m PRECEDING AND 30m FOLLOWING`, and the pure
  * lookahead `CURRENT ROW AND 1h FOLLOWING` — plus their numeric-key
  * twins over epoch micros. Stock Spark plans the empty-partition form
  * as a SinglePartition WindowExec — the whole table through one task —
  * like every other member of the global-window family this package
  * rescues.
  *
  * The PARTITIONED form (`PARTITION BY user ORDER BY ts RANGE ...` —
  * THE per-entity time-series query) is claimed too: stock Spark hash
  * exchanges on the partition key, so every row of a key lands in ONE
  * task — a hot key (one user with a fifth of the data) resurrects the
  * reference's hot region server (README:9-27) inside the cluster, and
  * AQE re-splits skewed joins but never windows. Here the exchange is a
  * RANGE exchange over (partition keys ⧺ order key): a hot key SPANS
  * many partitions, each task's work is bounded by the range
  * partitioner's split sizes independent of key skew, and because a
  * key's rows are CONTIGUOUS under that sort, the same edge-stitching
  * that repairs partition boundaries repairs them per key — stitched
  * rows are simply dropped at key boundaries.
  *
  * A value frame `[K − x, K + y]` needs, per row, its key neighborhood.
  * After the range exchange that neighborhood is almost always
  * partition-local; the only missing rows are each partition's edges.
  * So one tiny job collects, per partition, its trailing x-window (the
  * rows with key ≥ maxKey − x — the same deque the local pass keeps),
  * its LEADING y-window (the rows with key ≤ minKey + y), and its
  * first/last non-null keys — each restricted to the partition's
  * first/last partition-key group, the only groups that can spill over
  * an edge; the driver then ships partition p every predecessor row
  * with key ≥ minKey(p) − x from predecessors ending in p's first
  * group, and every successor row with key ≤ maxKey(p) + y from
  * successors starting in p's last group. Shipped volume is bounded by
  * the frame's own row density (the rows a single frame spans), not by
  * data size — the honest cost of a value window, and exactly what the
  * frame itself reads.
  *
  * Locally, rows are processed one TIE RUN at a time (the range
  * exchange co-locates equal (part, key) tuples, so a run never spans
  * partitions): the trailing deque is pruned to `key ≥ K − x` and
  * CLEARED at each partition-key change, runs are read AHEAD until the
  * first run past `K + y` or of a different partition key (a bounded
  * lookahead FIFO — the frame's own forward span), and each aggregate
  * folds deque + run + ahead + stitched successors left-to-right in key
  * order — the same sequential fold WindowExec performs. Every row of
  * the run shares the result — RANGE bounds are peer-inclusive in both
  * engines. Rows with NULL order keys form their own peer group within
  * their partition key (frame = the null run itself) and never enter
  * any arithmetic frame, matching the built-in's null-peer semantics.
  *
  * Matched shape: any deterministic partition spec (including empty),
  * ONE order key — ascending or descending, integer / bigint /
  * timestamp / date / decimal(≤18) type — and all window expressions
  * deterministic [[DeclarativeAggregate]]s over `RANGE` frames with a
  * literal-or-CURRENT-ROW bound on each side (day-time interval
  * literals on timestamp keys; whole-day intervals or plain ints on
  * date keys; numeric bounds rescaled exactly to the key's scale on
  * DECIMAL keys, whose unscaled value IS the Long key — fixed-point).
  * MONTH-bearing offsets resolve per row in the KEY's physical space —
  * through the session-zone calendar for timestamp keys (the same
  * `DateTimeUtils` arithmetic the built-in's bound expressions use),
  * through zone-free `dateAddMonths` in DAY units for date keys — in
  * ORIGINAL key space for descending orders, negated back; the
  * shipping structures over-approximate months at 31 days (in key
  * units) + slack and the folds filter exactly. NOTE the deliberate semantic choice: month
  * subtraction is NON-MONOTONE at day-clamp boundaries (Mar 28 06:00
  * − 1mo = Feb 28 06:00, but Mar 29 05:00 − 1mo = Feb 28 05:00), and
  * stock WindowExec's two-pointer frame never moves its lower pointer
  * backward — it silently DROPS rows there. This exec computes the
  * declarative frame `key ∈ [K − interval, K + interval]` exactly,
  * per row — the SQL-standard reading, and what DuckDB produces.
  * Month offsets over DATE keys resolve in DAY space via
  * `DateTimeUtils.dateAddMonths` — pure proleptic-calendar arithmetic,
  * no time zone — with day-unit shipping slack (31 days per month).
  * DESCENDING keys are handled by negating the extracted key —
  * under `ORDER BY ts DESC`, `x PRECEDING` means keys in [K, K+x],
  * which is exactly [K'−x, K'] in negated key space, so the ascending
  * machinery applies verbatim. Mixed widths in one node are fine — each
  * function reads its own slice of the shared deque / lookahead.
  *
  * Opt-out: shares `spark.graft.globalRowNumber.enabled`.
  */
object GlobalRangeFrameStrategy extends SparkStrategy {
  import GlobalRangeFrameExec.RangeAgg

  /** Scoped parity conf (default true): set false to decline ONLY
    * month-bearing RANGE bounds, so those nodes keep stock WindowExec —
    * bit-for-bit built-in behavior (including its forward-only frame's
    * row drops at non-monotone month day-clamp boundaries) for parity
    * testing/migration, while day-time/int/decimal RANGE frames and
    * every other window family stay rescued. The blunt alternative,
    * `spark.graft.globalRowNumber.enabled=false`, opts out everything. */
  val MonthRescueKey = "spark.graft.rangeFrame.monthRescue"

  private val MicrosPerDay = 86400000000L

  /** Foldable bound → |width| as (months, key units) — key units are
    * micros for timestamp keys, days for date keys, unscaled units for
    * decimal keys — requiring the bound's sign to match `sign`
    * (PRECEDING bounds are negative, FOLLOWING positive — in BOTH sort
    * directions: Spark negates the offset arithmetic for descending
    * orders, and so does the exec, so widths are direction-free); None
    * for unsupported shapes. Bound TYPES are checked, not just values —
    * a day-time interval and a bigint both eval to a Long, but they
    * mean different units against a date key. MONTH-bearing widths are
    * produced for timestamp keys (resolved per row through the
    * session-zone calendar) and date keys (resolved in DAY space via
    * `dateAddMonths` — no zone) — in ORIGINAL key space for
    * descending orders. */
  private def widthOf(bound: Expression, sign: Int,
                      keyType: DataType): Option[(Int, Long)] = bound match {
    case CurrentRow => Some((0, 0L))
    case e if e.foldable =>
      val isDate = keyType == DateType
      // month-bearing widths: timestamp keys (zone calendar, micros
      // day-time part) and date keys (pure day arithmetic, day units).
      // The scoped parity conf declines ONLY month-bearing bounds — the
      // node then falls back to stock WindowExec, restoring bit-for-bit
      // built-in behavior at its non-monotone day-clamp boundaries (see
      // the exec doc / README semantics notes) while every other RANGE
      // shape stays rescued.
      val monthsOk = (keyType == TimestampType || isDate) &&
        SQLConf.get.getConfString(GlobalRangeFrameStrategy.MonthRescueKey,
          "true").toBoolean
      val v: Option[(Int, Long)] = keyType match {
        case kt: org.apache.spark.sql.types.DecimalType =>
          // DECIMAL keys are fixed-point: widths live in the key's
          // UNSCALED units. Any numeric bound rescales exactly to the
          // key's scale or declines (a finer-scaled bound has no
          // representation in key units).
          val bd: Option[java.math.BigDecimal] = (e.dataType, e.eval()) match {
            case (_, null) => None
            case (_: org.apache.spark.sql.types.DecimalType,
                  d: org.apache.spark.sql.types.Decimal) =>
              Some(d.toJavaBigDecimal)
            case (ByteType | ShortType | IntegerType | LongType, n: Number) =>
              Some(java.math.BigDecimal.valueOf(n.longValue()))
            case _ => None
          }
          bd.flatMap { b =>
            try Some((0, b.setScale(kt.scale).unscaledValue().longValueExact()))
            catch { case _: ArithmeticException => None }
          }
        case _ => (e.dataType, e.eval()) match {
          case (_, null) => None
          case (_: DayTimeIntervalType, l: java.lang.Long) =>
            // micros; over a DATE key the result type is timestamp — the
            // window's key would no longer be the date column. Decline.
            if (isDate) None else Some((0, l.longValue()))
          case (yt: YearMonthIntervalType, m: Integer) =>
            // pure months: per-row calendar resolution (timestamp keys)
            if (monthsOk) Some((m.intValue(), 0L)) else None
          case (CalendarIntervalType, ci: CalendarInterval) =>
            if (ci.months != 0) {
              if (!monthsOk) None
              else if (isDate) {
                // day units; sub-day parts have no date representation
                if (ci.microseconds == 0L) Some((ci.months, ci.days.toLong))
                else None
              } else
                Some((ci.months, ci.days * MicrosPerDay + ci.microseconds))
            } else if (isDate) {
              if (ci.microseconds == 0L) Some((0, ci.days.toLong)) else None
            } else Some((0, ci.days * MicrosPerDay + ci.microseconds))
          case (ByteType | ShortType | IntegerType | LongType, n: Number) =>
            Some((0, n.longValue()))
          case _ => None
        }
      }
      // every component must agree with the bound's side; zero widths
      // are legal (`0 PRECEDING` = CURRENT ROW)
      v.collect {
        case (m, w) if m.toLong * sign >= 0 && w * sign >= 0 =>
          (math.abs(m), math.abs(w))
      }
    case _ => None
  }

  private def funcOf(e: NamedExpression): Option[RangeAgg] = e match {
    case Alias(WindowExpression(
          AggregateExpression(f: DeclarativeAggregate, Complete, false, None, _),
          WindowSpecDefinition(_, orderSpec,
            SpecifiedWindowFrame(RangeFrame, lo, hi))), _)
        if f.deterministic && orderSpec.length == 1 =>
      val keyType = orderSpec.head.child.dataType
      for {
        (xm, x) <- widthOf(lo, -1, keyType)
        (ym, y) <- widthOf(hi, 1, keyType)
        // both CURRENT ROW (peers-only) is fine: the frame is the tie
        // run itself — run-local, zero stitching
      } yield RangeAgg(f, xm, x, ym, y, e.toAttribute)
    case _ => None
  }

  /** Per-expression / node-level categorizers for [[GlobalWindowSplit]]. */
  private[plans] def rescuable(e: NamedExpression): Boolean = funcOf(e).isDefined
  private[plans] def orderRescuable(w: logical.Window): Boolean =
    w.orderSpec.length == 1 &&
      (w.orderSpec.head.child.dataType match {
        case IntegerType | LongType | TimestampType | DateType => true
        // fixed-point: the unscaled value IS a Long key (≤18 digits)
        case d: org.apache.spark.sql.types.DecimalType => d.precision <= 18
        case _ => false
      })

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: logical.Window
        if orderRescuable(w) && w.partitionSpec.forall(_.deterministic) &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          (w.partitionSpec.isEmpty || GlobalWindowGate.perKeyWorthwhile(w)) &&
          SQLConf.get.getConfString(GlobalRowNumberStrategy.ConfKey, "true").toBoolean =>
      GlobalRangeFrameExec(w.partitionSpec, w.orderSpec,
        w.windowExpressions.map(funcOf(_).get), planLater(w.child)) :: Nil
    case _ => Nil
  }
}

object GlobalRangeFrameExec {
  /** One value-window aggregate over `[K − xm months − x, K + ym months
    * + y]` — x/y in key units; xm/ym in calendar months (timestamp
    * keys only, resolved per row through the session zone). */
  case class RangeAgg(agg: DeclarativeAggregate, xm: Int, x: Long,
                      ym: Int, y: Long, attr: Attribute)

  /** Saturating Long add/sub for frame-bound and prune arithmetic:
    * a frame bound past ±Long range clamps to ±Long range, which is
    * semantically exact for a one-sided cut (no key lies beyond it) —
    * unlike silent wraparound, which flips the cut to the wrong side
    * for extreme bigint/decimal(18) keys combined with large widths. */
  @inline private[plans] def satAdd(a: Long, b: Long): Long = {
    val r = a + b
    if (((a ^ r) & (b ^ r)) < 0) { if (b > 0) Long.MaxValue else Long.MinValue }
    else r
  }
  @inline private[plans] def satSub(a: Long, b: Long): Long = {
    val r = a - b
    if (((a ^ b) & (a ^ r)) < 0) { if (b < 0) Long.MaxValue else Long.MinValue }
    else r
  }

  /** Per-task edge summary for the boundary-stitch job. `firstGroup` /
    * `lastGroup` are the task's first/last partition-key tuples;
    * `firstKey` / `lastKey` the first/last NON-NULL order keys WITHIN
    * those groups (the only groups that can continue across the task
    * edge under the (part ⧺ key) range sort); `tail` / `head` the
    * last/first group's trailing-x / leading-y value windows. */
  private[plans] case class EdgeStats(
      firstGroup: Option[UnsafeRow], lastGroup: Option[UnsafeRow],
      firstKey: Option[Long], lastKey: Option[Long],
      tail: Array[(Long, UnsafeRow)], head: Array[(Long, UnsafeRow)])
}

/** Physical distributed RANGE-frame aggregation: range-shuffled sorted
  * input (over partition keys ⧺ order key — a hot partition key spans
  * tasks) + one boundary job shipping each partition's missing edge
  * value-windows (trailing for PRECEDING, leading for FOLLOWING,
  * clipped at partition-key boundaries), then tie-run-at-a-time frame
  * folds over a trailing deque and a bounded lookahead FIFO. */
case class GlobalRangeFrameExec(partition: Seq[Expression],
                                order: Seq[SortOrder],
                                funcs: Seq[GlobalRangeFrameExec.RangeAgg],
                                child: SparkPlan) extends UnaryExecNode {
  import GlobalRangeFrameExec.EdgeStats

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
    import GlobalRangeFrameExec.{satAdd, satSub}
    val childOutput = child.output
    val resultAttrs = output
    val funcsLocal = funcs.toArray
    val keyExpr = order.head.child
    // a DATE key is physically DAYS since epoch — month widths resolve
    // in DAY space (dateAddMonths), and shipping slack is DAY-scale
    val isDateKey = keyExpr.dataType == DateType
    // conservative per-direction spans for the SHIPPING/PRUNING
    // structures only (edge windows, lookahead horizon): month widths
    // over-approximate at 31 days + 2 days of calendar slack — in the
    // KEY's units (days for date keys, micros for timestamps); the
    // per-function FOLDS use exact per-row calendar bounds, so extra
    // shipped rows are simply filtered
    def consSpan(months: Int, units: Long): Long =
      if (months == 0) units
      else if (isDateKey) satAdd(units, months * 31L + 2L)
      else satAdd(units, satAdd(months * 31L * 86400000000L, 2L * 86400000000L))
    val maxX = funcsLocal.map(f => consSpan(f.xm, f.x)).max
    val maxY = funcsLocal.map(f => consSpan(f.ym, f.y)).max
    val anyMonths = funcsLocal.exists(f => f.xm != 0 || f.ym != 0)
    val zoneIdStr = SQLConf.get.sessionLocalTimeZone
    // DateType is physically an int (days since epoch); DECIMAL keys
    // read as their unscaled Long (precision ≤ 18 per orderRescuable)
    val keyKind = keyExpr.dataType match {
      case IntegerType | DateType => 0
      case _: org.apache.spark.sql.types.DecimalType => 2
      case _ => 1
    }
    val (keyPrec, keyScale) = keyExpr.dataType match {
      case d: org.apache.spark.sql.types.DecimalType => (d.precision, d.scale)
      case _ => (0, 0)
    }
    // descending keys are NEGATED into ascending space (negateExact:
    // Long.MinValue would wrap silently — fail loudly instead)
    val negate = order.head.direction != Ascending
    val partExprs = partition
    val rdd = child.execute()

    // boundary job: per partition, the edge summary (first/last
    // partition-key group, their first/last non-null keys, the trailing
    // x-window of the LAST group = rows with key ≥ maxKey − maxX, and
    // the leading y-window of the FIRST group = rows with key ≤ minKey
    // + maxY). Both edge windows are the structures the local pass
    // keeps anyway — memory bounded by one frame's row span. Interior
    // partition-key groups start AND end inside the task (the sort puts
    // a group's rows contiguously) and never need stitching.
    val stats: Array[EdgeStats] =
      rdd.sparkContext.runJob(rdd, (iter: Iterator[InternalRow]) => {
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        val keyProj = UnsafeProjection.create(Seq(keyExpr), childOutput)
        val partProj = UnsafeProjection.create(partExprs, childOutput)
        var firstGroup: UnsafeRow = null
        var curGroup: UnsafeRow = null
        var inFirstGroup = true
        var firstKey: Option[Long] = None
        var lastKey: Option[Long] = None
        val tail = new scala.collection.mutable.ArrayDeque[(Long, UnsafeRow)]
        val head = new scala.collection.mutable.ArrayBuffer[(Long, UnsafeRow)]
        while (iter.hasNext) {
          val row = iter.next()
          val pr = partProj(row)
          if (curGroup == null) { curGroup = pr.copy(); firstGroup = curGroup }
          else if (!pr.equals(curGroup)) {
            // new partition-key group: the previous group ended inside
            // this task — its trailing window can never be needed by a
            // successor of a DIFFERENT group; reset for the new one
            curGroup = pr.copy()
            inFirstGroup = false
            lastKey = None
            tail.clear()
          }
          val kr = keyProj(row)
          if (!kr.isNullAt(0)) {
            val k0 = if (keyKind == 0) kr.getInt(0).toLong
              else if (keyKind == 2) kr.getDecimal(0, keyPrec, keyScale).toUnscaledLong
              else kr.getLong(0)
            val k = if (negate) Math.negateExact(k0) else k0
            if (inFirstGroup && firstKey.isEmpty) firstKey = Some(k)
            lastKey = Some(k)
            if (maxX > 0) {
              tail += ((k, toUnsafe(row).copy()))
              while (tail.head._1 < GlobalRangeFrameExec.satSub(k, maxX))
                tail.removeHead()
            }
            if (maxY > 0 && inFirstGroup &&
                k <= GlobalRangeFrameExec.satAdd(firstKey.get, maxY))
              head += ((k, toUnsafe(row).copy()))
          }
        }
        EdgeStats(Option(firstGroup), Option(curGroup),
          firstKey, lastKey, tail.toArray, head.toArray)
      })
    val nParts = stats.length
    // stitch (predecessor side): partition p receives every predecessor
    // row with key ≥ minKey(p) − maxX from predecessors whose LAST
    // group equals p's FIRST group (a subset of the collected tails,
    // since minKey(p) ≥ every same-group predecessor maxKey; the sort
    // guarantees a group occupying both q and p fills everything
    // between, so the equality filter IS the contiguity filter)
    val preTails: Array[Array[(Long, UnsafeRow)]] = Array.tabulate(nParts) { p =>
      (stats(p).firstGroup, stats(p).firstKey) match {
        case (Some(fg), Some(minKey)) if maxX > 0 =>
          val cut = satSub(minKey, maxX)
          (0 until p).iterator
            .filter(q => stats(q).lastGroup.exists(_.equals(fg)))
            .flatMap(q => stats(q).tail.iterator)
            .filter(_._1 >= cut).toArray
        case _ => Array.empty[(Long, UnsafeRow)]
      }
    }
    // stitch (successor side): partition p receives every successor row
    // with key ≤ maxKey(p) + maxY from successors whose FIRST group
    // equals p's LAST group, in key order
    val postHeads: Array[Array[(Long, UnsafeRow)]] = Array.tabulate(nParts) { p =>
      (stats(p).lastGroup, stats(p).lastKey) match {
        case (Some(lg), Some(maxKey)) if maxY > 0 =>
          val cut = satAdd(maxKey, maxY)
          (p + 1 until nParts).iterator
            .filter(q => stats(q).firstGroup.exists(_.equals(lg)))
            .flatMap(q => stats(q).head.iterator)
            .filter(_._1 <= cut).toArray
        case _ => Array.empty[(Long, UnsafeRow)]
      }
    }
    val firstGroups: Array[UnsafeRow] = stats.map(_.firstGroup.orNull)
    val lastGroups: Array[UnsafeRow] = stats.map(_.lastGroup.orNull)
    // ship partition p ONLY its own edge slice ([[PerPartition.stitch]]
    // — closure capture of the full preTails/postHeads arrays would
    // cost O(#partitions × frame span) PER TASK)
    PerPartition.stitch(rdd, (0 until nParts).map(p =>
      (preTails(p), postHeads(p), firstGroups(p), lastGroups(p)))) { (slice, iter) =>
      val (preTail, post, firstGroup, lastGroup) = slice
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
      val partProj = UnsafeProjection.create(partExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val joinBI = new JoinedRow
      val joinOut = new JoinedRow
      val outProj = UnsafeProjection.create(resultAttrs, resultAttrs)
      // exact per-row frame bounds: fixed-width arithmetic, or calendar
      // month arithmetic in the KEY's physical space — session-zone
      // `timestampAddInterval` in MICROS for timestamp keys (the same
      // DateTimeUtils arithmetic the built-in's bound expressions use;
      // CalendarInterval days folded into micros, as in widthOf), and
      // zone-free `dateAddMonths` in DAYS for date keys (whose
      // CalendarInterval day component stays in day units).
      // DESC keys live NEGATED in this exec; calendar arithmetic only
      // works in original key space, so month bounds compute there and
      // negate back (x PRECEDING under DESC = [K, K+x] original space).
      val zone =
        if (anyMonths && !isDateKey) java.time.ZoneId.of(zoneIdStr) else null
      def addCal(k: Long, months: Int, units: Long): Long =
        if (isDateKey)
          satAdd(org.apache.spark.sql.catalyst.util.DateTimeUtils
            .dateAddMonths(Math.toIntExact(k), months).toLong, units)
        else org.apache.spark.sql.catalyst.util.DateTimeUtils
          .timestampAddInterval(k, months, 0, units, zone)
      def loOf(f: GlobalRangeFrameExec.RangeAgg, k: Long): Long =
        if (f.xm == 0) satSub(k, f.x)
        else if (!negate) addCal(k, -f.xm, -f.x)
        else Math.negateExact(addCal(Math.negateExact(k), f.xm, f.x))
      def hiOf(f: GlobalRangeFrameExec.RangeAgg, k: Long): Long =
        if (f.ym == 0) satAdd(k, f.y)
        else if (!negate) addCal(k, f.ym, f.y)
        else Math.negateExact(addCal(Math.negateExact(k), -f.ym, -f.y))

      // one tie run: equal (group, key) rows (or one run of null-key
      // rows within a group)
      final class Run(val group: UnsafeRow, val key: Long, val isNull: Boolean) {
        val rows = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
      }

      // trailing value-window, seeded with the stitched predecessor
      // edge (rows of this task's FIRST group by construction)
      val deque = new scala.collection.mutable.ArrayDeque[(Long, UnsafeRow)]
      preTail.foreach(deque += _)
      // the group the deque's rows belong to; cleared on group change
      var dequeGroup: UnsafeRow = firstGroup

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
          val pr = partProj(r)
          val isNull = kr.isNullAt(0)
          val key0 = if (isNull) 0L else if (keyKind == 0) kr.getInt(0).toLong
              else if (keyKind == 2) kr.getDecimal(0, keyPrec, keyScale).toUnscaledLong
              else kr.getLong(0)
          val key = if (negate && !isNull) Math.negateExact(key0) else key0
          // continue the previous run if this row is its peer (same
          // partition-key group AND same order key / both null)
          pending.lastOption match {
            case Some(run) if run.group.equals(pr) && run.isNull == isNull &&
                (isNull || run.key == key) =>
              run.rows += r
            case _ =>
              val run = new Run(pr.copy(), key, isNull)
              run.rows += r
              pending += run
          }
          if (!iter.hasNext) readDone = true
        }

        /** Read ahead until the lookahead horizon for key K is covered:
          * a run with key > K + maxY or of a different partition-key
          * group exists, a null run follows (null keys are outside
          * every arithmetic frame), or input ends. At maxY = 0 this
          * still reads one run past K — which is what COMPLETES the
          * current tie run before its frame is folded. */
        private def fillAhead(k: Long): Unit = {
          var done = false
          while (!done) {
            val last = pending.lastOption
            val covered = last.exists(r =>
              (r ne cur) && (r.isNull || !r.group.equals(cur.group) ||
                r.key > satAdd(k, maxY)))
            if (covered || readDone) done = true else readRun()
          }
        }

        private def advance(): Unit = {
          if (pending.isEmpty) readRun()
          if (pending.isEmpty) return
          cur = pending.head
          curPos = 0
          // partition-key boundary: the trailing window never crosses it
          if (dequeGroup == null || !dequeGroup.equals(cur.group)) {
            deque.clear()
            dequeGroup = cur.group
          }
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
            while (deque.nonEmpty && deque.head._1 < satSub(k, maxX))
              deque.removeHead()
            // stitched successors only continue this task's LAST group
            val stitchPost = lastGroup != null && lastGroup.equals(cur.group)
            var i = 0
            while (i < funcsLocal.length) {
              val f = funcsLocal(i)
              inits(i)(InternalRow.empty)
              // 1) trailing deque slice within this function's x-width
              val cut = loOf(f, k)
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
              // 3) lookahead runs within this function's y-width and
              // this run's partition-key group
              if (f.ym > 0 || f.y > 0) {
                val hi = hiOf(f, k)
                val it = pending.iterator
                it.next() // skip cur
                var stop = false
                while (!stop && it.hasNext) {
                  val r = it.next()
                  if (r.isNull || !r.group.equals(cur.group) || r.key > hi)
                    stop = true
                  else {
                    var j2 = 0
                    while (j2 < r.rows.length) {
                      updates(i)(joinBI(buffers(i), r.rows(j2))); j2 += 1
                    }
                  }
                }
                // 4) stitched successors past the partition end (rows
                // of the last group's continuation in later tasks)
                if (stitchPost) {
                  var q = 0
                  while (q < post.length && post(q)._1 <= hi) {
                    updates(i)(joinBI(buffers(i), post(q)._2)); q += 1
                  }
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
