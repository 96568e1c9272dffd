package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, CumeDist, DenseRank, Expression, GenericInternalRow, JoinedRow, Literal, NamedExpression, NTile, PercentRank, Rank, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.IntegerType

/** Scale-safe planning for naive ranking windows.
  *
  * `row_number()/rank()/dense_rank()/percent_rank()/cume_dist()/ntile()
  * OVER (ORDER BY ...)` with no PARTITION BY is the classic
  * scale-killer: Spark's built-in WindowExec requires ALL rows in one
  * partition (SinglePartition), so the whole table funnels through one
  * task — the very anti-pattern the reference's round-robin counter
  * translation avoids with the two-pass global-index plan
  * (keys/Keys.scala RoundRobin, pipeline.Corpus.withGlobalIndex). Users
  * writing plain SQL don't know that; this strategy makes the naive
  * query plan scale anyway.
  *
  * [[GlobalRowNumberStrategy]] matches a Window node whose expressions
  * are ALL drawn from the six ranking functions over an empty partition
  * spec, and plans [[GlobalRowNumberExec]] instead of WindowExec. The
  * exec requires an [[OrderedDistribution]] — EnsureRequirements
  * inserts the same range exchange a global SORT uses (fully parallel)
  * — and assigns values with the two-pass scheme: one tiny job over the
  * materialized shuffle computes per-partition (row count,
  * distinct-sort-key count), then the main pass adds the prefix offsets
  * partition-locally.
  *
  * PARTITIONED ranking — top-N-per-key, THE dedup primitive — is
  * claimed too, for ALL SIX functions: the exchange becomes a range
  * exchange over (partition keys ⧺ order key), so a hot key spans
  * tasks instead of pinning one (stock Spark's hash exchange is the
  * hot-region-server failure mode inside the cluster), counters reset
  * at key-group boundaries, and each task's FIRST group is seeded from
  * a driver-walked chain of predecessor edge-group stats — the same
  * chain the group-aware prefix scan uses. `percent_rank`/`cume_dist`/
  * `ntile` per key additionally need the GROUP TOTAL: a group that
  * spans tasks only ever does so through task EDGES (groups are
  * contiguous under the sort), so the driver merges adjacent edge
  * slices into per-chain totals and hands each task its first/last
  * group's total; interior groups are entirely task-local and their
  * total is just the buffered slice length. When a group-total
  * function is present, pass 2 buffers ONE GROUP at a time — the same
  * granularity WindowExec buffers at, but per range-slice of the key
  * instead of per whole hash partition (no spill here: a slice is
  * bounded by the task's share of the range exchange; the degenerate
  * all-ties key that defeats the range split is the documented
  * tie-run caveat below).
  *
  * Why per-partition local computation is exact: the range exchange
  * routes a row by comparing its FULL sort key against the partition
  * bounds, so rows with equal sort keys always land in the same
  * partition — a tie run can never span a partition boundary. Hence
  *   row_number   = rowsBefore + localIdx + 1
  *   rank         = rowsBefore + tieRunStart + 1
  *   dense_rank   = runsBefore + localDense
  *   percent_rank = (rank − 1) / (N − 1)
  *   cume_dist    = (rowsBefore + tieRunEnd) / N
  *   ntile(k)     = bucket(rowsBefore + localIdx, N, k)
  * need no boundary key exchange; N = total rows from the stats pass
  * in global mode, the group total (driver segment merge / local slice
  * length) per key.
  * cume_dist is the one function needing LOOKAHEAD (a row's value
  * depends on where its tie run ends), so when present the pass buffers
  * one tie run at a time — memory bounded by the largest tie class,
  * exactly WindowExec's own buffering granularity, but per-partition
  * instead of whole-table. Tie DETECTION compares UnsafeRow key
  * projections byte-wise for float-free keys (UnsafeWriter
  * canonicalizes NaN) and via the SQL ordering when a FLOAT/DOUBLE key
  * is present (`-0.0` and `0.0` are peers; see [[KeyRunEquality]]).
  *
  * Opt-out: set `spark.graft.globalRowNumber.enabled=false` to fall
  * back to the built-in single-task WindowExec.
  */
object GlobalRowNumberStrategy extends SparkStrategy {

  val ConfKey = "spark.graft.globalRowNumber.enabled"
  import GlobalRowNumberExec._

  /** Which ranking function a window expression computes, if supported. */
  private def funcOf(e: NamedExpression): Option[RankFunc] = e match {
    case Alias(WindowExpression(_: RowNumber, _), _) => Some(RowNumF)
    case Alias(WindowExpression(_: Rank, _), _) => Some(RankF)
    case Alias(WindowExpression(_: DenseRank, _), _) => Some(DenseRankF)
    case Alias(WindowExpression(_: PercentRank, _), _) => Some(PercentRankF)
    case Alias(WindowExpression(_: CumeDist, _), _) => Some(CumeDistF)
    case Alias(WindowExpression(NTile(Literal(n: Int, IntegerType)), _), _)
        if n > 0 => Some(NTileF(n))
    case _ => None
  }

  /** Per-expression categorizer for [[GlobalWindowSplit]]. */
  private[plans] def rescuable(e: NamedExpression): Boolean = funcOf(e).isDefined

  /** All six ranking functions are PARTITION BY-rescuable: group
    * totals for percent_rank/cume_dist/ntile come from the driver's
    * edge-segment merge (groups span tasks only through edges). */
  private[plans] def rescuablePartitioned(e: NamedExpression): Boolean =
    funcOf(e).isDefined

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: logical.Window
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          SQLConf.get.getConfString(ConfKey, "true").toBoolean =>
      val funcs = w.windowExpressions.map(e => (funcOf(e).get, e.toAttribute))
      GlobalRowNumberExec(Nil, w.orderSpec, funcs, planLater(w.child)) :: Nil
    case w: logical.Window
        if w.partitionSpec.nonEmpty && w.partitionSpec.forall(_.deterministic) &&
          w.orderSpec.nonEmpty && w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(rescuablePartitioned) &&
          GlobalWindowGate.perKeyWorthwhile(w) &&
          SQLConf.get.getConfString(ConfKey, "true").toBoolean =>
      val funcs = w.windowExpressions.map(e => (funcOf(e).get, e.toAttribute))
      GlobalRowNumberExec(w.partitionSpec, w.orderSpec, funcs,
        planLater(w.child)) :: Nil
    case _ => Nil
  }
}

object GlobalRowNumberExec {
  sealed trait RankFunc extends Serializable
  case object RowNumF extends RankFunc
  case object RankF extends RankFunc
  case object DenseRankF extends RankFunc
  case object PercentRankF extends RankFunc
  case object CumeDistF extends RankFunc
  case class NTileF(buckets: Int) extends RankFunc

  /** Per-task edge summary for the group chain: first/last partition-key
    * groups, the FIRST group's row count (for the driver's group-total
    * segment merge) and the LAST group's (row count, tie-run count).
    * With no partition spec every task is one group and the chain walk
    * degenerates to the classic prefix sums. */
  private[plans] case class RankEdge(
      firstGroup: Option[UnsafeRow], lastGroup: Option[UnsafeRow],
      cntFirst: Long, cntLast: Long, distLast: Long)
}

/** Physical two-pass ranking: range-shuffled, sorted input (demanded
  * via requiredChildDistribution/Ordering) + one per-partition stats
  * job over the materialized shuffle (edge-group row/run counts), then
  * offsets added partition-locally, counters reset at key-group
  * boundaries — never a single-task stage, never a per-key task.
  * Produces values identical to WindowExec's: row_number/ntile on any
  * tie-free total order (ties land arbitrarily in either plan —
  * distributed sorts never promise tie order); rank/dense_rank/
  * percent_rank/cume_dist on ANY order, because tied rows share their
  * (deterministic) value. */
case class GlobalRowNumberExec(partition: Seq[Expression],
                               order: Seq[SortOrder],
                               funcs: Seq[(GlobalRowNumberExec.RankFunc, Attribute)],
                               child: SparkPlan) extends UnaryExecNode {
  import GlobalRowNumberExec._

  override def output: Seq[Attribute] = child.output ++ funcs.map(_._2)

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
    val keyExprs = order.map(_.child)
    val partExprs = partition
    val keyGuard = partExprs.nonEmpty
    val modes = funcs.map(_._1).toArray
    // row_number/ntile need only counts; the others need tie runs
    val needKeys = modes.exists {
      case RowNumF | _: NTileF => false
      case _ => true
    }
    val needLookahead = modes.contains(CumeDistF)
    val rdd = child.execute()

    // pass 1: per-partition edge summary — the LAST group's (rows,
    // distinct sort keys) plus the first/last group keys. The child is
    // the materialized range exchange, so this job reads shuffle files,
    // not the upstream lineage — the zipWithIndex cost model. With no
    // partition spec the whole task is one group (classic prefix sums).
    val stats: Array[RankEdge] = rdd.sparkContext.runJob(rdd,
      (iter: Iterator[InternalRow]) => {
        val groupProj = UnsafeProjection.create(partExprs, childOutput)
        var firstG: UnsafeRow = null
        var curG: UnsafeRow = null
        var cnt = 0L
        var cntFirst = -1L // first group's slice; -1 until its end is seen
        var dist = 0L
        val proj =
          if (needKeys) UnsafeProjection.create(keyExprs, childOutput) else null
        val sameRun =
          if (needKeys) KeyRunEquality.create(keyExprs.map(_.dataType)) else null
        var prev: UnsafeRow = null
        while (iter.hasNext) {
          val row = iter.next()
          val g = groupProj(row)
          if (curG == null) { curG = g.copy(); firstG = curG }
          else if (keyGuard && !g.equals(curG)) {
            if (cntFirst < 0) cntFirst = cnt
            curG = g.copy(); cnt = 0L; dist = 0L; prev = null
          }
          if (needKeys) {
            val k = proj(row)
            if (prev == null || !sameRun(k, prev)) { dist += 1; prev = k.copy() }
          }
          cnt += 1
        }
        RankEdge(Option(firstG), Option(curG),
          if (cntFirst < 0) cnt else cntFirst, cnt, dist)
      })
    val nParts = stats.length

    // driver chain walk: task p's seed counters are the carried totals
    // of its first group exactly when that group CONTINUES the chain
    // (group contiguity under the sort makes edge equality the only
    // test); empty tasks carry through. Global mode = one group
    // everywhere = the classic prefix sums.
    val seedRows = new Array[Long](nParts)
    val seedRuns = new Array[Long](nParts)
    locally {
      var chainG: UnsafeRow = null
      var carryRows = 0L
      var carryRuns = 0L
      var p = 0
      while (p < nParts) {
        val e = stats(p)
        val continues = chainG != null && e.firstGroup.exists(_.equals(chainG))
        seedRows(p) = if (continues) carryRows else 0L
        seedRuns(p) = if (continues) carryRuns else 0L
        e.firstGroup match {
          case Some(fg) =>
            val singleGroup = e.lastGroup.exists(_.equals(fg))
            if (continues && singleGroup) {
              carryRows += e.cntLast; carryRuns += e.distLast
            } else {
              carryRows = e.cntLast; carryRuns = e.distLast
            }
            chainG = e.lastGroup.orNull
          case None => () // empty task: the chain passes through
        }
        p += 1
      }
    }
    val firstGroups: Array[UnsafeRow] = stats.map(_.firstGroup.orNull)
    // N for percent_rank/cume_dist/ntile — the whole table in global
    // mode (each task is one group, cntLast is its full count)
    val totalRows = stats.map(_.cntLast).sum

    // group totals for the per-key group-total functions: a group spans
    // tasks only through task EDGES (groups are contiguous under the
    // sort), so merging ADJACENT edge slices with equal keys yields the
    // full total of every task-crossing group; interior groups never
    // appear here — pass 2 measures them locally. Driver state is two
    // longs per task, independent of data size.
    val needTotals = keyGuard && modes.exists {
      case PercentRankF | CumeDistF | _: NTileF => true
      case _ => false
    }
    val firstTotal = new Array[Long](nParts)
    val lastTotal = new Array[Long](nParts)
    if (needTotals) {
      // flatten each task's edge groups into ordered segments
      case class Seg(p: Int, isFirst: Boolean, isLast: Boolean,
                     g: UnsafeRow, cnt: Long)
      val segs = new scala.collection.mutable.ArrayBuffer[Seg]
      var p = 0
      while (p < nParts) {
        val e = stats(p)
        e.firstGroup.foreach { fg =>
          if (e.lastGroup.exists(_.equals(fg)))
            segs += Seg(p, isFirst = true, isLast = true, fg, e.cntLast)
          else {
            segs += Seg(p, isFirst = true, isLast = false, fg, e.cntFirst)
            segs += Seg(p, isFirst = false, isLast = true,
              e.lastGroup.get, e.cntLast)
          }
        }
        p += 1
      }
      var i = 0
      while (i < segs.length) {
        var j = i + 1
        var total = segs(i).cnt
        while (j < segs.length && segs(j).g.equals(segs(i).g)) {
          total += segs(j).cnt; j += 1
        }
        var k = i
        while (k < j) {
          if (segs(k).isFirst) firstTotal(segs(k).p) = total
          if (segs(k).isLast) lastTotal(segs(k).p) = total
          k += 1
        }
        i = j
      }
    }

    // int-typed ranks (row_number/rank/dense_rank/ntile are IntegerType,
    // as in WindowExec) cannot express positions past 2^31. The built-in
    // silently wraps; for GLOBAL ranks the stats pass already knows N —
    // refuse HERE, at the driver, before any output work starts. Per-key
    // ranks are bounded by the largest group: task-crossing groups are
    // checked here via the segment totals; interior groups rely on the
    // per-row toIntExact, which still fails loudly, mid-task.
    val intRanked = modes.exists {
      case RowNumF | RankF | DenseRankF | _: NTileF => true
      case _ => false
    }
    if (!keyGuard && intRanked && totalRows > Int.MaxValue)
      throw new org.apache.spark.SparkException(
        s"global ranking over $totalRows rows exceeds the IntegerType range " +
          "of row_number/rank/dense_rank/ntile (2^31-1, same type as " +
          "WindowExec, which silently wraps). Pre-aggregate or filter " +
          "before ranking, or window by a partition key.")
    if (needTotals && intRanked && firstTotal.exists(_ > Int.MaxValue))
      throw new org.apache.spark.SparkException(
        "a per-key ranking group exceeds the IntegerType range of " +
          "row_number/rank/dense_rank/ntile (2^31-1). Pre-aggregate or " +
          "filter before ranking.")

    // pass 2: assign values partition-locally — counters seeded with the
    // chain carry, reset at every group boundary; each task ships only
    // its own seeds/totals ([[PerPartition.stitch]])
    PerPartition.stitch(rdd, (0 until nParts).map(p =>
      (seedRows(p), seedRuns(p), firstGroups(p), firstTotal(p), lastTotal(p)))) {
      (slice, iter) =>
      val (seedRow, seedRun, firstGroup, firstTotalP, lastTotalP) = slice
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(modes.length)
      val proj = UnsafeProjection.create(resultAttrs, resultAttrs)
      val groupProj = UnsafeProjection.create(partExprs, childOutput)
      val keyProj =
        if (needKeys) UnsafeProjection.create(keyExprs, childOutput) else null
      val sameRun =
        if (needKeys) KeyRunEquality.create(keyExprs.map(_.dataType)) else null
      // idx within the current group (absolute for global mode), runs so
      // far (inclusive), and the current run's start index
      var cnt = seedRow
      var dense = seedRun
      var curG: UnsafeRow = firstGroup
      var prevRun: UnsafeRow = null

      // emits one row given its index, tie-run bounds, run counter and
      // the group total n — all relative to the current key group
      // (= the whole table in global mode). Ranking outputs are
      // IntegerType (as in WindowExec) — past 2^31 the built-in
      // silently wraps, fail loudly instead. percent_rank/cume_dist
      // are DoubleType.
      def emit(row: InternalRow, idx: Long, runStart: Long,
               runEnd: Long, runs: Long, n: Long): InternalRow = {
        var i = 0
        while (i < modes.length) {
          modes(i) match {
            case RowNumF =>
              rankRow.setInt(i, Math.toIntExact(idx + 1))
            case RankF =>
              rankRow.setInt(i, Math.toIntExact(runStart + 1))
            case DenseRankF =>
              rankRow.setInt(i, Math.toIntExact(runs))
            case PercentRankF =>
              val r = runStart + 1
              rankRow.setDouble(i,
                if (n > 1) (r - 1).toDouble / (n - 1).toDouble
                else 0.0)
            case CumeDistF =>
              rankRow.setDouble(i, (runEnd + 1).toDouble / n.toDouble)
            case NTileF(k) =>
              // WindowExec's bucketing: first (N % k) buckets take one
              // extra row
              val bucketSize = n / k
              val padded = n % k
              val threshold = padded * (bucketSize + 1)
              val bucket =
                if (idx < threshold) idx / (bucketSize + 1)
                else padded + (idx - threshold) / bucketSize
              rankRow.setInt(i, Math.toIntExact(bucket + 1))
          }
          i += 1
        }
        proj(joined(row, rankRow))
      }

      // group boundary: reset every per-group counter
      def groupCheck(row: InternalRow): Unit = if (keyGuard) {
        val g = groupProj(row)
        if (curG == null || !g.equals(curG)) {
          curG = g.copy(); cnt = 0L; dense = 0L; prevRun = null
        }
      }

      if (needTotals) {
        // per-key group-total functions (percent_rank/cume_dist/ntile,
        // possibly mixed with the counter functions): buffer ONE GROUP
        // at a time — the granularity WindowExec buffers at, but per
        // range-slice of the key instead of per whole hash partition.
        // The first group's total comes from the driver's segment
        // merge (it may continue a chain from the left/right); the
        // last group's likewise; interior groups are whole by
        // contiguity, so their total is the slice length.
        new Iterator[InternalRow] {
          private val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
          private var starts: Array[Int] = Array.emptyIntArray
          private var ends: Array[Int] = Array.emptyIntArray
          private var denses: Array[Long] = Array.emptyLongArray
          private var bufPos = 0
          private var offset = 0L    // group-relative index of buf(0)
          private var groupN = 0L
          private var pendingNext: InternalRow = _
          private var firstGroupOfTask = true

          private def fillGroup(): Unit = {
            buf.clear(); bufPos = 0
            if (pendingNext != null) { buf += pendingNext; pendingNext = null }
            else if (iter.hasNext) buf += iter.next().copy()
            else return
            val g = groupProj(buf.head).copy()
            var done = false
            while (!done && iter.hasNext) {
              val r = iter.next().copy()
              if (groupProj(r).equals(g)) buf += r
              else { pendingNext = r; done = true }
            }
            val isFirst = firstGroupOfTask
            firstGroupOfTask = false
            val isLast = pendingNext == null && !iter.hasNext
            offset = if (isFirst) seedRow else 0L
            val denseBase = if (isFirst) seedRun else 0L
            groupN =
              if (isFirst) firstTotalP
              else if (isLast) lastTotalP
              else buf.length.toLong
            if (needKeys) {
              // one forward walk marks run starts + dense counters, one
              // backward walk marks run ends (runs never span tasks:
              // equal FULL sort keys land in one range partition)
              if (starts.length < buf.length) {
                starts = new Array[Int](buf.length)
                ends = new Array[Int](buf.length)
                denses = new Array[Long](buf.length)
              }
              var i = 0
              var runStart = 0
              var dense = denseBase
              var prevK: UnsafeRow = null
              while (i < buf.length) {
                val k = keyProj(buf(i))
                if (prevK == null || !sameRun(k, prevK)) {
                  runStart = i; dense += 1; prevK = k.copy()
                }
                starts(i) = runStart; denses(i) = dense
                i += 1
              }
              i = buf.length - 1
              var runEnd = i
              while (i >= 0) {
                if (i == buf.length - 1 || starts(i + 1) != starts(i))
                  runEnd = i
                ends(i) = runEnd
                i -= 1
              }
            }
          }

          override def hasNext: Boolean =
            bufPos < buf.length || pendingNext != null || iter.hasNext

          override def next(): InternalRow = {
            if (bufPos >= buf.length) fillGroup()
            val i = bufPos
            val out =
              if (needKeys)
                emit(buf(i), offset + i, offset + starts(i),
                  offset + ends(i), denses(i), groupN)
              else emit(buf(i), offset + i, offset + i, offset + i, 0L, groupN)
            bufPos += 1
            out
          }
        }
      } else if (!needKeys && !keyGuard) {
        iter.map { row =>
          val out = emit(row, cnt, cnt, cnt, dense, totalRows)
          cnt += 1
          out
        }
      } else if (!needLookahead) {
        // streaming: a row's value depends only on its run START
        var runStart = 0L
        iter.map { row =>
          groupCheck(row)
          if (needKeys) {
            val k = keyProj(row)
            if (prevRun == null || !sameRun(k, prevRun)) {
              dense += 1; runStart = cnt; prevRun = k.copy()
            }
          }
          val out = emit(row, cnt, runStart, cnt, dense, totalRows)
          cnt += 1
          out
        }
      } else {
        // cume_dist (global only) needs the run END: buffer one tie run
        // at a time (rows must be copied — the scan iterator reuses its
        // row). Memory is bounded by the largest tie class, the same
        // granularity WindowExec buffers at, but per-partition.
        new Iterator[InternalRow] {
          private val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
          private var bufPos = 0
          private var runStart = 0L

          private def fillRun(): Unit = {
            buf.clear(); bufPos = 0
            if (pendingNext != null) { buf += pendingNext; pendingNext = null }
            else if (iter.hasNext) buf += iter.next().copy()
            else return
            runStart = cnt
            dense += 1
            val runKey = keyProj(buf.head).copy()
            var done = false
            while (!done && iter.hasNext) {
              val r = iter.next().copy()
              if (sameRun(keyProj(r), runKey)) buf += r
              else { pendingNext = r; done = true }
            }
          }
          private var pendingNext: InternalRow = _

          override def hasNext: Boolean =
            bufPos < buf.length || pendingNext != null || iter.hasNext

          override def next(): InternalRow = {
            if (bufPos >= buf.length) fillRun()
            val row = buf(bufPos)
            val out = emit(row, cnt, runStart, runStart + buf.length - 1,
              dense, totalRows)
            bufPos += 1
            cnt += 1
            out
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
