package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CumeDist, DenseRank, GenericInternalRow, JoinedRow, Literal, NamedExpression, NTile, PercentRank, Rank, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.IntegerType

/** Scale-safe planning for naive global ranking windows.
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
  * Why per-partition local computation is exact: the range exchange
  * routes a row by comparing its FULL sort key against the partition
  * bounds, so rows with equal sort keys always land in the same
  * partition — a tie run can never span a partition boundary. Hence
  *   row_number   = rowsBefore(p) + localIdx + 1
  *   rank         = rowsBefore(p) + tieRunStart + 1
  *   dense_rank   = distinctKeysBefore(p) + localDense
  *   percent_rank = (rank − 1) / (N − 1)
  *   cume_dist    = (rowsBefore(p) + tieRunEnd) / N
  *   ntile(k)     = bucket(rowsBefore(p) + localIdx, N, k)
  * need no boundary key exchange; N = total rows from the stats pass.
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

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: logical.Window
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          SQLConf.get.getConfString(ConfKey, "true").toBoolean =>
      val funcs = w.windowExpressions.map(e => (funcOf(e).get, e.toAttribute))
      GlobalRowNumberExec(w.orderSpec, funcs, planLater(w.child)) :: Nil
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
}

/** Physical two-pass global ranking: range-shuffled, sorted input
  * (demanded via requiredChildDistribution/Ordering) + one per-partition
  * stats job over the materialized shuffle (row count + distinct key
  * count), then offsets added partition-locally — never a single-task
  * stage. Produces values identical to WindowExec's: row_number/ntile
  * on any tie-free total order (ties land arbitrarily in either plan —
  * distributed sorts never promise tie order); rank/dense_rank/
  * percent_rank/cume_dist on ANY order, because tied rows share their
  * (deterministic) value. */
case class GlobalRowNumberExec(order: Seq[SortOrder],
                               funcs: Seq[(GlobalRowNumberExec.RankFunc, Attribute)],
                               child: SparkPlan) extends UnaryExecNode {
  import GlobalRowNumberExec._

  override def output: Seq[Attribute] = child.output ++ funcs.map(_._2)

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val resultAttrs = output
    val keyExprs = order.map(_.child)
    val modes = funcs.map(_._1).toArray
    // row_number/ntile need only counts; the others need tie runs
    val needKeys = modes.exists {
      case RowNumF | _: NTileF => false
      case _ => true
    }
    val needLookahead = modes.contains(CumeDistF)
    val rdd = child.execute()

    // pass 1: per-partition (rows, distinct sort keys). The child is the
    // materialized range exchange, so this job reads shuffle files, not
    // the upstream lineage — the zipWithIndex cost model.
    val stats: Array[(Long, Long)] = rdd.sparkContext.runJob(rdd,
      (iter: Iterator[InternalRow]) => {
        var cnt = 0L
        var dist = 0L
        if (needKeys) {
          val proj = UnsafeProjection.create(keyExprs, childOutput)
          val sameRun = KeyRunEquality.create(keyExprs.map(_.dataType))
          var prev: UnsafeRow = null
          while (iter.hasNext) {
            val k = proj(iter.next())
            if (prev == null || !sameRun(k, prev)) { dist += 1; prev = k.copy() }
            cnt += 1
          }
        } else {
          while (iter.hasNext) { iter.next(); cnt += 1 }
        }
        (cnt, dist)
      })
    val rowOffsets = stats.map(_._1).scanLeft(0L)(_ + _)
    val distOffsets = stats.map(_._2).scanLeft(0L)(_ + _)
    val totalRows = rowOffsets.last

    // int-typed ranks (row_number/rank/dense_rank/ntile are IntegerType,
    // as in WindowExec) cannot express positions past 2^31. The built-in
    // silently wraps; mid-task toIntExact would fail deep into pass 2.
    // The stats pass already knows N — refuse HERE, at the driver,
    // before any output work starts.
    val intRanked = modes.exists {
      case RowNumF | RankF | DenseRankF | _: NTileF => true
      case _ => false
    }
    if (intRanked && totalRows > Int.MaxValue)
      throw new org.apache.spark.SparkException(
        s"global ranking over $totalRows rows exceeds the IntegerType range " +
          "of row_number/rank/dense_rank/ntile (2^31-1, same type as " +
          "WindowExec, which silently wraps). Pre-aggregate or filter " +
          "before ranking, or window by a partition key.")

    // pass 2: assign values partition-locally from the prefix offsets
    rdd.mapPartitionsWithIndex { (pid, iter) =>
      val rowOffset = rowOffsets(pid)
      val distOffset = distOffsets(pid)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(modes.length)
      val proj = UnsafeProjection.create(resultAttrs, resultAttrs)
      val keyProj =
        if (needKeys) UnsafeProjection.create(keyExprs, childOutput) else null
      val sameRun =
        if (needKeys) KeyRunEquality.create(keyExprs.map(_.dataType)) else null
      var localDense = 0L // distinct keys seen so far in the partition

      // emits one row given its local position, tie-run bounds and the
      // current dense counter; ranking outputs are IntegerType (as in
      // WindowExec) — past 2^31 rows the built-in silently wraps, fail
      // loudly instead. percent_rank/cume_dist are DoubleType.
      def emit(row: InternalRow, localIdx: Long, runStart: Long,
               runEnd: Long): InternalRow = {
        var i = 0
        while (i < modes.length) {
          modes(i) match {
            case RowNumF =>
              rankRow.setInt(i, Math.toIntExact(rowOffset + localIdx + 1))
            case RankF =>
              rankRow.setInt(i, Math.toIntExact(rowOffset + runStart + 1))
            case DenseRankF =>
              rankRow.setInt(i, Math.toIntExact(distOffset + localDense))
            case PercentRankF =>
              val r = rowOffset + runStart + 1
              rankRow.setDouble(i,
                if (totalRows > 1) (r - 1).toDouble / (totalRows - 1).toDouble
                else 0.0)
            case CumeDistF =>
              rankRow.setDouble(i,
                (rowOffset + runEnd + 1).toDouble / totalRows.toDouble)
            case NTileF(k) =>
              // WindowExec's bucketing: first (N % k) buckets take one
              // extra row
              val idx = rowOffset + localIdx
              val bucketSize = totalRows / k
              val padded = totalRows % k
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

      if (!needKeys) {
        var localIdx = -1L
        iter.map { row =>
          localIdx += 1
          emit(row, localIdx, localIdx, localIdx)
        }
      } else if (!needLookahead) {
        // streaming: a row's value depends only on its run START
        var localIdx = 0L
        var runStart = 0L
        var prev: UnsafeRow = null
        iter.map { row =>
          val k = keyProj(row)
          if (prev == null || !sameRun(k, prev)) {
            localDense += 1; runStart = localIdx; prev = k.copy()
          }
          val out = emit(row, localIdx, runStart, localIdx)
          localIdx += 1
          out
        }
      } else {
        // cume_dist needs the run END: buffer one tie run at a time
        // (rows must be copied — the scan iterator reuses its row).
        // Memory is bounded by the largest tie class, the same
        // granularity WindowExec buffers at, but per-partition.
        new Iterator[InternalRow] {
          private val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
          private var bufPos = 0
          private var runStart = 0L
          private var nextKeyRow: InternalRow = _ // first row of the NEXT run
          private var consumed = 0L               // rows handed to emit so far

          private def fillRun(): Unit = {
            buf.clear(); bufPos = 0
            if (nextKeyRow != null) { buf += nextKeyRow; nextKeyRow = null }
            else if (iter.hasNext) buf += iter.next().copy()
            else return
            runStart = consumed
            localDense += 1
            val runKey = keyProj(buf.head).copy()
            var done = false
            while (!done && iter.hasNext) {
              val r = iter.next().copy()
              if (sameRun(keyProj(r), runKey)) buf += r
              else { nextKeyRow = r; done = true }
            }
          }

          override def hasNext: Boolean =
            bufPos < buf.length || nextKeyRow != null || iter.hasNext

          override def next(): InternalRow = {
            if (bufPos >= buf.length) fillRun()
            val row = buf(bufPos)
            val out = emit(row, consumed, runStart, runStart + buf.length - 1)
            bufPos += 1
            consumed += 1
            out
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
