package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, DenseRank, GenericInternalRow, JoinedRow, NamedExpression, Rank, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

/** Scale-safe planning for naive global ranking windows.
  *
  * `row_number()/rank()/dense_rank() OVER (ORDER BY ...)` with no
  * PARTITION BY is the classic scale-killer: Spark's built-in WindowExec
  * requires ALL rows in one partition (SinglePartition), so the whole
  * table funnels through one task — the very anti-pattern the
  * reference's round-robin counter translation avoids with the two-pass
  * global-index plan (keys/Keys.scala RoundRobin,
  * pipeline.Corpus.withGlobalIndex). Users writing plain SQL don't know
  * that; this strategy makes the naive query plan scale anyway.
  *
  * [[GlobalRowNumberStrategy]] matches a Window node whose expressions
  * are ALL drawn from {row_number, rank, dense_rank} over an empty
  * partition spec, and plans [[GlobalRowNumberExec]] instead of
  * WindowExec. The exec requires an [[OrderedDistribution]] —
  * EnsureRequirements inserts the same range exchange a global SORT uses
  * (fully parallel) — and assigns values with the two-pass scheme: one
  * tiny job over the materialized shuffle computes per-partition (row
  * count, distinct-sort-key count), then the main pass adds the prefix
  * offsets partition-locally.
  *
  * Why per-partition local computation is exact for rank/dense_rank:
  * the range exchange routes a row by comparing its FULL sort key
  * against the partition bounds, so rows with equal sort keys always
  * land in the same partition — a tie run can never span a partition
  * boundary. Hence `rank = rowsBefore(p) + localRankStart + 1` and
  * `dense_rank = distinctKeysBefore(p) + localDense` need no boundary
  * key exchange. Tie DETECTION compares UnsafeRow key projections
  * byte-wise — safe because UnsafeWriter canonicalizes NaN and -0.0.
  *
  * Opt-out: set `spark.graft.globalRowNumber.enabled=false` to fall
  * back to the built-in single-task WindowExec.
  */
object GlobalRowNumberStrategy extends SparkStrategy {

  val ConfKey = "spark.graft.globalRowNumber.enabled"

  /** Which ranking function a window expression computes, if supported. */
  private def funcOf(e: NamedExpression): Option[Int] = e match {
    case Alias(WindowExpression(_: RowNumber, _), _) => Some(GlobalRowNumberExec.RowNum)
    case Alias(WindowExpression(_: Rank, _), _) => Some(GlobalRowNumberExec.RankF)
    case Alias(WindowExpression(_: DenseRank, _), _) => Some(GlobalRowNumberExec.DenseRankF)
    case _ => None
  }

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
  val RowNum = 0
  val RankF = 1
  val DenseRankF = 2
}

/** Physical two-pass global ranking: range-shuffled, sorted input
  * (demanded via requiredChildDistribution/Ordering) + one per-partition
  * stats job over the materialized shuffle (row count + distinct key
  * count), then offsets added partition-locally — never a single-task
  * stage. Produces values identical to WindowExec's: row_number on any
  * tie-free total order (ties land arbitrarily in either plan —
  * distributed sorts never promise tie order); rank/dense_rank on ANY
  * order, because tied rows share their (deterministic) value. */
case class GlobalRowNumberExec(order: Seq[SortOrder],
                               funcs: Seq[(Int, Attribute)],
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
    // rank/dense_rank need tie runs; row_number alone only needs counts
    val needKeys = modes.exists(_ != RowNum)
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
          var prev: UnsafeRow = null
          while (iter.hasNext) {
            val k = proj(iter.next())
            if (prev == null || !k.equals(prev)) { dist += 1; prev = k.copy() }
            cnt += 1
          }
        } else {
          while (iter.hasNext) { iter.next(); cnt += 1 }
        }
        (cnt, dist)
      })
    val rowOffsets = stats.map(_._1).scanLeft(0L)(_ + _)
    val distOffsets = stats.map(_._2).scanLeft(0L)(_ + _)

    // pass 2: assign values partition-locally from the prefix offsets
    rdd.mapPartitionsWithIndex { (pid, iter) =>
      val rowOffset = rowOffsets(pid)
      val distOffset = distOffsets(pid)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(modes.length)
      val proj = UnsafeProjection.create(resultAttrs, resultAttrs)
      val keyProj =
        if (needKeys) UnsafeProjection.create(keyExprs, childOutput) else null
      var localIdx = 0L      // 0-based row position within the partition
      var localDense = 0L    // distinct keys seen so far in the partition
      var runStart = 0L      // localIdx where the current tie run began
      var prev: UnsafeRow = null
      iter.map { row =>
        if (needKeys) {
          val k = keyProj(row)
          if (prev == null || !k.equals(prev)) {
            localDense += 1; runStart = localIdx; prev = k.copy()
          }
        }
        var i = 0
        while (i < modes.length) {
          // ranking functions are IntegerType (as in WindowExec); past
          // 2^31 rows the built-in silently wraps — fail loudly instead
          val v = modes(i) match {
            case RowNum => rowOffset + localIdx + 1
            case RankF => rowOffset + runStart + 1
            case DenseRankF => distOffset + localDense
          }
          rankRow.setInt(i, Math.toIntExact(v))
          i += 1
        }
        localIdx += 1
        proj(joined(row, rankRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
