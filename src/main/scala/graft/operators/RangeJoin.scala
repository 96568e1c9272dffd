package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** [EXT] Scalable point-in-interval range join (SURVEY.md §2.2 joins:
  * the "as-of/range flavor natural to the time-series workload").
  *
  * Spark plans a raw `l.ts BETWEEN r.lo AND r.hi` join as a broadcast /
  * nested-loop — quadratic row comparisons, the classic 100 TB cliff.
  * This operator applies the standard coarse-bucket decomposition:
  * intervals explode to the time buckets they cover, points map to their
  * single bucket, and the join becomes an EQUI-join on the bucket id
  * (hash-shuffled, AQE/skew-safe, whole-stage codegen) followed by the
  * exact residual predicate. Each (point, interval) pair meets exactly
  * once because a point owns exactly one bucket — no post-join dedup.
  *
  * Bucket width trades shuffle fan-out (intervals copy to
  * ⌈len/width⌉+1 buckets) against join selectivity (bucket-mates that
  * fail the residual). Rule of thumb: width ≈ the typical interval
  * length, so intervals land in ~2 buckets.
  *
  * This is the same idea as the reference's hash-prefix fan-out — one
  * logical range becomes a small set of physical bucket lookups
  * (wd/AbstractRowKeyDistributor.java:47-69) — applied to a join.
  */
object RangeJoin {

  /** Join `points` (with `ptCol`, a NON-NEGATIVE BIGINT instant) to
    * `intervals` (with `loCol`/`hiCol` non-negative BIGINT bounds,
    * inclusive/exclusive) on lo <= pt < hi, via `width`-sized buckets.
    * Columns from both sides survive; callers aggregate or project as
    * usual. Bucketing uses true integral division (`div`): a
    * double-division floor would silently corrupt buckets past 2^53 —
    * nanosecond epochs are already there — and `div` also lets the
    * DivRangePushdown rule derive parquet-pushable raw bounds from any
    * additional bucket predicate. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: Column, loCol: Column, hiCol: Column,
                      width: Long): DataFrame = {
    // drop empty intervals first: lo >= hi matches nothing, and Spark's
    // sequence(a, b) with a > b would emit a DESCENDING bucket range —
    // harmless junk here (the residual predicate rejects it) but wasted
    // join input
    val p = points.withColumn("__pb", floorDiv(ptCol, width))
    val i = intervals.filter(loCol < hiCol).withColumn("__ib",
      explode(sequence(floorDiv(loCol, width), floorDiv(hiCol - lit(1L), width))))
    p.join(i, col("__pb") === col("__ib") && loCol <= ptCol && ptCol < hiCol)
      .drop("__pb", "__ib")
  }

  private def floorDiv(c: Column, w: Long): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(c.cast("bigint")),
      ColumnBridge.expression(lit(w))))
}
