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

  /** Join two INTERVAL sets on overlap — `[lLo, lHi) ∩ [rLo, rHi) ≠ ∅`,
    * i.e. `lLo < rHi AND rLo < lHi` (half-open on both sides, empty
    * intervals match nothing). Same coarse-bucket decomposition as
    * [[pointInInterval]], with both sides exploding to their covered
    * buckets; the join is the bucket EQUI-join plus the exact overlap
    * residual. Each overlapping pair meets in every bucket both sides
    * cover, so dedup is the claim predicate: a pair is EMITTED only in
    * the bucket owning the overlap's start, `greatest(lLo, rLo) div
    * width` — a bucket both intervals necessarily cover. One
    * comparison, no distinct, no second shuffle.
    *
    * Column names must be unique across the two inputs (they resolve
    * by name in the joined plan) and bounds must be NON-NEGATIVE
    * BIGINTs (`div` truncation vs floor — same contract as
    * pointInInterval). Width rule of thumb: ≈ the typical interval
    * length on the LONGER side, so fan-out stays ~2 buckets per
    * interval. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLo: Column, lHi: Column, rLo: Column, rHi: Column,
                      width: Long): DataFrame = {
    val l = left.filter(lLo < lHi).withColumn("__lb",
      explode(sequence(floorDiv(lLo, width), floorDiv(lHi - lit(1L), width))))
    val r = right.filter(rLo < rHi).withColumn("__rb",
      explode(sequence(floorDiv(rLo, width), floorDiv(rHi - lit(1L), width))))
    l.join(r, col("__lb") === col("__rb") &&
        lLo < rHi && rLo < lHi &&
        col("__lb") === floorDiv(greatest(lLo, rLo), width))
      .drop("__lb", "__rb")
  }

  private def floorDiv(c: Column, w: Long): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(c.cast("bigint")),
      ColumnBridge.expression(lit(w))))
}
