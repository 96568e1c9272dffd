package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Corpus-construction operators shared by the training-data
  * pipeline queries: the scale-safe global row index (the primitive
  * under deterministic shuffling, quality binning and sequence packing).
  *
  * The naive formulation of "position in a global order" is
  * `row_number() OVER (ORDER BY ...)` — an unpartitioned window that
  * funnels the whole corpus through ONE task; at 100 TB that task never
  * finishes. This is the same two-pass pattern as the round-robin salt
  * (graft.keys.Keys RoundRobin.withBucket, itself the DataFrame analog
  * of RDD zipWithIndex): range-partition by the order, per-partition
  * row_number (fully parallel), plus broadcast per-partition offsets
  * from a tiny count aggregation. Both branches sit on the identical
  * range exchange (ReuseExchange plans it once) so partition ids agree
  * by construction, and the same two loud-failure detectors guard the
  * impossible-divergence case.
  */
object Corpus {

  /** Adds `idxName` (0-based global row index under `order`) and
    * `totalName` (total row count, the same on every row) to `df`.
    * `order` must be a unique total order (tie-break on a key column).
    * Cost: one range exchange + one broadcast of ~numPartitions rows —
    * no single-task stage at any scale. */
  def withGlobalIndex(df: DataFrame, order: Seq[Column],
                      idxName: String, totalName: String): DataFrame = {
    val ordered = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      // partition-LOCAL row index with zero further exchanges: the low
      // 33 bits of monotonically_increasing_id are the task's record
      // counter, incrementing in iterator order — the sort above makes
      // that the global order. A `row_number() OVER (PARTITION BY
      // __pid ...)` would re-shuffle: Catalyst cannot see the physical
      // __pid clustering. Wrap guard below (2^33 rows per partition).
      .withColumn("__rn",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
    // per-partition counts → exclusive prefix-sum offsets + grand total,
    // computed INSIDE the same plan as the final join (no collect job).
    // The prefix scan is a single-row array fold
    // ([[graft.operators.PrefixOffsets]]) — no window exec at all, so
    // these ~numPartitions-row side computations carry neither the
    // rescued execs' sample/stats jobs nor a single-task WindowExec.
    val offsets = graft.operators.PrefixOffsets
      .of(graft.operators.PrefixOffsets.countsOf(ordered))
      .select(col("__pid"), col("__off"), col("__tot"), col("__cnt"))
    ordered
      .join(broadcast(offsets), Seq("__pid"), "left")
      // same two divergence detectors as RoundRobin.withBucket: a pid
      // missing from the offsets (null __off), or shifted boundaries
      // (some partition exceeds its counted size)
      .withColumn("__off", coalesce(col("__off"),
        raise_error(concat(lit("global-index: no offset for partition "), col("__pid")))))
      .withColumn("__rn", when(col("__cnt") >= (1L << 33),
        raise_error(concat(lit("global-index: partition "), col("__pid"),
          lit(" exceeds 2^33 rows — local index would wrap"))))
        .otherwise(col("__rn")))
      .withColumn("__rn", when(col("__rn") < col("__cnt"), col("__rn"))
        .otherwise(raise_error(concat(
          lit("global-index: partition "), col("__pid"),
          lit(" larger than its counted size — range exchange diverged")))))
      .withColumn(idxName, col("__rn") + col("__off"))
      .withColumn(totalName, col("__tot"))
      .drop("__pid", "__rn", "__off", "__cnt", "__tot")
  }
}
