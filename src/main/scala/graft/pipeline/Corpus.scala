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
    // INCLUSIVE running frame minus the row's own count = the exclusive
    // prefix — phrased this way (not `.. -1 PRECEDING`) so even these
    // ~numPartitions-row windows ride the rescued GlobalRunningAgg /
    // GlobalConstantAgg execs: zero built-in global WindowExecs (and
    // zero single-partition warnings) anywhere in the engine
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // per-partition counts → exclusive prefix-sum offsets + grand total,
    // computed INSIDE the same plan as the final join (no collect job) —
    // the offsets windows run over ~numPartitions rows, trivially
    val offsets = ordered.groupBy("__pid").count()
      .withColumn("__off", sum("count").over(wOff) - col("count"))
      .withColumn("__tot", sum("count").over(wAll))
      .select(col("__pid"), col("__off"), col("__tot"), col("count").as("__cnt"))
    ordered
      .join(broadcast(offsets), Seq("__pid"), "left")
      // same two divergence detectors as RoundRobin.withBucket: a pid
      // missing from the offsets (null __off), or shifted boundaries
      // (some partition exceeds its counted size)
      .withColumn("__off", coalesce(col("__off"),
        raise_error(concat(lit("global-index: no offset for partition "), col("__pid")))))
      .withColumn("__rn",
        row_number().over(
          Window.partitionBy("__pid").orderBy(order: _*)).cast("bigint") - 1L)
      .withColumn("__rn", when(col("__rn") < col("__cnt"), col("__rn"))
        .otherwise(raise_error(concat(
          lit("global-index: partition "), col("__pid"),
          lit(" larger than its counted size — range exchange diverged")))))
      .withColumn(idxName, col("__rn") + col("__off"))
      .withColumn(totalName, col("__tot"))
      .drop("__pid", "__rn", "__off", "__cnt", "__tot")
  }
}
