package graft.plans

import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.internal.SQLConf

/** Size gate for PARTITION BY window rescues.
  *
  * A partitioned window has two physical plans: stock Spark's hash
  * exchange + in-task WindowExec (one exchange, no extra jobs — but
  * every row of a key in ONE task), and this package's range-exchange
  * rescue (a hot key spans tasks — but pays a range-partitioner sample
  * pass, a per-chain driver stats job, and edge stitching). The rescue
  * is the only plan that finishes when a key is hot; the stock plan is
  * strictly cheaper when keys are well-distributed — and "is the key
  * hot" is a data property no plan-time check can see.
  *
  * What IS visible at plan time is the bound on the damage: under a
  * hash exchange the worst-case task processes the node's ENTIRE input
  * (all rows in one key). So the gate claims the rescue exactly when
  * that worst case is unacceptable: child estimated size ≥
  * `spark.graft.perKeyWindow.minChildBytes` (default 1g). Below the
  * threshold even total skew is a single task of bounded, tolerable
  * size; above it, an undetectable hot key can pin a task arbitrarily
  * long and the skew-safe plan wins. This mirrors how Spark itself
  * gates broadcast joins on `autoBroadcastJoinThreshold` — a plan-time
  * size estimate standing in for a runtime property.
  *
  * Set `0` to always claim (the q_skew_* demo queries and every spec
  * pin this — they exist to exercise the rescue path), or a huge value
  * to never claim per-key (stock behavior). GLOBAL (empty partition
  * spec) windows are never gated: stock plans them as ONE task
  * regardless of size, so the rescue is the only scale-safe plan at
  * any size worth distributing.
  *
  * Estimates come from `LogicalPlan.stats.sizeInBytes` (file sizes
  * through scans, propagated heuristics elsewhere) — like every
  * estimate, it can under-shoot after aggressive filters/aggregates;
  * the conf is the escape hatch in both directions.
  */
object GlobalWindowGate {
  val MinBytesKey = "spark.graft.perKeyWindow.minChildBytes"
  val DefaultMinBytes = "1g"

  private def minBytes: Long = org.apache.spark.network.util.JavaUtils
    .byteStringAsBytes(SQLConf.get.getConfString(MinBytesKey, DefaultMinBytes))

  /** True when a PARTITION BY window node should claim the skew-safe
    * rescue: the gate is disabled, or the child's estimated size makes
    * the stock plan's worst-case single task unacceptable. */
  def perKeyWorthwhile(w: logical.Window): Boolean = {
    val min = minBytes
    min <= 0 || w.child.stats.sizeInBytes >= min
  }
}
