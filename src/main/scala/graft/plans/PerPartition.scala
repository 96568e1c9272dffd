package graft.plans

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD

/** Ship each task ONLY its own slice of driver-computed per-partition
  * state (seeds, edge windows, stitch constants).
  *
  * The obvious `rdd.mapPartitionsWithIndex((pid, it) => ... arr(pid))`
  * captures the WHOLE array in the task closure — every task carries
  * O(#partitions) state, which is noise at 32 partitions and real
  * weight at 10k (the closure is serialized per task, not per
  * executor). Zipping against a one-element-per-partition
  * ParallelCollectionRDD puts exactly element p into task p's partition
  * payload: closure size becomes independent of the partition count.
  * (`ParallelCollectionRDD.slice` with `numSlices == length` assigns
  * element i to partition i — the alignment `zipPartitions` preserves.)
  */
private[plans] object PerPartition {
  /** `f(slice(p), partition p of rdd)` for every p, with `slice(p)`
    * shipped only to task p. An empty `perPid` (0-partition child)
    * yields the rdd's own (empty) shape. */
  def stitch[S: ClassTag, R: ClassTag](rdd: RDD[R], perPid: IndexedSeq[S])
      (f: (S, Iterator[R]) => Iterator[R]): RDD[R] = {
    if (perPid.isEmpty) rdd
    else {
      val edge = rdd.sparkContext.makeRDD(perPid, perPid.length)
      rdd.zipPartitions(edge)((iter, e) => f(e.next(), iter))
    }
  }
}
