package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exclusive prefix-sum offsets for the two-pass global-index pattern
  * (`RoundRobin.withBucket`, `Corpus.withGlobalIndex`).
  *
  * Input: per-partition counts — ONE row per range partition. Output:
  * one row per partition with its exclusive prefix `__off`, the grand
  * total `__tot`, and its own `__cnt` — ready to broadcast-join back
  * on `__pid`.
  *
  * The obvious phrasing is a running-sum window over `__pid`, but a
  * window over ~#partitions rows still drags whole-operator machinery
  * behind it: the rescued global exec pays a range-exchange SAMPLE
  * job + a boundary stats job (fixed cost, sized for billions of
  * rows, spent on 32), and the built-in pays a single-task WindowExec
  * the fallback warner rightly flags. A prefix sum over a list that
  * FITS IN ONE ROW is not a distributed problem — so pack the counts
  * into one sorted array (`collect_list` → `sort_array`: an ordinary
  * aggregation, no window), scan it with `aggregate()` (codegen'd,
  * driver-free, one row), and explode back. At 100k partitions the
  * array is ~2 MB in one row — trivial; the downstream broadcast of
  * the exploded offsets is the same size it always was.
  */
object PrefixOffsets {
  /** `counts` must have columns `__pid` (int, unique) and `count`
    * (bigint). Stays entirely inside the plan — no collect job, so the
    * offsets observe the same partitioning as the main branch (the
    * ReuseExchange invariant the callers' divergence guards rely on). */
  def of(counts: DataFrame): DataFrame =
    counts
      .agg(sort_array(collect_list(struct(col("__pid"), col("count")))).as("a"))
      .select(
        expr("aggregate(a, cast(0 as bigint), (s, x) -> s + x.count)").as("__tot"),
        expr("""aggregate(a,
             named_struct('acc', cast(0 as bigint),
                          'out', cast(array() as array<struct<p:int,o:bigint,c:bigint>>)),
             (s, x) -> named_struct('acc', s.acc + x.count,
                                    'out', array_append(s.out,
                                      named_struct('p', x.__pid, 'o', s.acc, 'c', x.count))),
             s -> s.out)""").as("offs"))
      .select(col("__tot"), explode(col("offs")).as("o"))
      .select(col("o.p").as("__pid"), col("o.o").as("__off"),
        col("o.c").as("__cnt"), col("__tot"))

  /** The per-partition counts of `ordered` keyed by its physical
    * partition id — the standard first pass of the two-pass pattern. */
  def countsOf(ordered: DataFrame): DataFrame =
    ordered.groupBy("__pid").count()
}
