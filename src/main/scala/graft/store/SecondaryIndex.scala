package graft.store

import graft.keys.{Distributor, Hash31, HashPrefix}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [REF-intent] Secondary (value → key) index over a salted store —
  * the classic HBase companion pattern the reference's salting makes
  * necessary: the base table is keyed (and bucket-pruned) by ROW KEY
  * (reference README:75-78 — hash-mode point gets recompute the bucket
  * from the key), so any lookup by a VALUE column is a full scan. The
  * index is simply a second salted store whose ROWS are (value, key)
  * pairs and whose salt is the engine's own Hash31 over the VALUE —
  * so a value lookup is the reference's point-get bucket prune applied
  * to the index (read ONE of n partitions at file-listing time), and
  * the recovered keys then prune the BASE the same way.
  *
  * Scale shape: the index build is one narrow projection + the salted
  * write's single small-key repartition (§3.1). A point lookup reads
  * 1/n of the index, never the base; a probe-SET lookup broadcasts the
  * probes and equi-joins on (bucket, v), leaving the index scan
  * eligible for dynamic partition pruning — and the recovered keys
  * join back to the base on (bucket, key), pruning base partitions the
  * same way. Nothing in the flow scans a table it can prune.
  */
object SecondaryIndex {
  /** Index rows are (v, k); the store salts on `v`. Values must be
    * non-negative BIGINTs (the Hash31 domain — same contract as every
    * salted key; hash or dictionary-encode other types first). */
  def write(df: DataFrame, valueCol: Column, keyCol: Column,
            numBuckets: Int, path: String): Unit =
    SaltedStore.write(
      df.select(valueCol.cast("long").as("v"), keyCol.cast("long").as("k")),
      col("v"), HashPrefix(numBuckets), path)

  /** Idempotent build — [[SaltedStore.ensure]] on the (v, k) layout. */
  def ensure(df: DataFrame, valueCol: Column, keyCol: Column,
             numBuckets: Int, path: String): Boolean =
    SaltedStore.ensure(
      df.select(valueCol.cast("long").as("v"), keyCol.cast("long").as("k")),
      col("v"), HashPrefix(numBuckets), path)

  /** Keys for ONE value: static bucket prune (the literal bucket is
    * recomputed from the value, reference README:75-78) + value filter
    * inside the one surviving partition. */
  def lookupKeys(spark: SparkSession, path: String, numBuckets: Int,
                 value: Long): DataFrame = {
    val dist = HashPrefix(numBuckets)
    SaltedStore.read(spark, path)
      .filter(col("bucket") === dist.bucket(lit(value)) && col("v") === value)
      .select(col("k"))
  }

  /** Keys for a probe SET (one column of values): probes broadcast and
    * equi-join on (bucket, v) — the index scan stays eligible for
    * dynamic partition pruning on its partition column. Returns
    * (v, k). */
  def lookupSet(spark: SparkSession, path: String, numBuckets: Int,
                probes: DataFrame): DataFrame = {
    val dist = HashPrefix(numBuckets)
    val p = probes.select(col(probes.columns.head).cast("long").as("v"))
      .distinct()
      .withColumn("bucket", dist.bucket(col("v")))
    broadcast(p).join(SaltedStore.read(spark, path), Seq("bucket", "v"))
      .select("v", "k")
  }

  /** Fetch base rows for a probe set THROUGH the index: index lookup
    * (pruned) → recovered keys re-bucket under the BASE's distributor →
    * broadcast equi-join on (bucket, key) — base partitions prune
    * dynamically; the base is never scanned beyond the probed buckets.
    * `baseKey` names the base store's key column. */
  def fetchThrough(spark: SparkSession, indexPath: String, idxBuckets: Int,
                   basePath: String, baseDist: Distributor, baseKey: String,
                   probes: DataFrame): DataFrame = {
    val keys = lookupSet(spark, indexPath, idxBuckets, probes)
      .select(col("k")).distinct()
      .withColumn("kb", baseDist match {
        case h: HashPrefix => Hash31.bucket(col("k"), h.numBuckets)
        case d => throw new IllegalArgumentException(
          s"fetchThrough needs a key-recomputable distributor, got $d")
      })
    broadcast(keys)
      .join(SaltedStore.read(spark, basePath),
        col("k") === col(baseKey) && col("kb") === col("bucket"))
      .drop("k", "kb")
  }
}
