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

  /** One micro-batch append into an existing index layout — the
    * streaming maintenance path (StreamingIngest.secondaryIndexWriter
    * wraps this under the idempotent commit log). Appended files land
    * inside their `bucket=N` partition, so lookups see new entries on
    * their next file listing; small files accumulate per batch —
    * reclaim with [[compact]]. */
  def append(df: DataFrame, valueCol: Column, keyCol: Column,
             numBuckets: Int, path: String): Unit =
    SaltedStore.write(
      df.select(valueCol.cast("long").as("v"), keyCol.cast("long").as("k")),
      col("v"), HashPrefix(numBuckets), path, mode = "append")

  /** Rewrite each bucket of a grown index to ⌈bytes/targetBytes⌉ files
    * re-sorted by value — [[SaltedStore.compact]] on the (v, k) layout.
    * Same writer discipline: pause appends for the duration. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Unit =
    SaltedStore.compact(spark, path, col("v"), targetBytes)

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
                   probes: DataFrame): DataFrame =
    fetchBase(spark,
      lookupSet(spark, indexPath, idxBuckets, probes).select(col("k")),
      basePath, baseDist, baseKey)

  /** The shared index→base hop: recovered keys re-bucket under the
    * BASE's distributor and broadcast-equi-join the base on
    * (bucket, key) — base partitions prune dynamically. */
  private[store] def fetchBase(spark: SparkSession, keys: DataFrame,
                               basePath: String, baseDist: Distributor,
                               baseKey: String): DataFrame = {
    val k = keys.select(col(keys.columns.head).as("k")).distinct()
      .withColumn("kb", baseDist match {
        case h: HashPrefix => Hash31.bucket(col("k"), h.numBuckets)
        case d => throw new IllegalArgumentException(
          s"fetchThrough needs a key-recomputable distributor, got $d")
      })
    broadcast(k)
      .join(SaltedStore.read(spark, basePath),
        col("k") === col(baseKey) && col("kb") === col("bucket"))
      .drop("k", "kb")
  }
}

/** [REF] Range-capable secondary (value → key) index — the piece a
  * hash-salted index cannot provide BY CONSTRUCTION: `value ∈ [a, b)`
  * probes. Hash salting scatters adjacent values across all buckets
  * (that is its job — reference README:9-18), so [[SecondaryIndex]]
  * answers only equality. This layout instead partitions the index by
  * FIXED-WIDTH value bins, `vb = v div width`, and a range probe is the
  * reference's interval fan-out (O6, wd/AbstractRowKeyDistributor.java:
  * 47-69 — one [start, stop) interval becomes one scan per prefix)
  * applied to the VALUE domain: [lo, hi) covers exactly bins
  * `lo div width .. (hi−1) div width`, a pair of static partition-filter
  * bounds resolved at FILE-LISTING time — no data read outside the
  * probed bins, ever.
  *
  * Scale shape: the build is one narrow projection + one repartition on
  * the small bin key (skew caveat: a value distribution concentrated in
  * few bins concentrates the write — pick `width` from the value
  * histogram, e.g. SaltAdvisor-style deciles). Within each bin, files
  * sort by `v`, so parquet min/max row-group skipping narrows the scan
  * further inside the boundary bins — the HBase start/stop-row seek
  * analog. Point lookups degrade gracefully (one bin + row-group skip);
  * the hash index stays the better point structure (1/n of a uniformly
  * distributed store), which is why BOTH layouts exist, same as a DB
  * offering hash AND btree indexes. */
object RangeIndex {
  /** Write (v, k) rows binned by `vb = v div width`, sorted by v within
    * each bin. Values must be non-negative BIGINTs (same contract as
    * every salted key — `div` truncation and floor disagree below 0). */
  def write(df: DataFrame, valueCol: Column, keyCol: Column,
            width: Long, path: String, mode: String = "overwrite"): Unit = {
    require(width > 0, s"bin width must be positive, got $width")
    df.select(valueCol.cast("long").as("v"), keyCol.cast("long").as("k"))
      .withColumn("vb", expr(s"v div ${width}L"))
      .repartition(col("vb"))
      .sortWithinPartitions(col("v"))
      .write.partitionBy("vb").mode(mode).parquet(path)
  }

  /** One micro-batch append into an existing range-index layout — the
    * streaming maintenance path (StreamingIngest.rangeIndexWriter wraps
    * this under the idempotent commit log). Appended files land inside
    * their `vb=N` bin, so range probes see new entries on their next
    * file listing with the same bin prune; each batch's files are
    * v-sorted internally but bins accumulate one file per batch —
    * reclaim (and restore the global per-bin v-order that makes
    * row-group skipping file-disjoint) with [[compact]]. */
  def append(df: DataFrame, valueCol: Column, keyCol: Column,
             width: Long, path: String): Unit =
    write(df, valueCol, keyCol, width, path, mode = "append")

  /** Rewrite each grown bin to ⌈bytes/targetBytes⌉ files range-split
    * and re-sorted by v — [[SaltedStore.compact]] on the `vb=N` layout
    * (same marker-guarded swap, readers keep serving mid-rewrite). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Unit =
    SaltedStore.compact(spark, path, col("v"), targetBytes,
      partitionPrefix = "vb")

  /** Idempotent [[write]] — same `_SUCCESS` contract as
    * [[SaltedStore.ensure]]. Returns true when a write happened. */
  def ensure(df: DataFrame, valueCol: Column, keyCol: Column,
             width: Long, path: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    val done = fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))
    if (!done) write(df, valueCol, keyCol, width, path)
    !done
  }

  /** (v, k) rows with `v ∈ [lo, hi)` — half-open, the reference's scan
    * contract (start inclusive, stop exclusive; stop `None` = unbounded,
    * the empty-stop branch of AbstractRowKeyDistributor.java:50-57).
    * Each bound contributes a static bin-range predicate on the
    * partition column (pruned at file listing) plus the exact value
    * predicate (pushed to parquet row groups inside boundary bins). */
  def lookupRange(spark: SparkSession, path: String, width: Long,
                  lo: Option[Long], hi: Option[Long]): DataFrame = {
    val idx = SaltedStore.read(spark, path, partitionPrefix = "vb")
    val bounds =
      lo.map(l => col("vb") >= lit(l / width) && col("v") >= lit(l)) ++
        hi.map(h => col("vb") <= lit((h - 1) / width) && col("v") < lit(h))
    bounds.reduceOption(_ && _).fold(idx)(idx.filter).select("v", "k")
  }

  /** Fetch base rows for a value RANGE through the index — the ordered
    * range scan the reference exists to serve (README:75-78,
    * wd/DistributedScanner.java:106-139), now driven by a VALUE interval:
    * pruned index scan → recovered keys → base equi-join with dynamic
    * bucket pruning. */
  def fetchRangeThrough(spark: SparkSession, indexPath: String, width: Long,
                        basePath: String, baseDist: Distributor, baseKey: String,
                        lo: Option[Long], hi: Option[Long]): DataFrame =
    SecondaryIndex.fetchBase(spark,
      lookupRange(spark, indexPath, width, lo, hi).select(col("k")),
      basePath, baseDist, baseKey)
}
