package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.keys.Distributor

/** [EXT] Merge-on-read CDC table over the salted store — the layout
  * that makes continuous change capture SCALE: applying a change log
  * by rewriting the base per batch costs a full-table write per
  * micro-batch (100 TB a day for a 100 TB table); appending deltas
  * and resolving at read costs one batch-sized append per batch and
  * one extra shuffle per snapshot read, reclaimed by lazy compaction.
  * The same trade every lakehouse merge-on-read format makes.
  *
  * Layout under `path`:
  *   - `base/`  — a [[SaltedStore]] (bucketed, sorted, compactable)
  *   - `delta/seq=N/` — one plain parquet segment per applied change
  *     batch: base columns + `op` (I/U/D). `seq` orders generations;
  *     the base is generation −1.
  *
  * [[snapshot]] resolves last-writer-wins per key with ONE
  * `groupBy(key).agg(max_by(payload, seq))` — a single hash shuffle
  * with map-side partial aggregation; deliberately NOT a per-key
  * row_number window (same one exchange, but the agg needs no sort
  * and carries one row per key out of the partial, not every
  * version). [[compact]] folds the deltas into the base via
  * [[CdcMerge]] (so the base rewrite joins against the COMPACTED
  * changeset, broadcast-sized) and truncates the delta log.
  *
  * Contract: one writer lifecycle per store; at most one change per
  * key per seq (the resolver breaks seq ties arbitrarily).
  */
object CdcStore {

  /** Marker for a compaction swap in flight (underscore-prefixed: never
    * listed as data). [[snapshot]] refuses mid-swap reads loudly rather
    * than best-effort-reading a half-swapped base — CDC compaction is
    * an offline maintenance op, same discipline [[SaltedStore.compact]]
    * demands of writers. */
  val CompactingMarker = "_graft_cdc_compacting"

  /** Append one change batch as delta generation `seq`. Batch-sized
    * parquet write, no shuffle (a delta segment is small; bucketing it
    * buys nothing until compaction folds it into the base). */
  def append(changes: DataFrame, seq: Long, path: String): Unit =
    changes.withColumn("seq", lit(seq))
      .write.mode("append").partitionBy("seq").parquet(s"$path/delta")

  /** Initialize the base generation. */
  def writeBase(df: DataFrame, keyCol: Column, dist: Distributor,
                path: String): Unit =
    SaltedStore.write(df, keyCol, dist, s"$path/base")

  /** The current logical table: base ⊎ deltas resolved last-writer-wins
    * per `key`, deletes dropped. One extra exchange vs a plain base
    * read — the merge-on-read price [[compact]] reclaims.
    *
    * `asOf`: time travel — resolve only generations ≤ `asOf` (the
    * delta log IS the history until a compact folds it; after a
    * compact, folded generations are no longer addressable and the
    * base is the new floor). The generation filter lands on the `seq`
    * PARTITION column, so an as-of read partition-prunes the delta
    * scan — later generations are never opened. */
  def snapshot(spark: SparkSession, path: String, key: String,
               asOf: Long = Long.MaxValue): DataFrame = {
    requireNotCompacting(spark, path)
    val base = SaltedStore.read(spark, s"$path/base").drop("bucket")
      .withColumn("op", lit("U")).withColumn("seq", lit(-1L))
    val all = deltas(spark, path) match {
      case Some(d) => base.unionByName(
        d.filter(col("seq") <= asOf)
          .withColumn("seq", col("seq").cast("long")))
      case None => base
    }
    resolve(all, key)
  }

  /** Last-writer-wins resolution of a (payload ⧺ op ⧺ seq) version set:
    * max_by the whole payload struct on seq, then drop deletes. */
  def resolve(versions: DataFrame, key: String): DataFrame = {
    val payload = versions.columns.filter(c => c != key && c != "seq")
    versions.groupBy(key)
      .agg(max_by(struct(payload.map(col): _*), col("seq")).as("__r"))
      .select(col(key) +: payload.map(c => col(s"__r.$c").as(c)): _*)
      .filter(col("op") =!= "D").drop("op")
  }

  /** Fold every delta generation into the base and truncate the log.
    * The changeset folds to ONE compacted row per touched key first
    * (delta-sized agg), so the base rewrite is exactly a [[CdcMerge]]
    * — base scans narrow, compacted changes broadcast. The swap parks
    * the old base at `base.old` behind [[CompactingMarker]]; a crash
    * leaves either the old or the new generation intact, never a mix,
    * and re-running compact completes the swap. A crash after the swap
    * but before the log truncation refolds the surviving deltas into
    * the already-folded base — safe because applying a change row
    * twice is a no-op (update/delete/insert are each idempotent under
    * [[CdcMerge]]). Deltas appended AFTER the fold began (seq > the
    * captured high-water mark) survive. */
  def compact(spark: SparkSession, path: String, keyCol: Column,
              dist: Distributor, key: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(root, CompactingMarker)
    val baseDir = new Path(root, "base")
    val oldDir = new Path(root, "base.old")
    val nextDir = new Path(root, "base.next")
    // finish a crashed swap first: base.old without base → roll forward
    if (fs.exists(marker)) {
      if (!fs.exists(baseDir) && fs.exists(nextDir)) fs.rename(nextDir, baseDir)
      if (fs.exists(oldDir)) fs.delete(oldDir, true)
      fs.delete(marker, false)
      if (fs.exists(baseDir) && !fs.exists(nextDir)) () // swap recovered
    }
    val d = deltas(spark, path) match {
      case Some(x) => x
      case None => return // nothing to fold
    }
    // seq arrives as the discovered partition column (int) — cast before
    // the driver-side read of the ONE high-water row
    val highWater = d.agg(max(col("seq").cast("long"))).head().getLong(0)
    // one compacted change row per touched key, op preserved ('D' kept:
    // CdcMerge drops it from the upsert side and anti-joins the key out)
    val compacted = {
      val payload = d.columns.filter(c => c != key && c != "seq")
      d.groupBy(key)
        .agg(max_by(struct(payload.map(col): _*), col("seq")).as("__r"))
        .select(col(key) +: payload.map(c => col(s"__r.$c").as(c)): _*)
    }
    val base = SaltedStore.read(spark, s"$path/base").drop("bucket")
    val merged = CdcMerge(base, compacted, key)
    SaltedStore.write(merged, keyCol, dist, nextDir.toString)
    fs.create(marker, true).close()
    require(fs.rename(baseDir, oldDir), s"compact swap: park $baseDir failed")
    require(fs.rename(nextDir, baseDir), s"compact swap: promote $nextDir failed")
    fs.delete(oldDir, true)
    // drop folded generations only — later appends survive
    val deltaDir = new Path(root, "delta")
    fs.listStatus(deltaDir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("seq=") && n.stripPrefix("seq=").toLong <= highWater)
        fs.delete(st.getPath, true)
    }
    fs.delete(marker, false)
  }

  private def deltas(spark: SparkSession, path: String): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val deltaDir = new Path(path, "delta")
    val fs = deltaDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(deltaDir) &&
        fs.listStatus(deltaDir).exists(_.getPath.getName.startsWith("seq=")))
      Some(spark.read.parquet(s"$path/delta"))
    else None
  }

  private def requireNotCompacting(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val marker = new Path(new Path(path), CompactingMarker)
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(marker),
      s"CDC store at $path is mid-compaction — re-run compact() to " +
        "complete the swap, then snapshot")
  }
}
