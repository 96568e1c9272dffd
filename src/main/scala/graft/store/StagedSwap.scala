package graft.store

import org.apache.spark.sql.SparkSession

/** The generational-migration protocol shared by every persisted layout
  * whose physical tuning is PINNED at creation: the salted store's
  * bucket count (`SaltedStore.resalt`), the IVF index's codebook
  * (`VectorIndex.recluster`), the text index's shard count
  * (`TextIndex.reshard`) and the band index's shard count
  * (`BandIndex.reshard`). The reference pins these parameters for the
  * table's lifetime by design (`wd/Parametrizable.java:24-27` exists so
  * every reader reconstructs the writing distributor); re-tuning them is
  * a full rewrite, and this object makes that rewrite ONE crash-safe
  * operation instead of a manual copy with a correctness cliff.
  *
  * Three phases, each idempotently resumable by re-invoking the caller
  * with the same arguments:
  *
  *  1. STAGE (marker absent): the caller's `stage` builds the COMPLETE
  *     new generation under an invisible dot-dir; the marker — recording
  *     `tag`, the identity of the target generation — commits only after
  *     staging succeeds. A crash here leaves the store untouched; the
  *     next attempt deletes the debris and restages.
  *  2. PARK (marker up, no `parked/_DONE`): every visible root child the
  *     caller's `parkFilter` claims for the old generation moves under
  *     the parked dir; `_DONE` records completion. The strict phase
  *     order makes resume unambiguous: before `_DONE`, every visible
  *     filtered child is old-generation; after it, new-generation.
  *  3. SWAP (after `_DONE`): staged children matching `swapFilter` move
  *     into the root; cleanup deletes the marker LAST, so a
  *     half-migrated store stays self-describing.
  *
  * OFFLINE by contract: migrations change the SET of layout dirs, so no
  * consistent union exists mid-swap — each caller's read path refuses a
  * standing marker. A resume with a different `tag` is refused (the two
  * generations would not be the caller's intended one). */
object StagedSwap {
  def migrate(spark: SparkSession, path: String, markerName: String,
              stagingName: String, parkedName: String,
              opName: String, what: String, tag: String,
              parkFilter: String => Boolean,
              swapFilter: String => Boolean,
              stage: String => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(root, markerName)
    val staging = new Path(root, stagingName)
    val parked = new Path(root, parkedName)
    val done = new Path(parked, "_DONE")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val recorded = try in.readUTF() finally in.close()
      require(recorded == tag,
        s"$opName: in-flight migration targets $what '$recorded', not " +
          s"'$tag' — resume with the original $what")
    } else {
      fs.delete(staging, true) // debris from an attempt that died pre-commit
      fs.delete(parked, true)
      stage(staging.toString)
      val m = fs.create(marker, true)
      try m.writeUTF(tag) finally m.close()
    }
    if (!fs.exists(done)) {
      fs.mkdirs(parked)
      fs.listStatus(root)
        .filter { s =>
          val n = s.getPath.getName
          n != markerName && n != stagingName && n != parkedName && parkFilter(n)
        }
        .foreach { s =>
          require(fs.rename(s.getPath, new Path(parked, s.getPath.getName)),
            s"$opName: could not park ${s.getPath}; migration resumable")
        }
      fs.create(done, true).close()
    }
    fs.listStatus(staging)
      .filter(s => swapFilter(s.getPath.getName))
      .foreach { s =>
        require(fs.rename(s.getPath, new Path(root, s.getPath.getName)),
          s"$opName: could not move ${s.getPath} into place; migration resumable")
      }
    fs.delete(parked, true)
    fs.delete(staging, true)
    fs.delete(marker, false)
  }
}
