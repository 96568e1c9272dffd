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
  *     into the root; cleanup deletes the marker FIRST. Once the swap
  *     loop completes the root IS the new generation, so the marker —
  *     whose only job is to route a resume into PARK/SWAP — must die
  *     before the parked dir does: a marker that outlives
  *     `parked/_DONE` would route a resume back into PARK, which would
  *     park (and then destroy) the freshly swapped-in generation. The
  *     leftover parked/staging dirs are dot-dirs invisible to readers;
  *     a crash between the three deletes leaves only debris that the
  *     next fresh invocation clears pre-stage.
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
      fs.mkdirs(staging) // guarantee the dir even for an empty stage
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
    // A standing marker guarantees staging exists (staging is deleted only
    // AFTER the marker). If it is somehow gone, refuse to proceed: the old
    // generation sits in `parked` and cleanup would destroy the only copy.
    require(fs.exists(staging),
      s"$opName: marker standing but staging dir missing — refusing cleanup; " +
        s"parked old generation preserved for manual inspection")
    fs.listStatus(staging)
      .filter(s => swapFilter(s.getPath.getName))
      .foreach { s =>
        require(fs.rename(s.getPath, new Path(root, s.getPath.getName)),
          s"$opName: could not move ${s.getPath} into place; migration resumable")
      }
    // Marker FIRST: the root is self-consistent now, and the marker must
    // never outlive `parked/_DONE` (see phase 3 contract above).
    fs.delete(marker, false)
    fs.delete(parked, true)
    fs.delete(staging, true)
  }
}
