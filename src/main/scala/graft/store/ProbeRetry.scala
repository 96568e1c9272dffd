package graft.store

import org.apache.spark.sql.DataFrame

/** Retry-once-with-fresh-manifest for the index probe entry points
  * (gram / band / text) — the read-side completion of the probe-atomic
  * maintenance story.
  *
  * [[DeltaSegments]] makes the delta FOLD probe-atomic: a probe frame
  * constructed before the fold reads exactly the old state whenever it
  * executes. The one remaining maintenance op that can invalidate a
  * constructed probe is the MAJOR compaction half (tombstone fold /
  * small-file coalescing through `SaltedStore.compact`'s per-shard
  * swap), which MOVES base files — a probe constructed before it and
  * executed after dies on its pinned paths with a task-level
  * FileNotFoundException. Loud and never wrong, but the unfriendliest
  * possible loud: the store's manifest was rewritten at rest, so a
  * SECOND construction sees the new generation and succeeds.
  *
  * [[retryOnce]] packages exactly that: run the action on a freshly
  * constructed probe; if execution dies on a (possibly deeply nested)
  * FileNotFoundException, reconstruct ONCE — base file set AND delta
  * segment listing together, so the two sides can never mix
  * generations — and re-run; a second failure surfaces. Zero
  * steady-state cost: the happy path adds nothing to the plan, and the
  * probe builders are cheap (one manifest read).
  *
  * Hold the CONSTRUCTION (the `mk` thunk), not a probe frame: a frame
  * that already executed pins its resolved file set for its lifetime,
  * and only a reconstruction can pick up a new generation. */
object ProbeRetry {
  /** Whether `e`'s cause chain carries a FileNotFoundException — the
    * signature of a probe whose pinned file set a MAJOR compact moved.
    * Spark wraps task failures in SparkException layers; walk the chain
    * and also match the classname in messages (executor-side failures
    * sometimes arrive stringified). */
  def isStaleFileError(e: Throwable): Boolean = {
    var c: Throwable = e
    var hops = 0
    while (c != null && hops < 16) {
      if (c.isInstanceOf[java.io.FileNotFoundException]) return true
      if (c.getMessage != null &&
        (c.getMessage.contains("FileNotFoundException") ||
          c.getMessage.contains("FAILED_READ_FILE.FILE_NOT_EXIST"))) return true
      c = if (c.getCause eq c) null else c.getCause
      hops += 1
    }
    false
  }

  /** Run `run` on a freshly constructed probe; on a stale-file failure
    * reconstruct once against the rewritten manifests and re-run. */
  def retryOnce[T](mk: => DataFrame)(run: DataFrame => T): T =
    try run(mk) catch {
      case e: Throwable if isStaleFileError(e) =>
        System.err.println("[graft] probe file set went stale " +
          "mid-execution (a MAJOR compact moved base files after the " +
          "probe was constructed) — reconstructing once against the " +
          "rewritten manifest")
        run(mk)
    }
}
