package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Snapshot (dataset-release) diff: classify every key across two
  * versions of a keyed table as `added` / `removed` / `changed` /
  * `unchanged` — the audit a corpus release pipeline runs before
  * publishing ("what moved between v1 and v2, and does the delta match
  * the changelog?"). Nothing like this exists in the reference (its
  * surface is scan/put over one live table); this is the north-star
  * lifecycle extension over the same salted-store layouts.
  *
  * Shape: each side reduces to (key, content-hash) — a NARROW projection
  * (the content columns are hashed, never carried) — then ONE full outer
  * equi-join on the key decides the status per key. At 100 TB the join
  * is the whole cost, and it disappears when both snapshots live in the
  * salted store's bucketed-table layout ([[SaltedStore.writeBucketedTable]],
  * same key, same bucket count): Catalyst sees both sides pre-hashed and
  * pre-sorted and plans a per-bucket merge with NO exchange — the diff
  * of two 100 TB releases streams bucket-by-bucket (spec-pinned:
  * `SnapshotDiffSpec` asserts zero hash exchanges on bucketed inputs).
  * Unbucketed inputs degrade declaratively to one shuffle per side.
  *
  * The content hash is null-safe and unambiguous: each column is
  * length-prefixed before concatenation (so ("ab","c") never collides
  * with ("a","bc")) and NULL is encoded distinctly from any value.
  */
object SnapshotDiff {
  /** md5 over a length-prefixed, null-marked encoding of `cols` —
    * deterministic, collision-safe concatenation. */
  def contentHash(cols: Seq[Column]): Column =
    md5(concat(cols.map(c =>
      when(c.isNull, lit("<null>"))
        .otherwise(concat(length(c.cast("string")).cast("string"), lit(":"),
          c.cast("string")))): _*))

  /** Per-key diff: one row per key present in either version, with
    * `status` ∈ added (v2 only) / removed (v1 only) / changed (both,
    * different content) / unchanged, plus the surviving side's content
    * hash. `carry` columns (e.g. a stratum column for the census) are
    * taken from v2 when present, else v1. */
  def diff(v1: DataFrame, v2: DataFrame, key: String,
           contentCols: Seq[String], carry: Seq[String] = Nil): DataFrame = {
    def side(df: DataFrame, tag: String) =
      df.select(
        (col(key).as(s"${tag}_k") +:
          contentHash(contentCols.map(col)).as(s"${tag}_h") +:
          carry.map(c => col(c).as(s"${tag}_$c"))): _*)
    val l = side(v1, "l")
    val r = side(v2, "r")
    l.join(r, l("l_k") === r("r_k"), "full_outer")
      .select(
        (coalesce(col("l_k"), col("r_k")).as(key) +:
          when(col("l_k").isNull, "added")
            .when(col("r_k").isNull, "removed")
            .when(col("l_h") =!= col("r_h"), "changed")
            .otherwise("unchanged").as("status") +:
          coalesce(col("r_h"), col("l_h")).as("content_hash") +:
          carry.map(c => coalesce(col(s"r_$c"), col(s"l_$c")).as(c))): _*)
  }
}
