package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Keyed changeset application (MERGE / CDC apply) over a base
  * table — the batch analog of the reference's write path: where the
  * reference salts each individual Put (README:40-47), a lakehouse
  * ingests a CHANGE LOG (op ∈ I/U/D per key) and folds it into the
  * stored table. No analog exists in the reference (HBase overwrites
  * by key natively); this is the missing piece between the salted
  * store's full-rewrite `write` and the temporal SCD2 view.
  *
  * Plan shape — the part that matters at 100 TB: the changeset is
  * orders of magnitude smaller than the base (a day of CDC vs years
  * of table), so the merge is ONE broadcast anti-join on the base
  * (which therefore never shuffles: a narrow scan-and-filter over
  * every base partition) plus a union with the surviving change rows.
  * The broadcast is an explicit hint — Spark honors it regardless of
  * size estimates, which is the right default for the changes-≪-base
  * contract (a size-estimated plan that guessed wrong would shuffle
  * the WHOLE base). For the pathological backfill whose changeset
  * genuinely cannot broadcast, pass `broadcastChanges = false`: the
  * join is left unhinted and Catalyst plans it like any other join
  * (same declarative result). Compaction of multi-change-per-key logs
  * costs one window over the CHANGESET only (per-key, gate-governed
  * like every per-key window in this engine).
  */
object CdcMerge {

  /** Fold `changes` into `base`.
    *
    * Contract: `changes` has every `base` column plus `opCol` with
    * values `I` (insert), `U` (update = full-row upsert) or `D`
    * (delete). With `seqCol` unset the changeset must hold at most
    * one row per key (a compacted log); set `seqCol` to a
    * monotonically increasing change-sequence column to apply
    * last-writer-wins compaction here.
    */
  def apply(base: DataFrame, changes: DataFrame, key: String,
            opCol: String = "op", seqCol: Option[String] = None,
            broadcastChanges: Boolean = true): DataFrame = {
    val compacted = seqCol match {
      case Some(sc) =>
        val w = Window.partitionBy(key).orderBy(col(sc).desc)
        changes.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", sc)
      case None => changes
    }
    val touched = compacted.select(key)
    val touchedSide = if (broadcastChanges) broadcast(touched) else touched
    val survivors = base.join(touchedSide, Seq(key), "left_anti")
    val upserts = compacted.filter(col(opCol) =!= "D").drop(opCol)
    survivors.unionByName(upserts)
  }
}
