package graft.streaming

import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** One exploded (doc, band) row on its way into the LSH state store —
  * top-level so the encoder's generated code can construct it. */
case class BandHit(doc_id: Long, ts: Timestamp, sig: String)

/** First-seen owner of one LSH band bucket (the streaming state). */
case class BandOwner(doc_id: Long, tsMs: Long)

/** A detected near-duplicate: `doc_id` shares a band bucket with the
  * earlier-seen `dup_of`. */
case class DupMark(doc_id: Long, dup_of: Long, sig: String)

/** [EXT] Streaming fuzzy (MinHash-LSH) dedup — the continuous twin of the
  * batch `graft.pipeline.Dedup` LSH pipeline. Batch LSH banding is a
  * shuffle-and-compare over the whole corpus; on an unbounded stream the
  * same contract becomes "flag any document whose band bucket was already
  * claimed within the watermark horizon", which is exactly a keyed state
  * lookup: group by band signature, keep the first-seen claimant, emit a
  * mark for every later arrival.
  *
  * Scale: state is one (sig → owner) entry per DISTINCT band signature
  * seen within the watermark, evicted by event-time timeout — bounded
  * regardless of stream length, the only dedup contract that can hold on
  * an unbounded stream (same argument as
  * [[StreamingIngest.dedupWithinWatermark]] for the exact case). The
  * signature computation is a narrow per-row projection (a micro-batch
  * document is one row, so the MinHash runs as array HOFs over its
  * shingles — no explode/groupBy pass like the batch sketch needs), and
  * the lone exchange per micro-batch is the groupByKey on the band
  * signature — the same ONE-shuffle shape as the batch LSH bucket join.
  *
  * Signatures reuse the batch constants (Dedup.PermA/PermB/P, band
  * geometry), so a document's band signatures are identical in the batch
  * and streaming paths — a doc flagged here is guaranteed to be a batch
  * candidate pair member.
  */
object StreamingDedup {

  /** Per-row MinHash band signatures as an array column: shingle the text
    * (HOF — interpreted, but over one row's array, not a corpus), base-
    * hash each shingle, take the K affine minima, md5 the R-tuples. Docs
    * with <3 tokens get no shingles and claim no buckets (empty array). */
  def bandSigs(text: Column): Column = {
    val sh = TextAnalysis.shingles3(TextAnalysis.tokens(text))
    val xs = transform(sh, s => Dedup.baseHash32(s))
    val mins = (0 until Dedup.K).map(p =>
      array_min(transform(xs, x => (x * Dedup.PermA(p) + Dedup.PermB(p)) % Dedup.P)))
    val sigs = (0 until Dedup.Bands).map(b =>
      md5(concat_ws("|", (0 until Dedup.Rows).map(r =>
        mins(b * Dedup.Rows + r).cast("string")): _*)))
    when(size(sh) > 0, array(sigs: _*)).otherwise(array().cast("array<string>"))
  }

  /** docs(doc_id, text, `tsCol`) stream → DupMark stream. A mark is
    * emitted the first time a doc collides with an already-claimed band
    * bucket (at most one mark per (doc, band); downstream consumers
    * dedupe to per-doc drops with a distinct or any-semantics join).
    * `horizonMs` bounds both late data (as the watermark delay) and a
    * bucket claim's lifetime — it is a Long, not an interval string,
    * because the state function needs the same number for its expiry
    * arithmetic. */
  def lshDedupMarks(docs: DataFrame, tsCol: String,
                    horizonMs: Long): Dataset[DupMark] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark(tsCol, s"$horizonMs milliseconds")
      .select(col("doc_id"), col(tsCol).as("ts"),
        explode(bandSigs(col("text"))).as("sig"))
      .as[BandHit]
      .groupByKey(_.sig)
      .flatMapGroupsWithState[BandOwner, DupMark](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (sig: String, rows: Iterator[BandHit], state: GroupState[BandOwner]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            // a claim whose horizon the watermark has already passed is
            // expired even if its timeout callback hasn't fired yet (new
            // data for the group arrives in the same batch that advanced
            // the watermark): honoring it would both mark docs against a
            // dead claim AND re-arm a timeout in the past, which the
            // state API rejects — killing the whole query
            var owner = state.getOption.filter(o => o.tsMs + horizonMs > wm)
            // arrival order within a micro-batch is not a time order —
            // process the group's rows in (event time, doc_id) order so
            // "first seen" is well-defined and replay-stable
            val sorted = rows.toArray.sortBy(h => (h.ts.getTime, h.doc_id))
            val marks = Iterator.unfold(0) { i =>
              if (i >= sorted.length) None
              else {
                val h = sorted(i)
                owner match {
                  case None =>
                    owner = Some(BandOwner(h.doc_id, h.ts.getTime))
                    Some((None, i + 1))
                  case Some(o) if o.doc_id == h.doc_id => Some((None, i + 1))
                  case Some(o) => Some((Some(DupMark(h.doc_id, o.doc_id, sig)), i + 1))
                }
              }
            }.flatten.toList
            owner match {
              case Some(o) =>
                state.update(o)
                // evict once the watermark passes the claim's horizon;
                // clamp above the current watermark (setTimeoutTimestamp
                // rejects timestamps at or before it)
                state.setTimeoutTimestamp(math.max(o.tsMs + horizonMs, wm + 1))
              case None => state.remove()
            }
            marks.iterator
          }
      }
  }
}
