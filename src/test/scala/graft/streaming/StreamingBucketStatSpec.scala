package graft.streaming

import graft.SparkSuite

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

/** The dedup-at-ingest writer's per-batch index-bucket stats line —
  * the observability the r18 round added to the streaming path, pinned
  * so it can't silently rot: a PLANTED hot bucket in the index must
  * surface in the writer's own log with its exact pre-cap member
  * count, and the line body must carry metrics (never blank — the
  * writer renders through `Dedup.renderBucketStat`, whose empty-map
  * branch is a loud METRICS UNAVAILABLE anomaly, see ObservationSpec).
  *
  * Plant: `tau = 1.1` disables every drop (Jaccard ≤ 1 can never reach
  * it), so a bootstrap batch of IDENTICAL docs all survive into the
  * index — identical text → identical shingle set → identical minhash
  * signature → ONE (band, sig) bucket per band holding all of them.
  * A second batch probing with the same text hits those buckets, so
  * the probe's bucket aggregation must report `max_bucket` = the
  * planted count exactly, `n_capped` = 0 (planted count < MaxBucket). */
class StreamingBucketStatSpec extends SparkSuite {
  import StreamingIngest._

  /** Run `body` with System.err teed into a buffer (the writer prints
    * its stats line via System.err at call time; forwarding keeps the
    * suite's normal logging visible). */
  private def captureErr(body: => Unit): String = {
    val buf = new ByteArrayOutputStream()
    val orig = System.err
    val tee = new PrintStream(new java.io.OutputStream {
      override def write(b: Int): Unit = { buf.write(b); orig.write(b) }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        buf.write(b, off, len); orig.write(b, off, len)
      }
    }, true)
    System.setErr(tee)
    try body finally { System.setErr(orig); tee.flush() }
    buf.toString("UTF-8")
  }

  test("dedup-at-ingest writer logs the planted hot bucket's exact pre-cap size per batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("band_bucketstat").toString + "/idx"
    val hotText =
      "omega shared corpus tokens alpha bravo charlie delta echo foxtrot"
    def uniq(i: Long) = s"solitary document number$i with tokens nobody$i shares"
    // bootstrap batch: 6 identical docs (the planted hot bucket) + 3
    // unique docs; tau = 1.1 → nothing is dropped, all 9 are indexed
    val b1 = ((0L until 6L).map(i => (i, hotText)) ++
      (100L until 103L).map(i => (i, uniq(i)))).toDF("doc_id", "text")
    assert(dedupBandBatchIdempotent(b1, batchId = 0L, dir, tau = 1.1)
      .map(_.size) === Some(9))

    // probe batch: one doc with the hot text (hits every hot bucket —
    // non-empty pair tail, so AQE cannot prune the observed stage) +
    // one fresh doc
    val b2 = Seq((600L, hotText), (601L, uniq(999L))).toDF("doc_id", "text")
    val err = captureErr {
      assert(dedupBandBatchIdempotent(b2, batchId = 1L, dir, tau = 1.1)
        .map(_.size) === Some(2))
    }

    val line = err.linesIterator
      .find(_.contains("dedupBandIngestWriter batch 1 index-bucket stats:"))
      .getOrElse(fail(s"writer printed no bucket-stats line; stderr was:\n$err"))
    assert(!line.contains("METRICS UNAVAILABLE"), line)
    def metric(name: String): Long = {
      val m = s"$name=(\\d+)".r.findFirstMatchIn(line)
        .getOrElse(fail(s"no $name=<n> in: $line"))
      m.group(1).toLong
    }
    // the planted bucket: 6 identical docs, counted PRE-cap
    assert(metric("max_bucket") === 6L)
    // 6 < MaxBucket (512): the cap truncated nothing
    assert(metric("n_capped") === 0L)
    // at least the hot bucket itself was aggregated
    assert(metric("n_buckets") >= 1L)
  }

  test("replayed batch skips the probe — no stats line for a replay") {
    import spark.implicits._
    val dir = Files.createTempDirectory("band_bucketstat_replay").toString + "/idx"
    val b1 = (0L until 4L).map(i => (i, s"text body $i unique$i")).toDF("doc_id", "text")
    assert(dedupBandBatchIdempotent(b1, batchId = 0L, dir).isDefined)
    val b2 = Seq((10L, "fresh doc ten")).toDF("doc_id", "text")
    assert(dedupBandBatchIdempotent(b2, batchId = 1L, dir).isDefined)
    // replay of batch 1: the idempotent commit log skips it BEFORE the
    // probe, so no new stats line may appear
    val err = captureErr {
      assert(dedupBandBatchIdempotent(b1, batchId = 0L, dir).isEmpty)
    }
    assert(!err.contains("index-bucket stats"),
      s"a replayed batch must not re-probe; stderr was:\n$err")
  }
}
