package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** StreamingIngest.anomalyFlags — the streaming twin of
  * q_anomaly_zscore: flags across micro-batch boundaries must equal the
  * sequential per-key decision (same self-excluding ring, same exact
  * integer z-test), and state stays one bounded ring per key. */
class StreamingAnomalySpec extends SparkSuite {
  import StreamingIngest._

  private val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime

  private def mkRows(n: Int): Seq[Metric] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val vi =
        if (i % 41 == 40) 5000000L + rnd.nextInt(100)  // planted spikes
        else 10000L + rnd.nextInt(1000)
      Metric(i % 3L, new Timestamp(base + i * 1000L), i.toLong, vi)
    }
  }

  /** Sequential truth: the exact arithmetic of the batch window. */
  private def expectedFlags(rows: Seq[Metric], histLen: Int = 19,
                            minN: Int = 8): Set[(Long, Long)] = {
    val out = Set.newBuilder[(Long, Long)]
    rows.groupBy(_.user_id).foreach { case (u, ms) =>
      var ring = Vector.empty[Long]
      ms.sortBy(m => (m.ts.getTime, m.event_id)).foreach { m =>
        val n = ring.length
        if (n >= minN) {
          val s = ring.map(BigInt(_)).sum
          val ss = ring.map(v => BigInt(v) * v).sum
          val dev = BigInt(n) * m.vi - s
          if (dev * dev > 9 * (BigInt(n) * ss - s * s)) out += ((u, m.event_id))
        }
        ring = (ring :+ m.vi).takeRight(histLen)
      }
    }
    out.result()
  }

  test("flags across micro-batch boundaries equal the sequential truth") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = mkRows(300)
    val mem = MemoryStream[Metric]
    val q = anomalyFlags(mem.toDS(), "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("anom").start()
    // three uneven batches — boundaries must not change any decision
    mem.addData(rows.take(100)); q.processAllAvailable()
    mem.addData(rows.slice(100, 130)); q.processAllAvailable()
    mem.addData(rows.drop(130)); q.processAllAvailable()
    q.stop()
    val got = spark.table("anom").select("user_id", "event_id")
      .as[(Long, Long)].collect().toSet
    val exp = expectedFlags(rows)
    assert(exp.nonEmpty, "test corpus planted no anomalies")
    assert(got === exp)
  }

  test("opt-in idleEvict drops an idle key's ring; reappearance cold-starts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // key 1: 12 constant rows, then 2h of event-time silence (advanced by
    // key 2's rows), then a spike. With idleEvict=1h the ring is evicted,
    // so the spike lands on an EMPTY ring (n=0 < minN) and must NOT flag
    // — the documented divergence from the batch twin, pinned here.
    val head = (0 until 12).map(i =>
      Metric(1L, new Timestamp(base + i * 1000L), i.toLong, 100L))
    val mover = (0 until 12).map(i =>                // watermark advancer
      Metric(2L, new Timestamp(base + i * 900000L), 100L + i, 100L))
    val spike = Metric(1L, new Timestamp(base + 9900000L), 999L, 5000000L)
    // the expired timer fires on a trigger where key 1 has NO data —
    // a key with data in the same trigger is processed as data instead
    val tick = Metric(2L, new Timestamp(base + 9850000L), 200L, 100L)
    val mem = MemoryStream[Metric]
    val q = anomalyFlags(mem.toDS(), "1 minute", idleEvict = Some("1 hour"))
      .writeStream.outputMode("append").format("memory")
      .queryName("anomEv").start()
    mem.addData(head); q.processAllAvailable()
    mem.addData(mover); q.processAllAvailable()      // watermark → ~base+2.7h
    mem.addData(Seq(tick)); q.processAllAvailable()  // key-1 timer fires here
    mem.addData(Seq(spike)); q.processAllAvailable()
    q.stop()
    val got = spark.table("anomEv").select("event_id").as[Long].collect().toSet
    assert(!got.contains(999L),
      "evicted key's spike flagged — ring survived eviction")
    // same stream WITHOUT eviction (default None): full parity — flags
    val mem2 = MemoryStream[Metric]
    val q2 = anomalyFlags(mem2.toDS(), "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("anomNoEv").start()
    mem2.addData(head); q2.processAllAvailable()
    mem2.addData(mover); q2.processAllAvailable()
    mem2.addData(Seq(tick)); q2.processAllAvailable()
    mem2.addData(Seq(spike)); q2.processAllAvailable()
    q2.stop()
    val got2 = spark.table("anomNoEv").select("event_id").as[Long].collect().toSet
    assert(got2.contains(999L),
      "default (no eviction) must keep history and flag the spike")
  }

  test("constant history flags any deviation (sigma = 0)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 12).map(i =>
      Metric(1L, new Timestamp(base + i * 1000L), i.toLong,
        if (i == 11) 101L else 100L))
    val mem = MemoryStream[Metric]
    val q = anomalyFlags(mem.toDS(), "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("anom0").start()
    mem.addData(rows); q.processAllAvailable(); q.stop()
    val got = spark.table("anom0").select("event_id").as[Long].collect().toSet
    assert(got === Set(11L))
  }
}
