package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** StreamingIngest.funnelConversions — the streaming twin of q_funnel:
  * conversions across micro-batch boundaries must equal the BATCH
  * formula (t1 = min step-1 ts; t2 = min step-2 ts > t1; t3 = min
  * step-3 ts > t2), strict ordering enforced, one conversion per
  * user. */
class StreamingFunnelSpec extends SparkSuite {
  import StreamingIngest._

  private val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime

  private def mkEvents(n: Int): Seq[StepEvent] = {
    val rnd = new scala.util.Random(11)
    (0 until n).map { i =>
      StepEvent(i % 7L, new Timestamp(base + i * 1000L), 1 + rnd.nextInt(3))
    }
  }

  /** The batch formula, computed directly. */
  private def expected(rows: Seq[StepEvent]): Set[(Long, Long, Long, Long)] = {
    val out = Set.newBuilder[(Long, Long, Long, Long)]
    rows.groupBy(_.user_id).foreach { case (u, es) =>
      val t1 = es.filter(_.step == 1).map(_.ts.getTime).minOption
      val t2 = t1.flatMap(a =>
        es.filter(e => e.step == 2 && e.ts.getTime > a).map(_.ts.getTime).minOption)
      val t3 = t2.flatMap(b =>
        es.filter(e => e.step == 3 && e.ts.getTime > b).map(_.ts.getTime).minOption)
      (t1, t2, t3) match {
        case (Some(a), Some(b), Some(c)) => out += ((u, a, b, c))
        case _ => ()
      }
    }
    out.result()
  }

  test("conversions across micro-batch boundaries equal the batch formula") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = mkEvents(400)
    val mem = MemoryStream[StepEvent]
    val q = funnelConversions(mem.toDS(), "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel").start()
    mem.addData(rows.take(150)); q.processAllAvailable()
    mem.addData(rows.slice(150, 180)); q.processAllAvailable()
    mem.addData(rows.drop(180)); q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel")
      .select("user_id", "t1_ms", "t2_ms", "t3_ms")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = expected(rows)
    assert(want.nonEmpty, "generator must produce at least one conversion")
    assert(got === want)
  }

  test("windowed funnel: closed boundary converts at exactly t_prev + W, fails past it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val W = 1000L
    val t = (ms: Long) => new Timestamp(base + ms)
    val rows = Seq(
      // user 1: click at EXACTLY t1+W, purchase at exactly t2+W → converts
      StepEvent(1L, t(0), 1), StepEvent(1L, t(W), 2), StepEvent(1L, t(2 * W), 3),
      // user 2: click one ms past the window → never advances (a later
      // in-window click cannot exist: every later click is further out)
      StepEvent(2L, t(0), 1), StepEvent(2L, t(W + 1), 2), StepEvent(2L, t(W + 2), 3),
      // user 3: step 2 in-window, step 3 one ms past ITS window → 2 of 3
      StepEvent(3L, t(0), 1), StepEvent(3L, t(1), 2), StepEvent(3L, t(1 + W + 1), 3))
    val mem = MemoryStream[StepEvent]
    val q = funnelConversions(mem.toDS(), "10 minutes", maxGapMs = Some(W))
      .writeStream.outputMode("append").format("memory")
      .queryName("funnelW").start()
    // boundary user split ACROSS batches: the straddle must not depend
    // on both events arriving together
    mem.addData(rows.take(4)); q.processAllAvailable()
    mem.addData(rows.drop(4)); q.processAllAvailable()
    q.stop()
    val got = spark.table("funnelW")
      .select("user_id", "t1_ms", "t2_ms", "t3_ms")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, base, base + W, base + 2 * W)))
  }

  test("strict ordering: equal-time steps do not chain; one conversion per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = (ms: Long) => new Timestamp(base + ms)
    val rows = Seq(
      // user 1: click at the SAME ms as view — must NOT count; later
      // click + purchase completes
      StepEvent(1L, t(0), 1), StepEvent(1L, t(0), 2),
      StepEvent(1L, t(5), 2), StepEvent(1L, t(9), 3),
      // user 1 converts once: a second full pass is ignored
      StepEvent(1L, t(20), 1), StepEvent(1L, t(21), 2), StepEvent(1L, t(22), 3),
      // user 2: purchase before any click — never converts
      StepEvent(2L, t(0), 1), StepEvent(2L, t(3), 3), StepEvent(2L, t(6), 2))
    val mem = MemoryStream[StepEvent]
    val q = funnelConversions(mem.toDS(), "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel2").start()
    mem.addData(rows); q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel2")
      .select("user_id", "t1_ms", "t2_ms", "t3_ms")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, base, base + 5, base + 9)))
  }
}
