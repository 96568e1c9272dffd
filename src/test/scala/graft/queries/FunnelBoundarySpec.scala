package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The time-bounded funnel's window edge: the boundary is CLOSED — a
  * step completed at exactly t_prev + W converts; one microsecond past
  * does not — and a step-3 overshoot must not erase the step-2 count.
  * Pins the exact semantics q_funnel_windowed's oracle encodes, on a
  * corpus built to straddle the edge. */
class FunnelBoundarySpec extends SparkSuite {
  import spark.implicits._

  private val W = AnalyticQueries.FunnelMaxGapUs

  private def report(rows: Seq[(Long, String, Long)]) =
    AnalyticQueries
      .funnelReport(rows.toDF("user_id", "event_type", "ts_us"),
        maxGapUs = Some(W))
      .select("step", "n_users").as[(Long, Long)].collect().toMap

  test("conversion at exactly t_prev + W counts; +1us does not") {
    val t0 = 1000000L
    val got = report(Seq(
      // user 1: click at exactly t1+W, purchase at exactly t2+W → 3/3
      (1L, "view", t0), (1L, "click", t0 + W), (1L, "purchase", t0 + 2 * W),
      // user 2: click one microsecond past the window → stops at step 1
      (2L, "view", t0), (2L, "click", t0 + W + 1), (2L, "purchase", t0 + W + 2),
      // user 3: in-window click, purchase past ITS window → stops at 2
      (3L, "view", t0), (3L, "click", t0 + 1), (3L, "purchase", t0 + 1 + W + 1)))
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("window anchors at the EARLIEST view (greedy), not a later one") {
    val t0 = 1000000L
    // a second view inside the window does NOT re-anchor: the click is
    // within W of view#2 but past W of view#1 → no conversion (greedy
    // earliest-completion, the same semantics the unbounded funnel has)
    val got = report(Seq(
      (1L, "view", t0), (1L, "view", t0 + W), (1L, "click", t0 + W + 5)))
    assert(got === Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  test("unbounded report equals windowed with an infinite window") {
    val e = events(spark, sf("sf0.001"))
    val a = AnalyticQueries.funnelReport(e, None)
      .select("step", "n_users", "conv_ppm").as[(Long, Long, Long)].collect().toSeq
    val b = AnalyticQueries.funnelReport(e, Some(Long.MaxValue / 2))
      .select("step", "n_users", "conv_ppm").as[(Long, Long, Long)].collect().toSeq
    assert(a === b)
  }

  private def events(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts_us"))
}
