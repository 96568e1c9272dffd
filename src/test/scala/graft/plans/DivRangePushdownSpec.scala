package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DivRangePushdownSpec extends SparkSuite {

  // the micros view Tables.events derives over the naive-TIMESTAMP(MICROS)
  // encoding (read as TIMESTAMP_NTZ; session zone is UTC in SparkSuite)
  private def events = spark.read.parquet(s"${sf()}/events.parquet")
    .withColumn("ts_us", expr("unix_micros(cast(ts as timestamp))"))

  test("range predicate over unix_micros(ts) derives a pushed raw-ts bound") {
    val t1 = 1704844800000000L
    val t2 = 1705708800000000L
    val df = events.filter(col("ts_us") >= t1 && col("ts_us") < t2)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("GreaterThanOrEqual(ts,"),
      s"expected pushed lower bound on raw ts in:\n$scan")
    assert(scan.contains("LessThan(ts,"),
      s"expected pushed upper bound on raw ts in:\n$scan")
  }

  test("derived bounds do not change results (incl. boundary rows)") {
    // window chosen so boundary rows exist either side at sf0.001
    val t1 = 1704844800000000L
    val t2 = 1704931200000000L
    val fast = events.filter(col("ts_us") >= t1 && col("ts_us") < t2).count()
    val slow = events.select("ts").collect().count { r =>
      val ldt = r.getAs[java.time.LocalDateTime]("ts")
      val us = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      us >= t1 && us < t2
    }
    assert(fast === slow)
  }

  test("equality and literal-on-left forms derive bounds too") {
    val df = events.filter(lit(1704844800000000L) <= col("ts_us"))
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("GreaterThanOrEqual(ts,"), s"no pushed bound in:\n$scan")

    // the micros view is a bijection: equality pushes as raw equality
    val eq = events.filter(col("ts_us") === 1704844800000123L)
    val eqScan = eq.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(eqScan.contains("EqualTo(ts,"),
      s"no pushed equality in:\n$eqScan")
  }

  test("div over the micros view composes: bounds still reach the scan") {
    // ts_us div 86400000000 = epoch day — the interval-fanout key shape
    val df = events.filter(expr("ts_us div 86400000000") >= 19733L)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("GreaterThanOrEqual(ts,"),
      s"expected composed day-bound pushdown in:\n$scan")
  }

  test("non-zero fixed-offset zones shift the derived bound with the right sign") {
    // UTC (the only zone the other tests exercise) has offset 0, which a
    // sign error in the shift would survive. A too-tight derived bound
    // DROPS rows (the derived conjunct is a real filter, not only a scan
    // hint), so a boundary-window count under both a positive and a
    // negative offset pins the sign for both comparison directions.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      Seq("UTC+02:00", "UTC-03:30").foreach { zone =>
        spark.conf.set("spark.sql.session.timeZone", zone)
        val off = java.time.ZoneOffset.of(zone.stripPrefix("UTC"))
        val ev = spark.read.parquet(s"${sf()}/events.parquet")
          .withColumn("ts_us", expr("unix_micros(cast(ts as timestamp))"))
        val offUs = off.getTotalSeconds * 1000000L
        val t1 = 1704844800000000L - offUs
        val t2 = 1704931200000000L - offUs
        val fast = ev.filter(col("ts_us") >= t1 && col("ts_us") < t2).count()
        val slow = ev.select("ts").collect().count { r =>
          val ldt = r.getAs[java.time.LocalDateTime]("ts")
          val us = ldt.toEpochSecond(off) * 1000000L + ldt.getNano / 1000L
          us >= t1 && us < t2
        }
        assert(fast === slow, s"boundary-window mismatch under $zone")
        assert(fast > 0L, s"degenerate window under $zone — test covers nothing")
        val scan = ev.filter(col("ts_us") >= t1).queryExecution.executedPlan
          .collectLeaves().map(_.toString).mkString
        assert(scan.contains("GreaterThanOrEqual(ts,"),
          s"no derived bound under fixed-offset zone $zone:\n$scan")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("a non-cast micros derivation stays un-derived rather than wrong") {
    val df = spark.read.parquet(s"${sf()}/events.parquet")
      .withColumn("ts_us",
        expr("unix_micros(to_utc_timestamp(cast(ts as timestamp), 'America/New_York'))"))
      .filter(col("ts_us") >= 1704844800000000L)
    // the zone-shifting wrapper is not the fixed-offset cast the rule
    // understands — no raw-ts bound may be invented for it
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!scan.contains("GreaterThanOrEqual(ts,"),
      s"unsound bound derived through a zone-shifting expression:\n$scan")
  }

  test("Long.MaxValue threshold does not wrap to an always-false bound") {
    import spark.implicits._
    val df = Seq(-5L, 0L, 7L, Long.MaxValue).toDF("x")
    // x div 1 <= Long.MaxValue is a tautology; a wrapped successor would
    // have added `x < Long.MinValue` and dropped every row
    val le = df.filter(expr("x div 1") <= Long.MaxValue).as[Long].collect().sorted.toList
    assert(le === List(-5L, 0L, 7L, Long.MaxValue))
    // equality at the top of the domain must keep its one matching row
    val eq = df.filter(expr("x div 1") === Long.MaxValue).as[Long].collect().toList
    assert(eq === List(Long.MaxValue))
    // strict > Long.MaxValue is empty, but via an empty derivation (None),
    // not a wrapped bound — the original predicate still decides
    val gt = df.filter(expr("x div 1") > Long.MaxValue).count()
    assert(gt === 0L)
  }

  test("negative and zero thresholds use the truncation-correct bound") {
    import spark.implicits._
    val df = Seq(-2001L, -2000L, -1999L, -1001L, -1000L, -999L, -1L, 0L, 999L, 1000L)
      .toDF("x")
    // x div 1000 >= 0 ⟺ x >= -999 under truncation toward zero
    val got = df.filter(expr("x div 1000") >= 0L).as[Long].collect().sorted.toList
    assert(got === List(-999L, -1L, 0L, 999L, 1000L))
    // x div 1000 >= -1 ⟺ x >= -1999
    val got2 = df.filter(expr("x div 1000") >= -1L).as[Long].collect().sorted.toList
    assert(got2 === List(-1999L, -1001L, -1000L, -999L, -1L, 0L, 999L, 1000L))
  }
}
