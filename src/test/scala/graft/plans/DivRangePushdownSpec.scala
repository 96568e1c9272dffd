package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DivRangePushdownSpec extends SparkSuite {

  private def events = spark.read.parquet(s"${sf()}/events.parquet")
    .withColumn("ts_us", expr("ts div 1000"))

  test("range predicate over ts div 1000 derives a pushed raw-ts bound") {
    val t1 = 1704844800000000L
    val t2 = 1705708800000000L
    val df = events.filter(col("ts_us") >= t1 && col("ts_us") < t2)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains(s"GreaterThanOrEqual(ts,${t1 * 1000}"),
      s"expected pushed lower bound on raw ts in:\n$scan")
    assert(scan.contains(s"LessThan(ts,${t2 * 1000}"),
      s"expected pushed upper bound on raw ts in:\n$scan")
  }

  test("derived bounds do not change results (incl. boundary rows)") {
    // window chosen so boundary rows exist either side at sf0.001
    val t1 = 1704844800000000L
    val t2 = 1704931200000000L
    val fast = events.filter(col("ts_us") >= t1 && col("ts_us") < t2).count()
    val slow = events.collect().count { r =>
      val us = r.getAs[Long]("ts") / 1000
      us >= t1 && us < t2
    }
    assert(fast === slow)
  }

  test("equality and literal-on-left forms derive bounds too") {
    val df = events.filter(lit(1704844800000000L) <= col("ts_us"))
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("GreaterThanOrEqual(ts,"), s"no pushed bound in:\n$scan")

    val eq = events.filter(col("ts_us") === 1704844800000123L)
    val eqScan = eq.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(eqScan.contains("GreaterThanOrEqual(ts,") && eqScan.contains("LessThan(ts,"),
      s"no pushed equality window in:\n$eqScan")
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
