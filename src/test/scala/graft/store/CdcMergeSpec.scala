package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

class CdcMergeSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def base = Seq(
    (1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L), (4L, "four", 40L)
  ).toDF("k", "v", "n")

  test("applies insert, update and delete in one pass") {
    val changes = Seq(
      (2L, "TWO", 21L, "U"),
      (3L, "x", 0L, "D"),
      (9L, "nine", 90L, "I")
    ).toDF("k", "v", "n", "op")
    val got = CdcMerge(base, changes, "k")
      .orderBy("k").as[(Long, String, Long)].collect().toList
    assert(got === List(
      (1L, "one", 10L), (2L, "TWO", 21L), (4L, "four", 40L), (9L, "nine", 90L)))
  }

  test("seqCol compacts a multi-change log last-writer-wins") {
    val log = Seq(
      (2L, "first", 1L, "U", 1L),
      (2L, "second", 2L, "U", 2L),
      (4L, "gone?", 0L, "D", 1L),
      (4L, "back", 44L, "I", 2L), // re-insert after delete: I wins
      (1L, "x", 0L, "D", 5L)
    ).toDF("k", "v", "n", "op", "seq")
    val got = CdcMerge(base, log, "k", seqCol = Some("seq"))
      .orderBy("k").as[(Long, String, Long)].collect().toList
    assert(got === List(
      (2L, "second", 2L), (3L, "three", 30L), (4L, "back", 44L)))
  }

  test("broadcastChanges=false leaves the join unhinted, result unchanged") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // turn off size-based broadcast too, so the unhinted plan is visibly
    // a non-broadcast join (AQE may still upgrade it; assert values only
    // after checking the INITIAL plan carries no hint-forced broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val changes = Seq((2L, "TWO", 21L, "U"), (3L, "x", 0L, "D"))
        .toDF("k", "v", "n", "op")
      val merged = CdcMerge(base, changes, "k", broadcastChanges = false)
      val init = merged.queryExecution.sparkPlan.toString
      assert(!init.contains("BroadcastHashJoin"),
        s"unhinted merge with threshold off must not plan broadcast:\n$init")
      val got = merged.orderBy("k").as[(Long, String, Long)].collect().toList
      assert(got === List((1L, "one", 10L), (2L, "TWO", 21L), (4L, "four", 40L)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("plan: broadcast anti-join, base side never shuffles") {
    val changes = Seq((2L, "TWO", 21L, "U")).toDF("k", "v", "n", "op")
    val merged = CdcMerge(base, changes, "k")
    val plan = merged.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case b: BroadcastHashJoinExec => b
    }.nonEmpty, s"expected broadcast anti-join:\n$plan")
    assert(collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e
    }.isEmpty, s"merge must not shuffle the base:\n$plan")
  }
}
