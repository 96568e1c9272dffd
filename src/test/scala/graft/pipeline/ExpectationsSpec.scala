package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Expectations: report rows against a hand-built truth (planted nulls,
  * duplicates, dangling refs), null-predicate counting, and the plan
  * shapes — broadcast anti for referential integrity. */
class ExpectationsSpec extends SparkSuite {
  import spark.implicits._
  import Expectations._

  private def fact = Seq(
    (1L, Some(10L), "A", 5.0),
    (2L, Some(20L), "B", -1.0),     // range violation
    (3L, None, "A", 2.0),           // null custref
    (3L, Some(99L), "C", 3.0),      // dup id, dangling ref, bad status
    (4L, Some(10L), "A", 100.0)
  ).toDF("id", "custref", "status", "amount")
  private def dim = Seq(10L, 20L).toDF("k")

  test("report matches the hand-built truth per rule class") {
    val r = report(fact, Seq(
      NotNull("custref_not_null", "custref"),
      Expect("amount_nonneg", col("amount") >= 0),
      Expect("status_accepted", col("status").isin("A", "B")),
      Unique("id_unique", "id"),
      RefIntegrity("custref_ref", "custref", dim, "k")))
      .select("rule", "n_rows", "n_violations", "pass")
      .as[(String, Long, Long, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("custref_not_null") === ((5L, 1L, false)))
    assert(r("amount_nonneg") === ((5L, 1L, false)))
    assert(r("status_accepted") === ((5L, 1L, false)))
    // unique counts non-null keys; one duplicated id
    assert(r("id_unique") === ((5L, 1L, false)))
    // null custref is NOT a ref violation (SQL FK semantics)
    assert(r("custref_ref") === ((5L, 1L, false)))
  }

  test("null predicate results count as violations, all-pass report") {
    val df = Seq((1L, Some(2.0)), (2L, None)).toDF("id", "x")
    val r = report(df, Seq(
      Expect("x_pos_or_null_fails", col("x") > 0),
      Unique("id_unique", "id")))
      .select("rule", "n_violations").as[(String, Long)].collect().toMap
    // NULL > 0 is NULL → violation (expectations are must-be-TRUE)
    assert(r("x_pos_or_null_fails") === 1L)
    assert(r("id_unique") === 0L)
  }

  test("referential check plans as a broadcast anti join") {
    val r = report(fact, Seq(RefIntegrity("ref", "custref", dim, "k")))
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"ref dim not broadcast:\n$plan")
  }
}
