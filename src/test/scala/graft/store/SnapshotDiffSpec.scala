package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** SnapshotDiff: status semantics against a hand-built truth, null/
  * collision safety of the content hash, and the scale contract — on
  * co-bucketed snapshot tables the full-outer diff join plans with ZERO
  * hash exchanges (per-bucket merge of pre-sorted files). */
class SnapshotDiffSpec extends SparkSuite {
  import spark.implicits._

  private def v1 = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, null: String, 40L))
    .toDF("k", "payload", "size")
  // 1 unchanged, 2 changed, 3 removed, 4 null→value changed, 5 added
  private def v2 = Seq(
    (1L, "a", 10L), (2L, "B", 20L), (4L, "d", 40L), (5L, "e", 50L))
    .toDF("k", "payload", "size")

  test("statuses match the hand-built truth, including null content") {
    val d = SnapshotDiff.diff(v1, v2, "k", Seq("payload", "size"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("content hash is concatenation-unambiguous and null-distinct") {
    // ("ab","c") vs ("a","bc") — same raw concat, must differ hashed
    val rows = Seq(("ab", "c"), ("a", "bc"), (null: String, "abc"))
      .toDF("x", "y")
      .select(SnapshotDiff.contentHash(Seq(col("x"), col("y"))).as("h"))
      .as[String].collect()
    assert(rows.distinct.length === 3)
  }

  test("co-bucketed snapshots diff with zero hash exchanges") {
    SaltedStore.writeBucketedTable(v1, col("k"), 4, "t_snap_v1")
    SaltedStore.writeBucketedTable(v2, col("k"), 4, "t_snap_v2")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val d = SnapshotDiff.diff(
        spark.table("t_snap_v1"), spark.table("t_snap_v2"), "k",
        Seq("payload", "size"))
      val plan = d.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed snapshot diff still shuffles:\n$plan")
      // and the result still matches the unbucketed path
      val bucketed = d.select("k", "status").as[(Long, String)].collect().toMap
      val plain = SnapshotDiff.diff(v1, v2, "k", Seq("payload", "size"))
        .select("k", "status").as[(Long, String)].collect().toMap
      assert(bucketed === plain)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS t_snap_v1")
      spark.sql("DROP TABLE IF EXISTS t_snap_v2")
    }
  }
}
