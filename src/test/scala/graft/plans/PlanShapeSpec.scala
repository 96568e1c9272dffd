package graft.plans

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan shape guard over the WHOLE query surface: the scale
  * claims in PLANS.md hold only if no query silently plans a nested-loop
  * join or cartesian product. The only allowed sites are the kNN queries
  * that deliberately broadcast a tiny query set against a linear corpus
  * scan (brute / top-k UDAF / SQ8 / PQ-ADC) — for those, the guard
  * asserts the broadcast side really is the BUILD side (a broadcast
  * nested loop, never a shuffle cartesian). */
class PlanShapeSpec extends SparkSuite {

  /** Queries whose plan intentionally contains a broadcast nested loop:
    * the small-query-side kNN scans. Everything else must be free of
    * nested loops AND cartesian products. */
  private val intentionalKnnScans = Set(
    "q_knn_cosine_brute", "q_knn_topk_agg", "q_knn_cosine_sq8", "q_knn_cosine_pq",
    // recall joins every approximate method against the brute-force
    // ground truth, so its plan contains brute's broadcast scan
    "q_knn_recall",
    // truncation recall runs the brute pattern twice (full + 16-dim)
    "q_knn_truncated",
    // hard-negative mining is the brute pattern with a label filter
    "q_hard_negatives",
    // its recall report joins the INDEXED miner (hash equi-join probe,
    // no nested loop of its own) against that brute ground truth, so
    // the brute broadcast scan appears inside the comparison plan
    "q_hard_negatives_recall")

  test("no BroadcastNestedLoopJoin or CartesianProduct outside the intentional kNN scans") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf()).queryExecution.explainString(FormattedMode)
      val nested = plan.contains("BroadcastNestedLoopJoin")
      val cartesian = plan.contains("CartesianProduct")
      if (intentionalKnnScans(name)) {
        // the intentional sites must still be the BROADCAST form — a
        // CartesianProduct here would mean the broadcast hint was lost
        // and the corpus is being shuffled against the query set
        if (cartesian) Some(s"$name: CartesianProduct (broadcast hint lost)") else None
      } else if (nested || cartesian) {
        Some(s"$name: ${if (nested) "BroadcastNestedLoopJoin" else "CartesianProduct"}")
      } else None
    }
    assert(offenders.isEmpty, s"unexpected nested-loop/cartesian plans:\n${offenders.mkString("\n")}")
  }

  test("the intentional kNN scans do plan the broadcast nested loop they claim") {
    intentionalKnnScans.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf())
        .queryExecution.explainString(FormattedMode)
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"$name no longer plans a BroadcastNestedLoopJoin — allowlist stale?")
    }
  }

  test("dimension joins broadcast the small side (no sort-merge on a dim table)") {
    // region/nation/customer dims against fact tables must plan
    // BroadcastHashJoin — a sort-merge here would shuffle the fact side
    // on a join that moves kilobytes of dimension data
    Seq("q_join_revenue", "q_join_nation_region", "q_tpch_q3").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf())
        .queryExecution.explainString(FormattedMode)
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: expected the dimension join to broadcast")
    }
  }

  test("ivf probe path joins candidates with a hash equi-join, not a nested loop") {
    Seq("q_knn_cosine_ivf", "q_knn_cosine_ivf_kmeans", "q_knn_cosine_lsh").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf())
        .queryExecution.explainString(FormattedMode)
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: expected a broadcast hash equi-join on the probe/bucket key")
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$name: the indexed path must never nested-loop the corpus")
    }
  }
}
