package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** GlobalWindowSplit: a single Window node mixing frame families over
  * one ORDER BY must split so every family plans its rescue exec —
  * values identical to the unsplit built-in. */
class GlobalWindowSplitSpec extends SparkSuite {
  import spark.implicits._

  private def tied = (0 until 10000)
    .map(i => ((i % 97).toLong, ((i * 2654435761L) % 1000).toLong, i.toLong))
    .toDF("k", "v", "id").repartition(7)

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("running + suffix + rank + lag over ONE order spec: all four rescued") {
    tied.createOrReplaceTempView("gws_t")
    // identical (empty, ORDER BY k, id) spec → ONE analyzed Window node
    val out = spark.sql(
      """SELECT id,
           SUM(v) OVER (ORDER BY k, id) AS run_sum,
           SUM(v) OVER (ORDER BY k, id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rem_sum,
           rank() OVER (ORDER BY k, id) AS rnk,
           lag(v, 1) OVER (ORDER BY k, id) AS prev_v
         FROM gws_t""")
    val p = out.queryExecution.executedPlan.toString
    assert("GlobalRunningAgg".r.findAllIn(p).length >= 2,
      s"expected running AND suffix GlobalRunningAggExec nodes:\n$p")
    assert(p.contains("GlobalRowNumber"), s"expected GlobalRowNumberExec:\n$p")
    assert(p.contains("GlobalOffsetWindow"), s"expected GlobalOffsetWindowExec:\n$p")
    assert(!p.linesIterator.exists(_.trim.stripPrefix("+- ").startsWith("Window [")),
      s"no single-task WindowExec may survive the split:\n$p")
    def snap(d: org.apache.spark.sql.DataFrame) = d
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        Option(r.get(4)))).sortBy(_._1).toSeq
    val got = snap(out)
    val expected = withConf(GlobalRowNumberStrategy.ConfKey, "false") { snap(out) }
    assert(got == expected)
  }

  test("unclaimed family splits out alone and keeps the built-in, others rescue") {
    tied.createOrReplaceTempView("gws_t2")
    // collect_list is deliberately unclaimed (its value IS the
    // enumeration order); the split must leave it (and only it) on the
    // built-in path while the running sum rescues. (nth_value past the
    // head cap — this test's previous unclaimed example — now fetches
    // its value with a targeted second job instead of falling back.)
    val out = spark.sql(
      """SELECT id,
           SUM(v) OVER (ORDER BY k, id) AS run_sum,
           collect_list(v) OVER (ORDER BY k, id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
         FROM gws_t2""")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("GlobalRunningAgg"), s"running sum must still rescue:\n$p")
    assert(p.linesIterator.exists(_.trim.stripPrefix("+- ").startsWith("Window [")),
      s"collect_list keeps WindowExec:\n$p")
    def snap(d: org.apache.spark.sql.DataFrame) = d
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.toString).getOrElse("null"))).sortBy(_._1).toSeq
    val got = snap(out)
    val expected = withConf(GlobalRowNumberStrategy.ConfKey, "false") { snap(out) }
    assert(got == expected)
  }

  test("homogeneous nodes and partitioned windows are left untouched") {
    // single-category node: the strategy handles it directly, no split
    val one = tied.selectExpr("id", "SUM(v) OVER (ORDER BY k, id) AS s",
      "COUNT(v) OVER (ORDER BY k, id) AS c")
    assert(one.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.length == 1)
    // partitioned mixed node where EVERY family is partition-capable:
    // split, so each group reaches its rescue over ONE shared exchange
    val part = tied.selectExpr("id",
      "SUM(v) OVER (PARTITION BY k ORDER BY id) AS s",
      "rank() OVER (PARTITION BY k ORDER BY id) AS r")
    val pp = part.queryExecution.executedPlan.toString
    assert(pp.contains("GlobalRunningAgg") && pp.contains("GlobalRowNumber"),
      s"partition-capable mixed node must split into both rescues:\n$pp")
    def snap(d: org.apache.spark.sql.DataFrame) = d
      .collect().map(r => (0 until r.length).map(j =>
        Option(r.get(j)).map(_.toString).getOrElse("null")).mkString("|"))
      .sorted.toSeq
    val gotP = snap(part)
    val expP = withConf(GlobalRowNumberStrategy.ConfKey, "false") { snap(part) }
    assert(gotP == expP)
    // per-key whole-group last_value is now nth-rescuable: a mixed
    // running + whole-group node splits and BOTH rescue
    val lastPart = tied.selectExpr("id",
      "SUM(v) OVER (PARTITION BY k ORDER BY id) AS s",
      """last_value(v) OVER (PARTITION BY k ORDER BY id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv""")
    val lp = lastPart.queryExecution.executedPlan.toString
    assert(lp.contains("GlobalRunningAgg") && lp.contains("GlobalNthValue"),
      s"running + per-key whole-group last_value must both rescue:\n$lp")
    val lGot = snap(lastPart)
    val lExp = withConf(GlobalRowNumberStrategy.ConfKey, "false") { snap(lastPart) }
    assert(lGot == lExp)
    // partitioned mixed node with a NON-capable family (nth_value past
    // the driver-head cap has no rescue): left whole — a partial split
    // would pay two exchanges and still keep the hot-key wall
    val mixedPart = tied.selectExpr("id",
      "SUM(v) OVER (PARTITION BY k ORDER BY id) AS s",
      """nth_value(v, 100000) OVER (PARTITION BY k ORDER BY id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv""")
    val wp = mixedPart.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wp.length == 1 && wp.head.windowExpressions.length == 2)
  }

  test("opt-out leaves mixed nodes unsplit") {
    tied.createOrReplaceTempView("gws_t3")
    withConf(GlobalRowNumberStrategy.ConfKey, "false") {
      val out = spark.sql(
        """SELECT SUM(v) OVER (ORDER BY k, id) AS a,
             rank() OVER (ORDER BY k, id) AS b FROM gws_t3""")
      val ws = out.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(ws.length == 1 && ws.head.windowExpressions.length == 2)
    }
  }
}
