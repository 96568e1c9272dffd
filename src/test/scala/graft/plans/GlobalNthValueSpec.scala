package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalNthValueStrategy: naive global `nth_value(x, n)` must plan as
  * the constant-lookup + eligibility exec and match the single-task
  * built-in — ROWS and RANGE prefixes, whole-table frames, IGNORE
  * NULLS, ties, short tables. */
class GlobalNthValueSpec extends SparkSuite {
  import spark.implicits._

  // tie runs on k (~103 deep); v null every 5th row; vk is a function
  // of k alone, so a RANGE nth_value over the ties-only order stays
  // deterministic (any row of the run yields the same value)
  private def tied = (0 until 10000).map { i =>
    val v: java.lang.Long = if (i % 5 == 0) null else ((i * 2654435761L) % 1000)
    ((i % 97).toLong, v, (i % 97).toLong * 31, i.toLong)
  }.toDF("k", "v", "vk", "id").repartition(7)

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def snap(d: org.apache.spark.sql.DataFrame) = d.collect()
    .map(r => (0 until r.length).map(j =>
      Option(r.get(j)).map(_.toString).getOrElse("null")).mkString("|"))
    .sorted.toSeq

  test("prefix frames: ROWS per-row, RANGE through the tie-run end, IGNORE NULLS") {
    tied.createOrReplaceTempView("nth_t")
    val q = """SELECT k, id,
        nth_value(v, 3) OVER (ORDER BY k, id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rows3,
        nth_value(vk, 40) OVER (ORDER BY k) AS range40,
        nth_value(v, 7) IGNORE NULLS OVER (ORDER BY k, id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ign7
      FROM nth_t"""
    val out = spark.sql(q)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("GlobalNthValue"), s"expected GlobalNthValueExec:\n$p")
    assert(!p.linesIterator.exists(_.trim.stripPrefix("+- ").startsWith("Window [")),
      s"single-task WindowExec must not survive for nth_value:\n$p")
    val got = snap(out)
    val expected = withConf(GlobalRowNumberStrategy.ConfKey, "false") {
      snap(spark.sql(q))
    }
    assert(got == expected)
  }

  test("whole-table frame: one constant everywhere, null when too short") {
    tied.createOrReplaceTempView("nth_t2")
    val q = """SELECT id,
        nth_value(v, 123) OVER (ORDER BY k, id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nth,
        nth_value(v, 999999) OVER (ORDER BY k, id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS beyond
      FROM nth_t2"""
    val out = spark.sql(q)
    assert(out.queryExecution.executedPlan.toString.contains("GlobalNthValue"))
    val got = snap(out)
    val expected = withConf(GlobalRowNumberStrategy.ConfKey, "false") {
      snap(spark.sql(q))
    }
    assert(got == expected)
    // beyond the table: null everywhere
    assert(out.select("beyond").distinct().collect().map(_.isNullAt(0)).toSeq == Seq(true))
  }

  test("short tables, n = 1 edge, and mixed node with a running sum splits") {
    val tiny = (0 until 3).map(i => (i.toLong, i.toLong)).toDF("k", "id")
    tiny.createOrReplaceTempView("nth_t3")
    val q = """SELECT id,
        nth_value(k, 1) OVER (ORDER BY id) AS first_k,
        nth_value(k, 5) OVER (ORDER BY id) AS missing
      FROM nth_t3"""
    val got = snap(spark.sql(q))
    val expected = withConf(GlobalRowNumberStrategy.ConfKey, "false") {
      snap(spark.sql(q))
    }
    assert(got == expected)
    // mixed with a running aggregate over the same spec: the split rule
    // sends each family to its own exec
    tied.createOrReplaceTempView("nth_t4")
    val mixed = spark.sql("""SELECT id,
        nth_value(v, 3) OVER (ORDER BY k, id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n3,
        SUM(v) OVER (ORDER BY k, id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
      FROM nth_t4""")
    val mp = mixed.queryExecution.executedPlan.toString
    assert(mp.contains("GlobalNthValue") && mp.contains("GlobalRunningAgg"),
      s"mixed node must split into both rescue execs:\n$mp")
    val gotM = snap(mixed)
    val expM = withConf(GlobalRowNumberStrategy.ConfKey, "false") { snap(mixed) }
    assert(gotM == expM)
  }
}
