package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** GlobalOffsetIgnoreNullsStrategy: naive global lag/lead IGNORE NULLS
  * must plan as the value-stitch exec and match the built-in single-task
  * WindowExec exactly, including long null runs spanning partitions. */
class GlobalOffsetIgnoreNullsSpec extends SparkSuite {
  import spark.implicits._

  // ~70% nulls with long runs: i in a run of 37 keeps only multiples of 3
  private def df = (0 until 10000)
    .map { i =>
      val v = if ((i / 37) % 3 == 0 && i % 3 == 0) Some(((i * 48271) % 1000).toLong)
              else None
      (i.toLong, v)
    }
    .toDF("id", "v").repartition(7)

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("lag/lead IGNORE NULLS with mixed offsets match WindowExec") {
    df.createOrReplaceTempView("ign_t")
    val q = """SELECT id, v,
                 lag(v, 1) IGNORE NULLS OVER (ORDER BY id) AS prev_nn,
                 lag(v, 3) IGNORE NULLS OVER (ORDER BY id) AS prev3_nn,
                 lead(v, 1) IGNORE NULLS OVER (ORDER BY id) AS next_nn,
                 lead(v, 2, -1) IGNORE NULLS OVER (ORDER BY id) AS next2_nn
               FROM ign_t"""
    val out = spark.sql(q)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("GlobalOffsetIgnoreNulls"),
      s"expected GlobalOffsetIgnoreNullsExec:\n$p")
    assert(!p.linesIterator.exists(_.trim.stripPrefix("+- ").startsWith("Window [")),
      s"built-in WindowExec should be replaced:\n$p")
    def snap(d: org.apache.spark.sql.DataFrame) = d
      .collect().map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) null else r.get(i)).toList)
      .sortBy(_.head.asInstanceOf[Long])
    val got = snap(out)
    val expected = withConf(GlobalRowNumberStrategy.ConfKey, "false") {
      snap(spark.sql(q))
    }
    val diffs = got.zip(expected).filter(p => p._1 != p._2).take(5)
    assert(diffs.isEmpty,
      s"IGNORE NULLS offsets must match the built-in; first diffs (got vs exp):\n" +
        diffs.map(p => s"  ${p._1}  vs  ${p._2}").mkString("\n"))
  }

  test("null runs longer than a partition stitch values across partitions") {
    // only ids 0 and 99 are non-null; 8 partitions of ~12 rows each
    val tiny = (0 until 100)
      .map(i => (i.toLong, if (i == 0 || i == 99) Some(i.toLong) else None))
      .toDF("id", "v").repartition(8)
    tiny.createOrReplaceTempView("ign_tiny")
    val out = spark.sql(
      """SELECT id,
           lag(v, 1) IGNORE NULLS OVER (ORDER BY id) AS p,
           lead(v, 1) IGNORE NULLS OVER (ORDER BY id) AS n
         FROM ign_tiny""")
    assert(out.queryExecution.executedPlan.toString.contains("GlobalOffsetIgnoreNulls"))
    val rows = out.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) -1L else r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1).toSeq
    // every row after 0 sees 0 as its previous non-null (except row 99
    // which sees 0 too — wait: 99's previous non-null IS 0); every row
    // before 99 sees 99 as next non-null; row 0 has no predecessor.
    assert(rows(0) == (0L, -1L, 99L))
    assert(rows(50) == (50L, 0L, 99L))
    assert(rows(99) == (99L, 0L, -1L))
  }

  test("per-key lag/lead IGNORE NULLS: group-aware stitch matches the built-in") {
    // skewed: key 0 holds ~3/4 of rows (spans several range partitions);
    // nulls in long runs so stitches cross partitions WITHIN the hot key
    val keyed = (0 until 8000)
      .map { i =>
        val k = if (i % 4 != 3) 0L else (i % 23).toLong
        val v = if ((i / 29) % 3 == 0 && i % 2 == 0) Some(((i * 48271) % 1000).toLong)
                else None
        (k, i.toLong, v)
      }
      .toDF("k", "id", "v").repartition(7)
    keyed.createOrReplaceTempView("ign_keyed")
    val q = """SELECT k, id, v,
                 lag(v, 1) IGNORE NULLS OVER (PARTITION BY k ORDER BY id) AS prev_nn,
                 lag(v, 2) IGNORE NULLS OVER (PARTITION BY k ORDER BY id) AS prev2_nn,
                 lead(v, 1) IGNORE NULLS OVER (PARTITION BY k ORDER BY id) AS next_nn,
                 lead(v, 3, -1) IGNORE NULLS OVER (PARTITION BY k ORDER BY id) AS next3_nn
               FROM ign_keyed"""
    val out = spark.sql(q)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("GlobalOffsetIgnoreNulls"),
      s"per-key IGNORE NULLS offsets must rescue:\n$p")
    assert(!p.linesIterator.exists(_.trim.stripPrefix("+- ").startsWith("Window [")),
      s"no built-in WindowExec may appear:\n$p")
    assert(!p.contains("hashpartitioning(k"),
      s"a hash exchange on k would pin the hot key to one task:\n$p")
    def snap(d: org.apache.spark.sql.DataFrame) = d
      .collect().map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) null else r.get(i)).toList)
      .sortBy(l => (l(0).asInstanceOf[Long], l(1).asInstanceOf[Long]))
    val got = snap(out)
    val expected = withConf(GlobalRowNumberStrategy.ConfKey, "false") {
      snap(spark.sql(q))
    }
    val diffs = got.zip(expected).filter(p => p._1 != p._2).take(5)
    assert(diffs.isEmpty,
      s"per-key IGNORE NULLS offsets must match the built-in; first diffs:\n" +
        diffs.map(p => s"  ${p._1}  vs  ${p._2}").mkString("\n"))
  }

  test("respect-nulls expressions are untouched; mixed nodes split per family") {
    df.createOrReplaceTempView("ign_t2")
    val plain = spark.sql(
      "SELECT id, lag(v, 1) OVER (ORDER BY id) AS p FROM ign_t2")
    val pp = plain.queryExecution.executedPlan.toString
    assert(pp.contains("GlobalOffsetWindow") && !pp.contains("GlobalOffsetIgnoreNulls"))
    // mixed IGNORE/RESPECT in one OVER spec: GlobalWindowSplit separates
    // the two families so BOTH rescue execs plan, and values still match
    // the built-in
    val mixed = spark.sql(
      """SELECT id, lag(v, 1) OVER (ORDER BY id) AS a,
           lag(v, 1) IGNORE NULLS OVER (ORDER BY id) AS b
         FROM ign_t2""")
    val mp = mixed.queryExecution.executedPlan.toString
    assert(mp.contains("GlobalOffsetWindow") && mp.contains("GlobalOffsetIgnoreNulls"),
      s"mixed node must split into both rescue execs:\n$mp")
    def snap(d: org.apache.spark.sql.DataFrame) = d
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .sortBy(_._1).toSeq
    val got = snap(mixed)
    val expected = withConf(GlobalRowNumberStrategy.ConfKey, "false") { snap(mixed) }
    assert(got == expected)
  }
}
