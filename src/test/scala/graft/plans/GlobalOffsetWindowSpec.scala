package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalOffsetWindowStrategy: naive `lag()/lead() OVER (ORDER BY ...)`
  * must plan as the range-shuffle + boundary-stitch exec and produce
  * values identical to the built-in single-task WindowExec. */
class GlobalOffsetWindowSpec extends SparkSuite {
  import spark.implicits._

  // unique total order, scattered across 7 input partitions so every
  // shuffle partition boundary exercises the stitched neighbor rows
  private def df = (0 until 10000).map(i => ((i * 2654435761L) % 100000, i.toLong))
    .toDF("k", "id").repartition(7)

  private def collected(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) Long.MinValue else r.getLong(2),
      if (r.isNullAt(3)) Long.MinValue else r.getLong(3),
      r.getLong(4))).sorted.toSeq

  test("lag/lead plan the offset exec and match WindowExec across boundaries") {
    val w = Window.orderBy("k", "id")
    val out = df
      .withColumn("lg", lag("id", 1).over(w))
      .withColumn("ld", lead("id", 3).over(w))
      .withColumn("lgd", lag("id", 5, -1L).over(w))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("GlobalOffsetWindow"), s"expected GlobalOffsetWindowExec:\n$p")
    // the built-in node prints as a standalone "Window [" (our exec name
    // ends in ...OffsetWindow, so match on the word boundary)
    assert(!p.linesIterator.exists(_.trim.stripPrefix("+- ").startsWith("Window [")),
      s"built-in WindowExec should be replaced:\n$p")
    val got = collected(out)
    val expected = withConf(GlobalRowNumberStrategy.ConfKey, "false") {
      collected(out)
    }
    assert(got == expected)
    // spot-check semantics: defaults at the table edges
    val byK = out.orderBy("k", "id")
      .select("id", "lg", "ld", "lgd").collect()
    assert(byK.head.isNullAt(1), "first row has no lag")
    assert(byK.head.getLong(3) == -1L, "lag default fills the head")
    assert(byK.last.isNullAt(2), "last row has no lead(3)")
  }

  test("offsets larger than a partition walk through it") {
    // 10 rows over up to 8 shuffle partitions: lead(4)/lag(4) must cross
    // several single-row partitions
    val tiny = (0 until 10).map(i => (i.toLong, i.toLong)).toDF("k", "id")
      .repartition(8)
    val w = Window.orderBy("k")
    val out = tiny
      .withColumn("lg", lag("id", 4).over(w))
      .withColumn("ld", lead("id", 4).over(w))
      .orderBy("k")
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) -99L else r.getLong(2),
        if (r.isNullAt(3)) -99L else r.getLong(3))).toSeq
    val expected = (0L until 10L).map(i =>
      (i, if (i >= 4) i - 4 else -99L, if (i <= 5) i + 4 else -99L))
    assert(out == expected)
  }

  test("falls back for ignoreNulls; partitioned specs rescue with a key guard") {
    val w = Window.orderBy("k", "id")
    // the global IGNORE NULLS variant has its own strategy
    // (GlobalOffsetIgnoreNullsStrategy); THIS exec declines it
    val ign = df.withColumn("lg", lag(col("id"), 1, null, true).over(w))
    assert(!ign.queryExecution.executedPlan.toString.contains("GlobalOffsetWindow "))
    // per-key lag/lead now rides the same boundary-stitch exec over a
    // (key, order) range exchange, cross-key neighbors defaulted
    val part = df.withColumn("lg",
        lag("id", 1, -7L).over(Window.partitionBy(col("k") % 10).orderBy("id")))
      .withColumn("ld",
        lead("id", 2).over(Window.partitionBy(col("k") % 10).orderBy("id")))
    val pp = part.queryExecution.executedPlan.toString
    assert(pp.contains("GlobalOffsetWindow"), s"per-key lag must rescue:\n$pp")
    assert(pp.contains("rangepartitioning") && !pp.contains("hashpartitioning"),
      s"the exchange must be a range exchange, not a hash on the key:\n$pp")
    def snap(d: org.apache.spark.sql.DataFrame) = d
      .collect().map(r => (0 until r.length).map(j =>
        Option(r.get(j)).map(_.toString).getOrElse("null")).mkString("|"))
      .sorted.toSeq
    val got = snap(part)
    val expected = withConf(GlobalRowNumberStrategy.ConfKey, "false") { snap(part) }
    assert(got == expected, "per-key lag/lead must match the built-in")
  }

  test("empty input and expression-valued lag inputs work") {
    val w = Window.orderBy("k", "id")
    val empty = df.filter(col("id") < 0)
      .withColumn("lg", lag("id", 1).over(w))
    assert(empty.count() == 0)
    val expr = df.withColumn("lg", lag(col("id") * 2 + col("k"), 2).over(w))
    val got = expr.collect().map(r =>
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).sorted
    val exp = withConf(GlobalRowNumberStrategy.ConfKey, "false") {
      expr.collect().map(r =>
        (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).sorted
    }
    assert(got.toSeq == exp.toSeq)
  }

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
