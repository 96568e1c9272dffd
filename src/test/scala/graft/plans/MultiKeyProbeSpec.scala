package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plan pin: EVERY rescued window family claims composite ORDER BY a, b
  * (multi-key order specs are first-class, not a fallback edge). The
  * one legitimately absent shape — a RANGE frame with VALUE offsets
  * over multiple order keys — is illegal SQL (Spark's analyzer rejects
  * it), pinned below. */
class MultiKeyProbeSpec extends SparkSuite {
  import spark.implicits._

  private def df = (0 until 1000)
    .map(i => (i.toLong % 50, (i % 13).toLong, i.toLong))
    .toDF("a", "b", "id").repartition(4)

  test("probe multi-key shapes") {
    val w2 = Window.orderBy("a", "b")
    val shapes: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "rownum" -> df.withColumn("x", row_number().over(w2)),
      "rank" -> df.withColumn("x", rank().over(w2)),
      "running_sum_bare" -> df.withColumn("x", sum("id").over(w2)),
      "running_sum_rows" -> df.withColumn("x", sum("id").over(
        w2.rowsBetween(Window.unboundedPreceding, Window.currentRow))),
      "sliding_rows" -> df.withColumn("x", sum("id").over(
        w2.rowsBetween(-3, 2))),
      "lag" -> df.withColumn("x", lag("id", 2).over(w2)),
      "lag_ignore" -> df.withColumn("x",
        expr("lag(id, 2) IGNORE NULLS").over(w2)),
      "nth" -> df.withColumn("x", nth_value(col("id"), 5).over(
        w2.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))),
      "last_value_full" -> df.withColumn("x", last("id").over(
        w2.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))),
      "suffix_sum" -> df.withColumn("x", sum("id").over(
        w2.rowsBetween(Window.currentRow, Window.unboundedFollowing))),
      "const_sum" -> df.withColumn("x", sum("id").over(
        w2.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))),
      "perkey_running" -> df.withColumn("x", sum("id").over(
        Window.partitionBy(col("id") % 3).orderBy("a", "b"))),
      "range_current" -> df.withColumn("x", sum("id").over(
        w2.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    shapes.foreach { case (name, q) =>
      val p = q.queryExecution.executedPlan.toString
      val builtin = p.linesIterator.exists(l =>
        l.trim.stripPrefix("+- ").startsWith("Window ["))
      assert(p.contains("Global") && !builtin,
        s"shape '$name' with ORDER BY a, b must rescue:\n$p")
    }
  }

  test("RANGE with value offsets over two order keys is illegal SQL (analyzer rejects)") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.withColumn("x", sum("id").over(
        Window.orderBy("a", "b").rangeBetween(-5, 5)))
        .queryExecution.executedPlan
    }
    assert(e.getMessage.toLowerCase.contains("multi") ||
      e.getMessage.toLowerCase.contains("more than one"),
      s"unexpected analyzer message: ${e.getMessage}")
  }
}
