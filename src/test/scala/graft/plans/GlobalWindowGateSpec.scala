package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The per-key size gate ([[GlobalWindowGate]]): below
  * `spark.graft.perKeyWindow.minChildBytes` a PARTITION BY window keeps
  * stock Spark's hash-exchange WindowExec (strictly cheaper, worst-case
  * single task bounded by the threshold itself); at/above it — or at
  * `0` — the skew-safe range-exchange rescue claims. GLOBAL windows are
  * never gated (stock is single-task at ANY size). Results must be
  * identical on both sides of the gate. */
class GlobalWindowGateSpec extends SparkSuite {
  import spark.implicits._

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def df = (0 until 4000)
    .map(i => ((i % 7).toLong, ((i * 48271) % 500).toLong, i.toLong))
    .toDF("g", "k", "id").repartition(5)

  private def perKey = df
    .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("k", "id")))
    .withColumn("rs", sum("k").over(Window.partitionBy("g").orderBy("k", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  test("below the threshold, per-key windows keep the stock hash-exchange plan") {
    withConf(GlobalWindowGate.MinBytesKey, "1g") {
      val p = perKey.queryExecution.executedPlan.toString
      assert(!p.contains("GlobalRowNumber") && !p.contains("GlobalRunningAgg"),
        s"small per-key windows must NOT pay the rescue machinery:\n$p")
      assert(p.contains("hashpartitioning(g"),
        s"expected the stock hash exchange on the partition key:\n$p")
    }
  }

  test("at/above the threshold (and at 0) the skew-safe rescue claims") {
    withConf(GlobalWindowGate.MinBytesKey, "1") {
      val p = perKey.queryExecution.executedPlan.toString
      assert(p.contains("GlobalRowNumber") || p.contains("GlobalRunningAgg"),
        s"a child above the byte threshold must claim the rescue:\n$p")
      assert(p.contains("rangepartitioning") && !p.contains("hashpartitioning(g"),
        s"the rescue must range-exchange over (g, k):\n$p")
    }
    withConf(GlobalWindowGate.MinBytesKey, "0") {
      val p = perKey.queryExecution.executedPlan.toString
      assert(p.contains("GlobalRowNumber") || p.contains("GlobalRunningAgg"),
        s"0 must pin the gate open:\n$p")
    }
  }

  test("global windows are never gated") {
    withConf(GlobalWindowGate.MinBytesKey, "1g") {
      val out = df.withColumn("rn", row_number().over(Window.orderBy("k", "id")))
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("GlobalRowNumber"),
        s"a global window must rescue at any size (stock = ONE task):\n$p")
    }
  }

  test("results are identical on both sides of the gate") {
    def snap(minBytes: String) = withConf(GlobalWindowGate.MinBytesKey, minBytes) {
      perKey.collect().map(r => (0 until r.length).map(j =>
        Option(r.get(j)).map(_.toString).getOrElse("null")).mkString("|"))
        .sorted.toSeq
    }
    assert(snap("1g") == snap("0"),
      "stock and rescued per-key windows must agree bit-for-bit")
  }
}
