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

  test("plan choice flips exactly at the byte threshold") {
    import org.apache.spark.sql.catalyst.plans.logical
    // def: Datasets cache queryExecution, and the plan must re-derive
    // under each conf setting
    def oneWin = df.withColumn("rn",
      row_number().over(Window.partitionBy("g").orderBy("k", "id")))
    val w = oneWin.queryExecution.optimizedPlan
      .collectFirst { case w: logical.Window => w }.get
    val bytes = w.child.stats.sizeInBytes
    assert(bytes > 0, "child stats must be estimable")
    // threshold == child size → claim (gate is >=)
    withConf(GlobalWindowGate.MinBytesKey, bytes.toString) {
      val p = oneWin.queryExecution.executedPlan.toString
      assert(p.contains("GlobalRowNumber"),
        s"child size == threshold must claim the rescue:\n$p")
    }
    // threshold == child size + 1 → stock
    withConf(GlobalWindowGate.MinBytesKey, (bytes + 1).toString) {
      val p = oneWin.queryExecution.executedPlan.toString
      assert(!p.contains("GlobalRowNumber") && p.contains("hashpartitioning(g"),
        s"child size < threshold must keep the stock plan:\n$p")
    }
  }

  /** Opt-in measurement behind GRAFT_GATE_BENCH=1 (timing asserts on a
    * shared box would flake): planted hot key (one key = 50% of rows)
    * where the rescue must bound the straggler, and a uniform small set
    * where stock must win. Prints medians; the recorded numbers live in
    * SURVEY.md §6 (gate evidence). */
  test("measured: rescue bounds the planted-hot-key straggler, stock wins small-uniform") {
    assume(sys.env.get("GRAFT_GATE_BENCH").contains("1"),
      "set GRAFT_GATE_BENCH=1 to run the gate measurement")
    def timeIt(rounds: Int)(body: => Unit): Double = {
      val xs = (1 to rounds).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      xs(xs.size / 2)
    }
    // aggregate OVER the window outputs: a bare count() lets column
    // pruning drop the Window node entirely and times nothing
    def winAgg(in: org.apache.spark.sql.DataFrame): Unit = in
      .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("k", "id")))
      .withColumn("rs", sum("k").over(Window.partitionBy("g").orderBy("k", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .agg(sum(col("rn") + col("rs"))).collect()
    // hot: 8M rows, one key carries 90%, remainder over 100k keys. On
    // local[4]/4 shuffle partitions the rescue's best case is a 4×
    // straggler cut minus its sample-pass overhead, so only heavy skew
    // shows the crossover a 1000-executor cluster sees at ANY skew.
    val hot = spark.range(8000000).selectExpr(
      "CASE WHEN id % 10 < 9 THEN -1 ELSE id % 100000 END AS g",
      "(id * 48271) % 1000000 AS k", "id").persist()
    hot.count()
    val stockHot = withConf(GlobalWindowGate.MinBytesKey, "1000g") {
      timeIt(3)(winAgg(hot)) }
    val rescueHot = withConf(GlobalWindowGate.MinBytesKey, "0") {
      timeIt(3)(winAgg(hot)) }
    hot.unpersist()
    // small-uniform: 4000 rows, 7 keys, no skew worth rescuing
    val small = df.persist(); small.count()
    val stockSmall = withConf(GlobalWindowGate.MinBytesKey, "1000g") {
      timeIt(5)(winAgg(small)) }
    val rescueSmall = withConf(GlobalWindowGate.MinBytesKey, "0") {
      timeIt(5)(winAgg(small)) }
    small.unpersist()
    info(f"hot 4M/50%%-key: stock=$stockHot%.3fs rescue=$rescueHot%.3fs")
    info(f"small uniform 4k: stock=$stockSmall%.3fs rescue=$rescueSmall%.3fs")
    println(f"[gate-bench] hot stock=$stockHot%.3fs rescue=$rescueHot%.3fs; " +
      f"small stock=$stockSmall%.3fs rescue=$rescueSmall%.3fs")
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
