package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SkewWindow: per-key running aggregates composed from the rescued
  * global primitives must equal the built-in PARTITION BY window — on
  * uniform keys, on a pathologically hot key, and on null keys/values —
  * while planning NO per-key-partitioned window (the hot-task wall). */
class SkewWindowSpec extends SparkSuite {
  import spark.implicits._

  // key 7 owns ~half the rows — the hot user; some null keys and values
  private def skewed = (0 until 20000).map { i =>
    val k: java.lang.Long =
      if (i % 31 == 0) null else if (i % 2 == 0) 7L else (i % 13).toLong
    val v: java.lang.Long =
      if (i % 11 == 0) null else ((i * 2654435761L) % 1000)
    (k, v, i.toLong)
  }.toDF("k", "v", "id").repartition(9)

  private def builtin = {
    val w = Window.partitionBy("k").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    skewed
      .withColumn("run_sum", sum("v").over(w))
      .withColumn("run_n", count(lit(1)).over(w))
      .withColumn("run_rn", row_number().over(
        Window.partitionBy("k").orderBy("id")).cast("bigint"))
  }

  private def snap(d: org.apache.spark.sql.DataFrame) = d
    .select("k", "id", "run_sum", "run_n", "run_rn")
    .collect().map(r => (Option(r.get(0)).map(_.toString).getOrElse("null"),
      r.getLong(1), Option(r.get(2)).map(_.toString).getOrElse("null"),
      r.get(3).toString, r.get(4).toString))
    .sortBy(t => (t._1, t._2)).toSeq

  test("matches the built-in on a hot key, null keys and null values") {
    val got = snap(SkewWindow.runningExact(
      skewed, Seq("k"), Seq("id"), col("v")))
    assert(got == snap(builtin))
  }

  test("plans no per-key-partitioned window — the hot key spans partitions") {
    val out = SkewWindow.runningExact(skewed, Seq("k"), Seq("id"), col("v"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window "),
      s"no built-in WindowExec may appear — partitioned OR single-task:\n$p")
    assert("GlobalRunningAgg".r.findAllIn(p).length >= 2,
      s"both the row scan and the key-offset scan must be rescued:\n$p")
    // the row-data path must ride the RANGE exchange (the hot key spans
    // partitions); the only hash exchange on k feeds the per-key
    // HashAggregate, whose input is map-side-combined partial buffers —
    // one per map task per key, never the key's rows
    assert(p.contains("Exchange rangepartitioning(k#"),
      s"row data must range-partition over (k, order):\n$p")
  }

  test("per-key lag/lead match the built-in incl. defaults, null keys, hot key") {
    val got = SkewWindow.offset(skewed, Seq("k"), Seq("id"), Seq(
        "prev_v" -> ((col("v"), -1, lit(-1L))),
        "prev2_v" -> ((col("v"), -2, lit(null).cast("long"))),
        "next_v" -> ((col("v"), 1, lit(-1L)))))
      .select("k", "id", "prev_v", "prev2_v", "next_v")
    val p = got.queryExecution.executedPlan.toString
    assert(!p.linesIterator.exists(_.trim.stripPrefix("+- ").startsWith("Window [")),
      s"no built-in WindowExec may appear:\n$p")
    assert(p.contains("GlobalOffsetWindow"),
      s"per-key lag/lead must ride the boundary-stitch exec:\n$p")
    val w = Window.partitionBy("k").orderBy("id")
    val exp = skewed
      .withColumn("prev_v", lag("v", 1, -1L).over(w))
      .withColumn("prev2_v", lag("v", 2).over(w))
      .withColumn("next_v", lead("v", 1, -1L).over(w))
      .select("k", "id", "prev_v", "prev2_v", "next_v")
    def snap2(d: org.apache.spark.sql.DataFrame) = d
      .collect().map(r => (Option(r.get(0)).map(_.toString).getOrElse("null"),
        r.getLong(1), Option(r.get(2)).map(_.toString).getOrElse("null"),
        Option(r.get(3)).map(_.toString).getOrElse("null"),
        Option(r.get(4)).map(_.toString).getOrElse("null")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(snap2(got) == snap2(exp))
  }

  test("per-key sliding sum/count/avg match the built-in incl. the clipped head") {
    val got = SkewWindow.slidingExact(skewed, Seq("k"), Seq("id"), col("v"), 5)
      .select("k", "id", "mov_sum", "mov_n", "mov_avg")
    val p = got.queryExecution.executedPlan.toString
    assert(!p.linesIterator.exists(_.trim.stripPrefix("+- ").startsWith("Window [")),
      s"no built-in WindowExec may appear:\n$p")
    assert(p.contains("GlobalSlidingAgg") && p.contains("GlobalRunningAgg"),
      s"sliding AND running scans must both be rescued:\n$p")
    val w = Window.partitionBy("k").orderBy("id").rowsBetween(-5, Window.currentRow)
    val exp = skewed
      .withColumn("mov_sum", sum("v").over(w))
      .withColumn("mov_n", count(lit(1)).over(w))
      .withColumn("mov_avg", avg("v").over(w))
      .select("k", "id", "mov_sum", "mov_n", "mov_avg")
    def snap3(d: org.apache.spark.sql.DataFrame) = d
      .collect().map(r => (Option(r.get(0)).map(_.toString).getOrElse("null"),
        r.getLong(1), Option(r.get(2)).map(_.toString).getOrElse("null"),
        r.get(3).toString, Option(r.get(4)).map(_.toString).getOrElse("null")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(snap3(got) == snap3(exp))
  }

  test("per-key rank/dense_rank match the built-in incl. ties, null keys and values") {
    // order by v: heavy ties (v has few distinct values per key), null
    // order values form their own peer run
    val got = SkewWindow.rankExact(skewed, Seq("k"), Seq("v"),
        percentRankName = Some("prk"), cumeDistName = Some("cd"))
      .select("k", "id", "rnk", "drnk", "prk", "cd")
    val p = got.queryExecution.executedPlan.toString
    assert(!p.linesIterator.exists(_.trim.stripPrefix("+- ").startsWith("Window [")),
      s"no built-in WindowExec may appear:\n$p")
    val w = Window.partitionBy("k").orderBy("v")
    val exp = skewed
      .withColumn("rnk", rank().over(w).cast("bigint"))
      .withColumn("drnk", dense_rank().over(w).cast("bigint"))
      .withColumn("prk", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .select("k", "id", "rnk", "drnk", "prk", "cd")
    def snap4(d: org.apache.spark.sql.DataFrame) = d
      .collect().map(r => (Option(r.get(0)).map(_.toString).getOrElse("null"),
        r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4).toString, r.getDouble(5).toString))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(snap4(got) == snap4(exp))
  }

  test("per-key ntile matches the built-in across bucket counts and tiny keys") {
    for (b <- Seq(1, 3, 7, 1000)) { // 1000 > every key's row count: degenerate path
      val got = SkewWindow.ntileExact(skewed, Seq("k"), Seq("id"), b)
        .select("k", "id", "nt")
      val w = Window.partitionBy("k").orderBy("id")
      val exp = skewed.withColumn("nt", ntile(b).over(w)).select("k", "id", "nt")
      def snap5(d: org.apache.spark.sql.DataFrame) = d
        .collect().map(r => (Option(r.get(0)).map(_.toString).getOrElse("null"),
          r.getLong(1), r.getInt(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(snap5(got) == snap5(exp), s"ntile($b) diverged")
    }
    val p = SkewWindow.ntileExact(skewed, Seq("k"), Seq("id"), 4)
      .queryExecution.executedPlan.toString
    assert(!p.linesIterator.exists(_.trim.stripPrefix("+- ").startsWith("Window [")),
      s"no built-in WindowExec may appear:\n$p")
    // rnCol reuse: same values, no second prefix scan
    val run = SkewWindow.runningExact(skewed, Seq("k"), Seq("id"), col("v"))
    val reused = SkewWindow.ntileExact(run, Seq("k"), Seq("id"), 4,
      rnCol = Some("run_rn")).select("k", "id", "nt")
    val fresh = SkewWindow.ntileExact(skewed, Seq("k"), Seq("id"), 4)
      .select("k", "id", "nt")
    def snap6(d: org.apache.spark.sql.DataFrame) = d
      .collect().map(r => (Option(r.get(0)).map(_.toString).getOrElse("null"),
        r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._2)).toSeq
    assert(snap6(reused) == snap6(fresh))
  }

  test("decimal values stay exact; float values refuse") {
    val d = skewed.withColumn("dv", col("v").cast("decimal(18,2)"))
    val w = Window.partitionBy("k").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = SkewWindow.runningExact(d, Seq("k"), Seq("id"), col("dv"))
      .select("k", "id", "run_sum")
      .collect().map(r => (Option(r.get(0)).map(_.toString).getOrElse("null"),
        r.getLong(1), Option(r.get(2)).map(_.toString).getOrElse("null")))
      .sortBy(t => (t._1, t._2)).toSeq
    val exp = d.withColumn("run_sum", sum("dv").over(w))
      .select("k", "id", "run_sum")
      .collect().map(r => (Option(r.get(0)).map(_.toString).getOrElse("null"),
        r.getLong(1), Option(r.get(2)).map(_.toString).getOrElse("null")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == exp)
    val e = intercept[IllegalArgumentException] {
      SkewWindow.runningExact(
        skewed.withColumn("f", col("v").cast("double")),
        Seq("k"), Seq("id"), col("f"))
    }
    assert(e.getMessage.contains("exact"))
  }
}
