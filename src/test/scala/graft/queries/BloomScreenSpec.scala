package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** q_dedup_bloom_screen semantics the exact oracle cannot see: the
  * screen must actually SCREEN (the bloom admits every true dup — its
  * zero-false-negative contract — while passing only a rate-bounded
  * sliver of the novel docs to the verify join). */
class BloomScreenSpec extends SparkSuite {

  test("verdicts: every verbatim copy is a dup with its source as match; novels fresh") {
    val rows = SparkEntry.queries("q_dedup_bloom_screen")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val copies = rows.filter(r => r.getLong(0) >= 100000L && r.getLong(0) < 200000L)
    assert(copies.nonEmpty)
    copies.foreach { r =>
      assert(r.getLong(1) === 1L, s"copy ${r.getLong(0)} not flagged")
      assert(r.getLong(2) === r.getLong(0) - 100000L,
        s"copy ${r.getLong(0)} matched ${r.getLong(2)}")
    }
    // token-reversed docs are novel unless the reversal is an identity
    // (single-token or palindromic-token docs) — then BOTH engines call
    // them dups, so just require that most land fresh
    val novels = rows.filter(_.getLong(0) >= 300000L)
    assert(novels.count(_.getLong(1) === 0L) > novels.length * 0.9)
  }

  test("the bloom screens: zero false negatives, novel pass-through rate-bounded") {
    // rebuild the screen exactly as the query does and measure what the
    // exact output hides: how many batch docs the bloom let through
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val hist = docs.select(md5(col("text")).as("h"))
    val bfAgg = ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("h"))),
        ColumnBridge.expression(lit(100000L)),
        ColumnBridge.expression(lit(800000L))).toAggregateExpression())
    val bf = hist.agg(bfAgg.as("bf")).head().getAs[Array[Byte]]("bf")
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          ColumnBridge.expression(lit(bf)),
          ColumnBridge.expression(xxhash64(col("h")))))).count()
    // every history hash hits (the no-false-negative contract the
    // screen's correctness rests on)
    assert(hits(hist) === hist.count())
    // novel hashes pass at (well under) the configured fp rate: the
    // verify join's input is a sliver of the batch, which is the point
    val novel = docs.select(md5(concat(lit("novel:"), col("text"))).as("h"))
    val fp = hits(novel)
    assert(fp <= math.max(2L, novel.count() / 20),
      s"$fp of ${novel.count()} novel hashes passed the screen")
  }

  test("over-capacity history rebuilds the filter at the true count — the fp contract survives") {
    import graft.pipeline.Dedup
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val hist = docs.select(md5(col("text")).as("h"))
    val n = hist.count()
    assert(n > 50L)
    // a guess the history has outgrown 10x: the adaptive path must
    // rebuild at the true count instead of silently saturating
    val (bf, got) = Dedup.sizedHistoryBloom(hist, col("h"), 50L)
    assert(got === n)
    def hits(filter: Array[Byte], df: org.apache.spark.sql.DataFrame): Long =
      df.filter(ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          ColumnBridge.expression(lit(filter)),
          ColumnBridge.expression(xxhash64(col("h")))))).count()
    // zero false negatives (the bloom contract, any sizing)
    assert(hits(bf, hist) === n)
    // the fp rate holds the ~8 bits/item contract despite the bad guess
    val novel = docs.select(md5(concat(lit("novel2:"), col("text"))).as("h"))
    val fp = hits(bf, novel)
    assert(fp <= math.max(2L, novel.count() / 20),
      s"$fp of ${novel.count()} novel hashes passed the rebuilt screen")
    // contrast — the saturated filter the guard replaces: built AT the
    // 50-item guess over the same history, it passes novel hashes at a
    // useless rate (the perf footgun this sizing exists to kill)
    val smallAgg = ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("h"))),
        ColumnBridge.expression(lit(50L)),
        ColumnBridge.expression(lit(400L))).toAggregateExpression())
    val saturated = hist.agg(smallAgg.as("bf")).head().getAs[Array[Byte]]("bf")
    assert(hits(saturated, novel) > fp * 5,
      "the saturated filter should be dramatically leakier than the rebuilt one")
  }

  test("persisted history bloom: build-once, increment appends fold in, superset stays sound") {
    import spark.implicits._
    import graft.pipeline.Dedup
    val dir = java.nio.file.Files.createTempDirectory("hbloom").toString
    val path = s"$dir/history_bloom"
    val hist = (0L until 2000L).map(i => s"key$i").toDF("h").persist()
    // first call BUILDS and persists; second call READS the file —
    // bit-identical bytes, no corpus agg (the amortization contract)
    val (b1, n1) = Dedup.ensureHistoryBloom(spark, path, hist, col("h"), 2000L)
    assert(n1 === 2000L)
    val (b2, n2) = Dedup.ensureHistoryBloom(spark, path,
      spark.range(0).selectExpr("'x' AS h"), col("h"), 1L) // hist unread
    assert(n2 === 2000L && java.util.Arrays.equals(b1, b2),
      "second ensure must serve the persisted filter, not rebuild")
    // an increment's keys fold in driver-side and probe bit-compatibly
    // through the same might_contain the screens use
    Dedup.appendHistoryBloom(spark, path, Seq("newkeyA", "newkeyB"))
    val (b3, n3) = Dedup.ensureHistoryBloom(spark, path,
      spark.range(0).selectExpr("'x' AS h"), col("h"), 1L)
    assert(n3 === 2002L)
    def contains(bytes: Array[Byte], k: String): Boolean = {
      import org.apache.spark.sql.graft.ColumnBridge
      Seq(k).toDF("h").filter(ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          ColumnBridge.expression(lit(bytes)),
          ColumnBridge.expression(xxhash64(col("h")))))).count() == 1L
    }
    assert(contains(b3, "newkeyA") && contains(b3, "newkeyB"),
      "appended keys must probe positive through might_contain")
    assert(contains(b3, "key7"), "original membership must survive the append")
    // zero false negatives over the whole history — the screen contract
    val misses = hist.filter(!ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.expression(lit(b3)),
        ColumnBridge.expression(xxhash64(col("h")))))).count()
    assert(misses === 0L)
    hist.unpersist()
  }

  test("generation-bound bloom: a REPLACED corpus under a standing filter auto-rebuilds") {
    import spark.implicits._
    import graft.pipeline.Dedup
    import org.apache.spark.sql.graft.ColumnBridge
    val dir = java.nio.file.Files.createTempDirectory("hbloom_gen").toString
    val path = s"$dir/history_bloom"
    def contains(bytes: Array[Byte], k: String): Boolean =
      Seq(k).toDF("h").filter(ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          ColumnBridge.expression(lit(bytes)),
          ColumnBridge.expression(xxhash64(col("h")))))).count() == 1L
    val corpus1 = Seq("oldA", "oldB", "oldC").toDF("h")
    val (b1, n1) = Dedup.ensureHistoryBloom(spark, path, corpus1, col("h"),
      100L, generation = Some(11L))
    assert(n1 === 3L && contains(b1, "oldA"))
    // same generation: the persisted filter is served (no rebuild)
    val (b1b, _) = Dedup.ensureHistoryBloom(spark, path,
      spark.range(0).selectExpr("'x' AS h"), col("h"), 1L,
      generation = Some(11L))
    assert(java.util.Arrays.equals(b1, b1b))
    // increments extend the GENERATION, they don't change its tag
    Dedup.appendHistoryBloom(spark, path, Seq("inc1", "inc1", "inc2"))
    val (b1c, n1c) = Dedup.ensureHistoryBloom(spark, path,
      spark.range(0).selectExpr("'x' AS h"), col("h"), 1L,
      generation = Some(11L))
    assert(n1c === 5L, "append must count DISTINCT keys into the stored load")
    assert(contains(b1c, "inc1") && contains(b1c, "oldB"))
    // the corpus is REPLACED (new generation tag): before r18 this
    // silently served a SUBSET filter — false negatives skip the exact
    // verify join entirely; now the mismatch rebuilds from the new hist
    val corpus2 = Seq("newA", "newB").toDF("h")
    val (b2, n2) = Dedup.ensureHistoryBloom(spark, path, corpus2, col("h"),
      100L, generation = Some(22L))
    assert(n2 === 2L, "replacement must rebuild at the new corpus count")
    assert(contains(b2, "newA") && contains(b2, "newB"),
      "the rebuilt filter must cover the REPLACED corpus (no subset state)")
    // an unbound caller (no tag) keeps the caller-managed-delete contract
    val (b3, n3) = Dedup.ensureHistoryBloom(spark, path,
      spark.range(0).selectExpr("'x' AS h"), col("h"), 1L)
    assert(n3 === 2L && java.util.Arrays.equals(b2, b3))
    // mid-swap debris detection: a missing filter with a standing .tmp
    // sibling is a concurrent/crashed writer — ensure fails LOUDLY
    // instead of racing a rebuild against the other writer's rename
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(path), false)
    fs.create(new org.apache.hadoop.fs.Path(dir, ".history_bloom.tmp"), true).close()
    val e = intercept[IllegalArgumentException] {
      Dedup.ensureHistoryBloom(spark, path, corpus2, col("h"), 100L)
    }
    assert(e.getMessage.contains("single-writer"))
  }
}
