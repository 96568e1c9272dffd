package graft.store

import graft.SparkSuite
import graft.keys.{Hash31, HashPrefix}
import org.apache.spark.sql.functions._

/** SecondaryIndex: value→key lookup over a salted base — results equal
  * the direct filter, the point lookup statically prunes to ONE index
  * partition, ensure is idempotent. */
class SecondaryIndexSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.resolve("t").toString
  }

  private def base = (0L until 2000L)
    .map(k => (k, k % 37, k * 10))
    .toDF("key", "v", "payload")

  test("fetchThrough equals the direct value filter") {
    val basePath = tmp("sidx_base")
    val idxPath = tmp("sidx_idx")
    val dist = HashPrefix(16)
    SaltedStore.write(base, col("key"), dist, basePath)
    SecondaryIndex.write(base, col("v"), col("key"), 8, idxPath)
    val probes = Seq(5L, 11L, 36L).toDF("v")
    val got = SecondaryIndex.fetchThrough(spark, idxPath, 8, basePath, dist,
        "key", probes)
      .select("key", "v", "payload").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    val want = base.filter(col("v").isin(5L, 11L, 36L))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got === want)
  }

  test("point lookup prunes to the one recomputed index partition") {
    val idxPath = tmp("sidx_prune")
    SecondaryIndex.write(base, col("v"), col("key"), 8, idxPath)
    val q = SecondaryIndex.lookupKeys(spark, idxPath, 8, 17L)
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // partition filter on the literal recomputed bucket
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filter on the index scan:\n${q.queryExecution.executedPlan}")
    val surviving = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
    assert(surviving.length === 1,
      s"expected exactly one surviving bucket partition, got ${surviving.length}")
    // the surviving partition IS the hash bucket of the probe value
    val expect = base.sparkSession.range(1)
      .select(Hash31.bucket(lit(17L), 8)).as[Long].head()
    assert(surviving.head.values.getInt(0).toLong === expect)
  }

  test("ensure writes once, then reuses the layout") {
    val idxPath = tmp("sidx_ensure")
    assert(SecondaryIndex.ensure(base, col("v"), col("key"), 8, idxPath))
    assert(!SecondaryIndex.ensure(base, col("v"), col("key"), 8, idxPath))
    assert(SecondaryIndex.lookupKeys(spark, idxPath, 8, 3L).count() > 0)
  }

  test("streaming maintenance: batches accumulate, replays skip, compacted equals batch build") {
    import graft.streaming.StreamingIngest.writeIndexBatchIdempotent
    val grown = tmp("sidx_grown")
    val oneShot = tmp("sidx_oneshot")
    val half = 1000L
    val b0 = base.filter(col("key") < half)
    val b1 = base.filter(col("key") >= half)
    writeIndexBatchIdempotent(b0, 0L, col("v"), col("key"), 8, grown, "t")
    writeIndexBatchIdempotent(b1, 1L, col("v"), col("key"), 8, grown, "t")
    def keysAt(p: String) = SecondaryIndex.lookupKeys(spark, p, 8, 17L)
      .as[Long].collect().sorted.toSeq
    SecondaryIndex.write(base, col("v"), col("key"), 8, oneShot)
    assert(keysAt(grown) === keysAt(oneShot))
    // replayed batch (same id) is a no-op, not a double append
    writeIndexBatchIdempotent(b1, 1L, col("v"), col("key"), 8, grown, "t")
    assert(keysAt(grown) === keysAt(oneShot))
    // compact merges the per-batch files; lookups unchanged, layout
    // equals the batch build (1 file per bucket at this size)
    def bucketFiles(p: String) =
      new java.io.File(p).listFiles().filter(_.getName.startsWith("bucket="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    assert(bucketFiles(grown).values.exists(_ > 1), "growth must leave per-batch files")
    SecondaryIndex.compact(spark, grown)
    assert(keysAt(grown) === keysAt(oneShot))
    assert(bucketFiles(grown) === bucketFiles(oneShot),
      "grown-then-compacted layout must equal the batch build")
    // the probe prune survives growth + compaction
    val q = SecondaryIndex.lookupKeys(spark, grown, 8, 17L)
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).length === 1)
  }

  // ---- RangeIndex: the value-RANGE-capable layout ----

  private def rangeKeys(path: String, lo: Option[Long], hi: Option[Long]) =
    RangeIndex.lookupRange(spark, path, 8L, lo, hi)
      .select("k").as[Long].collect().sorted.toSeq

  test("range lookup equals the direct value filter, both bounds half-open") {
    val p = tmp("ridx_vals")
    RangeIndex.write(base, col("v"), col("key"), 8L, p)
    def want(f: Long => Boolean) =
      base.filter(r => f(r.getLong(1))).select("key").as[Long].collect().sorted.toSeq
    assert(rangeKeys(p, Some(10L), Some(20L)) === want(v => v >= 10 && v < 20))
    // boundary bins: lo/hi INSIDE a bin must stay value-exact
    assert(rangeKeys(p, Some(11L), Some(13L)) === want(v => v >= 11 && v < 13))
    // empty-stop branch (unbounded hi) and unbounded lo
    assert(rangeKeys(p, Some(30L), None) === want(_ >= 30))
    assert(rangeKeys(p, None, Some(5L)) === want(_ < 5))
    assert(rangeKeys(p, None, None) === want(_ => true))
  }

  test("range lookup fuzz: random widths and bounds all equal the direct filter") {
    val rnd = new scala.util.Random(99)
    for (width <- Seq(1L, 3L, 8L, 37L, 1000L)) {
      val p = tmp(s"ridx_fuzz_$width")
      RangeIndex.write(base, col("v"), col("key"), width, p)
      def want(f: Long => Boolean) =
        base.filter(r => f(r.getLong(1))).select("key").as[Long].collect().sorted.toSeq
      for (_ <- 1 to 8) {
        val a = rnd.nextInt(40).toLong
        val b = rnd.nextInt(40).toLong
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        assert(RangeIndex.lookupRange(spark, p, width, Some(lo), Some(hi))
          .select("k").as[Long].collect().sorted.toSeq ===
          want(v => v >= lo && v < hi), s"width=$width [$lo,$hi)")
      }
      // degenerate: empty range (lo == hi) and INVERTED bounds (lo > hi)
      // behave as the half-open contract says — nothing matches
      assert(RangeIndex.lookupRange(spark, p, width, Some(7L), Some(7L)).count() === 0L)
      assert(RangeIndex.lookupRange(spark, p, width, Some(20L), Some(10L)).count() === 0L)
    }
  }

  test("range probe prunes the file listing to exactly the covered bins") {
    val p = tmp("ridx_prune")
    RangeIndex.write(base, col("v"), col("key"), 8L, p)   // v in 0..36 → bins 0..4
    val q = RangeIndex.lookupRange(spark, p, 8L, Some(11L), Some(20L))
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filter on the range-index scan:\n${q.queryExecution.executedPlan}")
    val surviving = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.values.getInt(0).toLong).sorted  // partition col infers as Int
    // [11, 20) covers bins 11 div 8 = 1 .. 19 div 8 = 2 — nothing else
    assert(surviving === Seq(1L, 2L),
      s"expected exactly bins 1,2 to survive listing, got $surviving")
    // and the value predicate reaches parquet inside the boundary bins
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(v,11)") && pushed.contains("LessThan(v,20)"),
      s"value bounds must push to parquet: $pushed")
  }

  test("range-index streaming maintenance: batches accumulate, replays skip, compacted equals batch build") {
    import graft.streaming.StreamingIngest.writeRangeIndexBatchIdempotent
    val grown = tmp("ridx_grown")
    val oneShot = tmp("ridx_oneshot")
    val half = 1000L
    val b0 = base.filter(col("key") < half)
    val b1 = base.filter(col("key") >= half)
    writeRangeIndexBatchIdempotent(b0, 0L, col("v"), col("key"), 8L, grown, "t")
    writeRangeIndexBatchIdempotent(b1, 1L, col("v"), col("key"), 8L, grown, "t")
    RangeIndex.write(base, col("v"), col("key"), 8L, oneShot)
    def keysAt(p: String) = rangeKeys(p, Some(10L), Some(20L))
    assert(keysAt(grown) === keysAt(oneShot))
    // replayed batch (same id) is a no-op, not a double append
    writeRangeIndexBatchIdempotent(b1, 1L, col("v"), col("key"), 8L, grown, "t")
    assert(keysAt(grown) === keysAt(oneShot))
    // growth leaves per-batch files inside the bins; compact merges them
    // and the range probe still prunes to exactly the covered bins
    def binFiles(p: String) =
      new java.io.File(p).listFiles().filter(_.getName.startsWith("vb="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    assert(binFiles(grown).values.exists(_ > 1), "growth must leave per-batch files")
    RangeIndex.compact(spark, grown)
    assert(keysAt(grown) === keysAt(oneShot))
    assert(binFiles(grown) === binFiles(oneShot),
      "grown-then-compacted layout must equal the batch build")
    val q = RangeIndex.lookupRange(spark, grown, 8L, Some(11L), Some(20L))
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val surviving = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.values.getInt(0).toLong).sorted
    assert(surviving === Seq(1L, 2L),
      s"bin prune must survive growth + compaction, got $surviving")
  }

  test("fetchRangeThrough equals the direct base range filter") {
    val basePath = tmp("ridx_base")
    val idxPath = tmp("ridx_idx")
    val dist = HashPrefix(16)
    SaltedStore.write(base, col("key"), dist, basePath)
    RangeIndex.write(base, col("v"), col("key"), 8L, idxPath)
    val got = RangeIndex.fetchRangeThrough(spark, idxPath, 8L, basePath, dist,
        "key", Some(10L), Some(20L))
      .select("key", "v", "payload").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    val want = base.filter(col("v") >= 10L && col("v") < 20L)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got === want)
  }
}
