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
}
