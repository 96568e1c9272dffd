package graft.store

import graft.SparkSuite
import graft.keys.HashPrefix
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._

import java.nio.file.Files

class CdcStoreSpec extends SparkSuite {
  import spark.implicits._

  private val dist = HashPrefix(4)

  private def freshPath(): String =
    Files.createTempDirectory("graft_cdcstore_spec").toString + "/store"

  private def base = Seq(
    (1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L), (4L, "four", 40L)
  ).toDF("k", "v", "n")

  private def snapshotList(path: String): List[(Long, String, Long)] =
    CdcStore.snapshot(spark, path, "k")
      .orderBy("k").as[(Long, String, Long)].collect().toList

  private def buildStore(): String = {
    val path = freshPath()
    CdcStore.writeBase(base, col("k"), dist, path)
    // gen 0: update 2, delete 3
    CdcStore.append(Seq((2L, "TWO", 21L, "U"), (3L, "x", 0L, "D"))
      .toDF("k", "v", "n", "op"), 0L, path)
    // gen 1: re-insert 3 (post-delete insert must win), delete 4, insert 9
    CdcStore.append(Seq((3L, "back", 33L, "I"), (4L, "x", 0L, "D"),
      (9L, "nine", 90L, "I")).toDF("k", "v", "n", "op"), 1L, path)
    path
  }

  private val resolved = List(
    (1L, "one", 10L), (2L, "TWO", 21L), (3L, "back", 33L), (9L, "nine", 90L))

  test("snapshot resolves last-writer-wins across base and delta generations") {
    assert(snapshotList(buildStore()) === resolved)
  }

  test("as-of reads address any uncompacted generation and prune later ones") {
    val path = buildStore()
    def asOf(n: Long) = CdcStore.snapshot(spark, path, "k", asOf = n)
    // gen -1 = base only; gen 0 = update 2 + delete 3; gen 1 = current
    assert(asOf(-1L).orderBy("k").as[(Long, String, Long)].collect().toList ===
      List((1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L), (4L, "four", 40L)))
    assert(asOf(0L).orderBy("k").as[(Long, String, Long)].collect().toList ===
      List((1L, "one", 10L), (2L, "TWO", 21L), (4L, "four", 40L)))
    assert(asOf(1L).orderBy("k").as[(Long, String, Long)].collect().toList === resolved)
    // the generation filter must reach the seq partition column
    val p = asOf(0L).queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(seq"),
      s"as-of filter must partition-prune the delta scan:\n$p")
  }

  test("compact folds the log: same snapshot, empty delta dir, idempotent") {
    val path = buildStore()
    CdcStore.compact(spark, path, col("k"), dist, "k")
    assert(snapshotList(path) === resolved, "snapshot must survive compaction")
    val deltaDir = new java.io.File(s"$path/delta")
    assert(!deltaDir.exists() ||
      !deltaDir.listFiles().exists(_.getName.startsWith("seq=")),
      "folded generations must be truncated")
    CdcStore.compact(spark, path, col("k"), dist, "k") // no deltas: no-op
    assert(snapshotList(path) === resolved)
  }

  test("appends after a compact land on the folded base") {
    val path = buildStore()
    CdcStore.compact(spark, path, col("k"), dist, "k")
    CdcStore.append(Seq((9L, "NINE", 91L, "U"), (1L, "x", 0L, "D"))
      .toDF("k", "v", "n", "op"), 2L, path)
    assert(snapshotList(path) === List(
      (2L, "TWO", 21L), (3L, "back", 33L), (9L, "NINE", 91L)))
  }

  test("streaming writer: replayed batchIds are skipped, not re-appended") {
    val path = freshPath()
    CdcStore.writeBase(base, col("k"), dist, path)
    val b0 = Seq((2L, "TWO", 21L, "U")).toDF("k", "v", "n", "op")
    StreamingIngest.writeCdcBatchIdempotent(b0, 0L, path)
    // replay with DIFFERENT content: commit log must win, content ignored
    StreamingIngest.writeCdcBatchIdempotent(
      Seq((2L, "WRONG", 99L, "U")).toDF("k", "v", "n", "op"), 0L, path)
    StreamingIngest.writeCdcBatchIdempotent(
      Seq((4L, "x", 0L, "D")).toDF("k", "v", "n", "op"), 1L, path)
    assert(snapshotList(path) === List(
      (1L, "one", 10L), (2L, "TWO", 21L), (3L, "three", 30L)))
  }

  test("snapshot refuses a store mid-compaction swap") {
    val path = buildStore()
    val marker = new java.io.File(path, CdcStore.CompactingMarker)
    marker.createNewFile()
    try {
      val e = intercept[IllegalArgumentException](snapshotList(path))
      assert(e.getMessage.contains("mid-compaction"))
    } finally { marker.delete(); () }
  }

  test("a crash between swap and log truncation refolds idempotently") {
    val path = buildStore()
    CdcStore.compact(spark, path, col("k"), dist, "k")
    // simulate the crash aftermath: deltas that were already folded are
    // still on disk (re-append gen 0/1), plus the marker was cleared
    CdcStore.append(Seq((2L, "TWO", 21L, "U"), (3L, "x", 0L, "D"))
      .toDF("k", "v", "n", "op"), 0L, path)
    CdcStore.append(Seq((3L, "back", 33L, "I"), (4L, "x", 0L, "D"),
      (9L, "nine", 90L, "I")).toDF("k", "v", "n", "op"), 1L, path)
    CdcStore.compact(spark, path, col("k"), dist, "k")
    assert(snapshotList(path) === resolved,
      "refolding already-applied changes must be a value no-op")
  }
}
