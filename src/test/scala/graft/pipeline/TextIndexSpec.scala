package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Persisted inverted text index: sharded layout, static partition
  * pruning on probe, manifest-guarded shard contract, idempotent build. */
class TextIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog ate the bone of the day"),
    (3L, "cat and dog and bird"),
    (4L, "of mice and men"),
    (5L, "completely unrelated words here")).toDF("doc_id", "text")

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("tindex").toString
    TextIndex.write(docs, d)
    d
  }

  test("layout: shard=N partitions, manifest written after data") {
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.exists(_.startsWith("shard=")))
    assert(names.contains(TextIndex.ManifestFile))
    assert(TextIndex.storedShards(spark, dir).contains(TextIndex.Shards))
  }

  test("conjunctive search matches a direct computation") {
    val got = TextIndex.searchAll(spark, dir, Seq("the", "of"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // docs containing BOTH: 2 ("the"×3 + "of"×1 = 4); doc 1 has no "of"
    assert(got == Seq((2L, 4L)))
    val single = TextIndex.searchAll(spark, dir, Seq("cat"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(single == Seq((1L, 1L), (3L, 1L)))
  }

  test("probe prunes to the probed term shards at file-listing time") {
    val terms = Seq("cat")
    val df = TextIndex.searchAll(spark, dir, terms)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters"), s"no partition filters in:\n$p")
    val shard = TextIndex.shardOfTerm("cat")
    assert(p.contains(s"shard#") && p.contains("isnotnull(shard"),
      s"shard pruning predicate missing:\n$p")
    // the shard column arithmetic agrees between driver and executors
    val stored = spark.read.parquet(dir).filter(col("t") === "cat")
      .select("shard").distinct().as[Int].collect().toSeq
    assert(stored == Seq(shard.toInt))
  }

  test("streaming append: disjoint batches accumulate, replays skip, compact preserves") {
    val d3 = java.nio.file.Files.createTempDirectory("tindex3").toString
    val b0 = Seq((1L, "alpha beta"), (2L, "alpha gamma")).toDF("doc_id", "text")
    val b1 = Seq((3L, "alpha beta beta")).toDF("doc_id", "text")
    graft.streaming.StreamingIngest.writeTextBatchIdempotent(b0, 0L, d3, "t")
    graft.streaming.StreamingIngest.writeTextBatchIdempotent(b1, 1L, d3, "t")
    def hits = TextIndex.searchAll(spark, d3, Seq("alpha", "beta"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(hits == Seq((1L, 2L), (3L, 3L)))
    // replayed batch (same id) must be a no-op, not a double append
    graft.streaming.StreamingIngest.writeTextBatchIdempotent(b1, 1L, d3, "t")
    assert(hits == Seq((1L, 2L), (3L, 3L)))
    // compaction merges the per-batch files, results unchanged
    val filesBefore = shardFiles(d3)
    TextIndex.compact(spark, d3)
    assert(hits == Seq((1L, 2L), (3L, 3L)))
    assert(shardFiles(d3) <= filesBefore)
    assert(new java.io.File(d3).listFiles().map(_.getName)
      .count(_.startsWith("shard=")) > 0)
  }

  private def shardFiles(d: String): Int =
    new java.io.File(d).listFiles().filter(_.getName.startsWith("shard="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))

  test("ensure is idempotent; a foreign shard count fails loudly") {
    val d2 = java.nio.file.Files.createTempDirectory("tindex2").toString
    assert(TextIndex.ensure(docs, d2), "first ensure writes")
    assert(!TextIndex.ensure(docs, d2), "second ensure reuses")
    // corrupt the manifest to simulate an index from a different layout
    // (through the Hadoop fs so the checksum sidecar stays consistent)
    val root = new org.apache.hadoop.fs.Path(d2)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new org.apache.hadoop.fs.Path(root, TextIndex.ManifestFile), true)
    try out.write("""{"shards":8}""".getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalStateException] {
      TextIndex.searchAll(spark, d2, Seq("cat"))
    }
    assert(e.getMessage.contains("8 shards"))
    // and ensure() rebuilds it
    assert(TextIndex.ensure(docs, d2), "diverged layout rebuilds")
  }
}
