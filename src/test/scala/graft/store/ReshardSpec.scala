package graft.store

import graft.SparkSuite
import graft.pipeline.{Dedup, TextIndex}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Shard-count migrations (TextIndex.reshard / BandIndex.reshard) on the
  * shared StagedSwap protocol: probe results invariant across the
  * migration, tombstones folded, probes refuse mid-migration layouts,
  * mismatched resumes refused. (Crash-phase resume of the protocol
  * itself is pinned by ResaltSpec and VectorReclusterSpec — one shared
  * implementation, tested once per phase.) */
class ReshardSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/idx"

  private def fsOf(dir: String) = {
    val root = new Path(dir)
    (root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  // --- text index -----------------------------------------------------

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog chased the cat"),
    (3L, "a bird sang a song of spring"),
    (4L, "cat and dog and bird together"),
    (5L, "entirely unrelated words here")).toDF("doc_id", "text")

  private def ranked(dir: String) =
    TextIndex.searchRanked(spark, dir, Seq("cat", "dog"))
      .collect().map(_.toString).toSeq

  test("text reshard 4 -> 9: search results identical, manifest updated") {
    val dir = tmp("treshard")
    TextIndex.write(docs, dir, shards = 4)
    val before = ranked(dir)
    TextIndex.reshard(spark, dir, 9)
    assert(TextIndex.storedShards(spark, dir).contains(9))
    assert(ranked(dir) === before)
  }

  test("text reshard folds pending tombstones; new generation starts clean") {
    val dir = tmp("treshard_del")
    TextIndex.write(docs, dir, shards = 4)
    TextIndex.delete(spark, dir, Seq(2L))
    TextIndex.reshard(spark, dir, 7)
    assert(!TextIndex.hasPendingDeletes(spark, dir))
    val hits = TextIndex.searchAll(spark, dir, Seq("dog"))
      .select("doc_id").as[Long].collect().toSet
    assert(hits === Set(4L)) // doc 2 physically gone
  }

  test("text probes refuse a standing reshard marker; mismatched resume refused") {
    val dir = tmp("treshard_guard")
    TextIndex.write(docs, dir, shards = 4)
    val (fs, root) = fsOf(dir)
    val m = fs.create(new Path(root, TextIndex.ReshardMarker), true)
    try m.writeUTF("shards=9") finally m.close()
    val e = intercept[IllegalArgumentException](ranked(dir))
    assert(e.getMessage.contains("in-flight shard migration"))
    val e2 = intercept[IllegalArgumentException](TextIndex.reshard(spark, dir, 5))
    assert(e2.getMessage.contains("in-flight migration targets shard count"))
  }

  // --- band index -----------------------------------------------------

  private def bdoc(i: Long) =
    s"alpha bravo charlie delta echo token$i foxtrot golf hotel india$i"

  test("band reshard 64 -> 17: probe candidates identical, meta updated") {
    val corpus = (0L until 40L).map(i => (i, bdoc(i))).toDF("doc_id", "text")
    val batch = (0L until 5L).map(i => (1000L + i, bdoc(i))).toDF("doc_id", "text")
    val dir = tmp("breshard")
    BandIndex.write(Dedup.docSketch(corpus), dir)
    val probeBands = Dedup.bandRows(Dedup.docSketch(batch), "doc_id")
    val before = BandIndex.probeCandidates(spark, dir, probeBands, "doc_id")
      .as[(Long, Long)].collect().toSet
    BandIndex.reshard(spark, dir, 17)
    assert(BandIndex.storedShards(spark, dir).contains(17))
    val after = BandIndex.probeCandidates(spark, dir, probeBands, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(after === before)
    // sketches co-migrated: every corpus doc's verification set survives
    assert(BandIndex.sketches(spark, dir).count() === 40L)
  }

  test("band reshard folds tombstones; probes refuse mid-migration") {
    val corpus = (0L until 30L).map(i => (i, bdoc(i))).toDF("doc_id", "text")
    val dir = tmp("breshard_del")
    BandIndex.write(Dedup.docSketch(corpus), dir)
    BandIndex.delete(spark, dir, Seq(3L))
    BandIndex.reshard(spark, dir, 11)
    assert(BandIndex.sketches(spark, dir)
      .filter(col("doc_id") === 3L).isEmpty)
    val (fs, root) = fsOf(dir)
    assert(!fs.exists(new Path(root, "_deletes")))
    val m = fs.create(new Path(root, BandIndex.ReshardMarker), true)
    try m.writeUTF("shards=11") finally m.close()
    val e = intercept[IllegalArgumentException](
      BandIndex.storedShards(spark, dir))
    assert(e.getMessage.contains("in-flight shard migration"))
  }
}
