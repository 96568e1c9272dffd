package graft.store

import graft.SparkSuite
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Persisted band index: probe parity with the in-memory probePairs,
  * shard pruning at file-listing time, append growth, meta guards. */
class BandIndexSpec extends SparkSuite {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/idx"

  // 10-token docs, each with a unique token so sketches differ
  private def doc(i: Long) =
    s"alpha bravo charlie delta echo token$i foxtrot golf hotel india$i"

  test("probeCandidates matches the in-memory probePairs exactly") {
    import spark.implicits._
    val corpus = (0L until 50L).map(i => (i, doc(i))).toDF("doc_id", "text")
    // batch: 5 exact dups of corpus docs (ids shifted), 5 fresh
    val batch = ((0L until 5L).map(i => (1000L + i, doc(i))) ++
      (5L until 10L).map(i => (2000L + i, s"zulu yankee xray$i whiskey victor uniform tango sierra"))
      ).toDF("doc_id", "text")
    val idxSketch = Dedup.docSketch(corpus)
    val probeSketch = Dedup.docSketch(batch)
    val p = tmp("bandidx_parity")
    BandIndex.write(idxSketch, p)
    val got = BandIndex.probeCandidates(spark, p,
        Dedup.bandRows(probeSketch, "doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    val want = Dedup.probePairs(Dedup.bandRows(idxSketch, "doc_id"),
        Dedup.bandRows(probeSketch, "doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(got === want)
    // every exact dup found (J = 1 collides in every band)
    (0L until 5L).foreach(i => assert(got.contains((i, 1000L + i)), s"dup $i"))
  }

  test("probe prunes the bands scan to the batch's shards at file-listing time") {
    import spark.implicits._
    val corpus = (0L until 60L).map(i => (i, doc(i))).toDF("doc_id", "text")
    val p = tmp("bandidx_prune")
    BandIndex.write(Dedup.docSketch(corpus), p)
    // one probe doc → at most Bands distinct signatures → ≤ Bands shards
    // (AQE off for the assertion: the adaptive wrapper hides the scan
    // node from a pre-execution collect; the listing itself is
    // AQE-independent — static partition filters prune at plan time)
    val one = Seq((999L, doc(7))).toDF("doc_id", "text")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scan = try {
      val q = BandIndex.probeCandidates(spark, p,
        Dedup.bandRows(Dedup.docSketch(one), "doc_id"), "doc_id")
      q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    assert(scan.partitionFilters.nonEmpty, "no partition filter on the bands scan")
    val surviving = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.values.getInt(0)).sorted
    val total = new java.io.File(s"$p/bands").list().count(_.startsWith("shard="))
    assert(surviving.length <= Dedup.Bands,
      s"probe must touch <= ${Dedup.Bands} shards, got ${surviving.toSeq}")
    assert(surviving.length < total,
      s"pruning must drop shards ($total present, ${surviving.length} survive)")
  }

  test("append grows the index; probes see appended docs; meta guards layout") {
    import spark.implicits._
    val p = tmp("bandidx_append")
    // append before write refuses
    val first = (0L until 30L).map(i => (i, doc(i))).toDF("doc_id", "text")
    intercept[IllegalStateException] {
      BandIndex.append(Dedup.docSketch(first), p)
    }
    BandIndex.write(Dedup.docSketch(first), p)
    val second = (30L until 50L).map(i => (i, doc(i))).toDF("doc_id", "text")
    BandIndex.append(Dedup.docSketch(second), p)
    assert(BandIndex.sketches(spark, p).count() === 50L)
    // an exact dup of an APPENDED doc is found through the grown layout
    val probe = Seq((5000L, doc(42))).toDF("doc_id", "text")
    val got = BandIndex.probeCandidates(spark, p,
        Dedup.bandRows(Dedup.docSketch(probe), "doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(got.contains((42L, 5000L)), s"got $got")
  }

  test("delete hides a doc immediately; compact folds tombstones and small files") {
    import spark.implicits._
    val p = tmp("bandidx_compact")
    BandIndex.write(Dedup.docSketch(
      (0L until 30L).map(i => (i, doc(i))).toDF("doc_id", "text")), p)
    BandIndex.append(Dedup.docSketch(
      (30L until 60L).map(i => (i, doc(i))).toDF("doc_id", "text")), p)
    val probe = Dedup.bandRows(Dedup.docSketch(
      Seq((7000L, doc(3)), (7001L, doc(45))).toDF("doc_id", "text")), "doc_id")
    def probeNow() = BandIndex.probeCandidates(spark, p, probe, "doc_id")
      .as[(Long, Long)].collect().toSet
    val before = probeNow()
    assert(before.contains((3L, 7000L)) && before.contains((45L, 7001L)))
    // tombstone doc 3: every probe and the sketches view hide it NOW
    BandIndex.delete(spark, p, Seq(3L))
    val afterDel = probeNow()
    assert(!afterDel.exists(_._1 == 3L), s"tombstoned doc still probed: $afterDel")
    assert(afterDel.contains((45L, 7001L)))
    assert(BandIndex.sketches(spark, p).filter(col("doc_id") === 3L).count() === 0)
    // compact: folds the tombstone physically (both sharded layouts ride
    // SaltedStore.compact's marker-guarded swap), coalesces per-batch
    // small files, clears the markers; probe semantics unchanged
    BandIndex.compact(spark, p)
    for (dir <- Seq("bands", "sketches")) {
      val shards = new java.io.File(s"$p/$dir").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      assert(shards.nonEmpty, dir)
      shards.foreach { s =>
        val files = s.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length === 1, s"$dir/${s.getName}: ${files.length} files")
      }
    }
    assert(!new java.io.File(s"$p/_deletes").exists, "tombstones must clear")
    assert(spark.read.parquet(s"$p/bands").filter(col("doc_id") === 3L).count() === 0,
      "folded rows must be physically gone")
    assert(probeNow() === afterDel)
    assert(BandIndex.sketches(spark, p).count() === 59)
  }
}
