package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The listing-free manifest read: content parity with the listing
  * read, the owner's drop-before-mutate / rewrite-at-rest lifecycle,
  * and the fallback when no manifest stands. The existing GramIndex/
  * BandIndex parity suites exercise the manifest path end-to-end (every
  * probe now routes through it by default); this spec pins the manifest
  * machinery itself. */
class FileManifestSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/idx"

  private def doc(i: Long) =
    s"alpha bravo charlie delta echo token$i foxtrot golf hotel india$i"

  private def setsOf(df: org.apache.spark.sql.DataFrame) =
    graft.pipeline.TextAnalysis.shingleRows(df)
      .withColumn("x", graft.pipeline.Dedup.baseHash32(col("s")))
      .select("doc_id", "x").distinct()

  test("manifest read = listing read, bit for bit, on every gram layer") {
    val p = tmp("fmanifest_parity")
    GramIndex.write(setsOf(
      (0L until 40L).map(i => (i, doc(i))).toDF("doc_id", "text")), p,
      nShards = 16)
    for (layer <- Seq("postings", "dfs", "profiles")) {
      assert(FileManifest.exists(spark, s"$p/$layer"), s"$layer manifest missing")
      val shards = Seq(0L, 3L, 7L, 15L)
      val viaManifest = FileManifest
        .readPartitions(spark, s"$p/$layer", shards).get
      val viaListing = SaltedStore.readPartitions(spark, s"$p/$layer", shards,
        partitionPrefix = "shard")
      assert(viaManifest.columns.sorted.toSeq === viaListing.columns.sorted.toSeq,
        s"$layer schema diverged")
      val cols = viaManifest.columns.filterNot(_ == "sh").sorted.map(col)
      assert(viaManifest.select(cols: _*).except(viaListing.select(cols: _*)).isEmpty &&
        viaListing.select(cols: _*).except(viaManifest.select(cols: _*)).isEmpty,
        s"$layer rows diverged")
      assert(viaManifest.count() === viaListing.count())
    }
  }

  test("the manifest scan plans ZERO listing work — its file index is the manifest") {
    val p = tmp("fmanifest_plan")
    GramIndex.write(setsOf(
      (0L until 20L).map(i => (i, doc(i))).toDF("doc_id", "text")), p,
      nShards = 8)
    val df = FileManifest.readPartitions(spark, s"$p/postings", Seq(1L, 2L)).get
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    scans.foreach(s => assert(
      s.relation.location.isInstanceOf[ManifestFileIndex],
      s"scan built an InMemoryFileIndex (listing) instead of the manifest"))
    // and partition pruning still binds: a shard filter prunes files
    val pruned = df.filter(col("shard") === 1)
    assert(pruned.count() <= df.count())
  }

  test("owner lifecycle: compact drops the manifest first, rewrites it at rest; fallback serves meanwhile") {
    val p = tmp("fmanifest_lifecycle")
    GramIndex.write(setsOf(
      (0L until 30L).map(i => (i, doc(i))).toDF("doc_id", "text")), p)
    assert(FileManifest.exists(spark, s"$p/postings"))
    // simulate the mid-maintenance window: manifest dropped, files live
    FileManifest.delete(spark, s"$p/postings")
    assert(FileManifest.readPartitions(spark, s"$p/postings", Seq(0L)).isEmpty)
    // probes still answer exactly (listing fallback) — the brute parity
    val batch = Seq((9000L, doc(7).split(" ").dropRight(2).mkString(" ")))
      .toDF("doc_id", "text")
    val got = GramIndex.probeContainment(spark, p, setsOf(batch))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.contains((9000L, 7L, 1.0)), s"fallback probe lost the answer: $got")
    // compact restores the manifest (and the listing-free path)
    GramIndex.compact(spark, p)
    assert(FileManifest.exists(spark, s"$p/postings"))
    assert(FileManifest.exists(spark, s"$p/dfs"))
    val got2 = GramIndex.probeContainment(spark, p, setsOf(batch))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got2 === got)
  }

  test("a standing compact marker disables the manifest path (stale-read guard)") {
    val p = tmp("fmanifest_marker")
    GramIndex.write(setsOf(
      (0L until 10L).map(i => (i, doc(i))).toDF("doc_id", "text")), p)
    val layer = s"$p/postings"
    assert(FileManifest.readPartitions(spark, layer, Seq(0L, 1L)).nonEmpty)
    val marker = new org.apache.hadoop.fs.Path(layer, SaltedStore.CompactingMarker)
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(marker, true).close()
    try assert(FileManifest.readPartitions(spark, layer, Seq(0L, 1L)).isEmpty,
      "manifest served a read under a foreign compactor's marker")
    finally fs.delete(marker, false)
  }

  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("a CORRUPTED manifest (entries the regex drops) degrades to the listing fallback, loudly — never missing rows") {
    val p = tmp("fmanifest_corrupt")
    GramIndex.write(setsOf(
      (0L until 20L).map(i => (i, doc(i))).toDF("doc_id", "text")), p,
      nShards = 8)
    val layer = s"$p/postings"
    val mf = new org.apache.hadoop.fs.Path(layer, FileManifest.ManifestFile)
    val fs = fsOf(layer)
    // read the manifest, mangle ONE file entry so the regex skips it
    // (the silent-shrink hazard): the parsed count then disagrees with
    // the stored nfiles total and the read must refuse itself
    val in = fs.open(mf)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val mangled = txt.replaceFirst("""\["shard""", """[@"shard""")
    assert(mangled != txt)
    val out = fs.create(mf, true)
    try out.write(mangled.getBytes("UTF-8")) finally out.close()
    assert(FileManifest.readPartitions(spark, layer, (0L until 8L)).isEmpty,
      "a manifest whose parsed file count disagrees with nfiles must not serve")
    // probes stay exact through the listing fallback
    val batch = Seq((9000L, doc(7).split(" ").dropRight(2).mkString(" ")))
      .toDF("doc_id", "text")
    val got = GramIndex.probeContainment(spark, p, setsOf(batch))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((9000L, 7L)))
  }

  test("a STALE manifest (file deleted outside the owner's lifecycle) degrades to the listing fallback") {
    val p = tmp("fmanifest_stale")
    GramIndex.write(setsOf(
      (0L until 20L).map(i => (i, doc(i))).toDF("doc_id", "text")), p,
      nShards = 4)
    val layer = s"$p/profiles"
    val fs = fsOf(layer)
    // foreign mutation: delete one recorded data file (but keep the dir)
    val shardDirs = fs.listStatus(new org.apache.hadoop.fs.Path(layer))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
    val victim = fs.listStatus(shardDirs.head.getPath)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_")).head.getPath
    fs.delete(victim, false)
    // the spot-check sees the hole and falls back instead of letting the
    // scan die with a task-level FileNotFoundException
    val vShard = shardDirs.head.getPath.getName.stripPrefix("shard=").toLong
    assert(FileManifest.readPartitions(spark, layer, Seq(vShard)).isEmpty,
      "a manifest listing a deleted file must fall back, not FileNotFound")
  }

  test("write() refuses foreign names the regex parser would silently drop") {
    val p = tmp("fmanifest_badnames") + "/layout"
    val fs = fsOf(p)
    // a partition dir whose value is not a plain integer
    fs.mkdirs(new org.apache.hadoop.fs.Path(p, "shard=x7"))
    val e1 = intercept[IllegalArgumentException] {
      FileManifest.write(spark, p)
    }
    assert(e1.getMessage.contains("plain non-negative integer"))
    fs.delete(new org.apache.hadoop.fs.Path(p, "shard=x7"), true)
    // a data file name carrying a JSON/regex metacharacter
    fs.mkdirs(new org.apache.hadoop.fs.Path(p, "shard=0"))
    fs.create(new org.apache.hadoop.fs.Path(p, "shard=0/we[i]rd]name.parquet"),
      true).close()
    val e2 = intercept[IllegalArgumentException] {
      FileManifest.write(spark, p)
    }
    assert(e2.getMessage.contains("metacharacter"))
  }
}
