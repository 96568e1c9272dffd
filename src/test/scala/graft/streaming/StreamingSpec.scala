package graft.streaming

import graft.SparkSuite
import graft.keys.HashPrefix
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import java.sql.Timestamp

class StreamingSpec extends SparkSuite {
  import StreamingIngest._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("salted streaming ingest appends bucketed sorted parquet per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("salted_stream").toString
    val ckpt = Files.createTempDirectory("salted_stream_ckpt").toString

    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("k", "v")
    val dist = HashPrefix(8)
    val q = saltedWriter(stream, col("k"), dist, dir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())

    mem.addData((1L to 500L).map(i => (i, i * 0.5)): _*)
    val run1 = q.start(); run1.awaitTermination()
    mem.addData((501L to 1000L).map(i => (i, i * 0.5)): _*)
    val run2 = q.start(); run2.awaitTermination()

    val back = spark.read.parquet(dir)
    assert(back.count() === 1000)
    // every row in the bucket the hash distributor assigns
    val misplaced = back.filter(col("bucket") =!= graft.keys.Hash31.bucket(col("k"), 8)).count()
    assert(misplaced === 0)
    // all 8 buckets took writes (the point of salting)
    assert(back.select("bucket").distinct().count() === 8)
  }

  test("replayed micro-batch (same batchId) does not duplicate rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("idempotent_sink").toString
    val dist = HashPrefix(4)
    val batch = (1L to 100L).map(i => (i, i * 0.5)).toDF("k", "v")
    writeBatchIdempotent(batch, batchId = 0L, col("k"), dist, dir)
    // failure replay: same batchId arrives again → skipped via commit log
    writeBatchIdempotent(batch, batchId = 0L, col("k"), dist, dir)
    assert(spark.read.parquet(dir).count() === 100)
    // the next batchId appends normally
    val batch2 = (101L to 150L).map(i => (i, i * 0.5)).toDF("k", "v")
    writeBatchIdempotent(batch2, batchId = 1L, col("k"), dist, dir)
    assert(spark.read.parquet(dir).count() === 150)
  }

  test("streaming vector-index ingest: cells assigned, appends idempotent, probes see growth") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("vindex_stream").toString
    val ckpt = Files.createTempDirectory("vindex_stream_ckpt").toString
    val D = 8
    val rnd = new scala.util.Random(3)
    def vec() = Seq.fill(D)(rnd.nextDouble() * 2 - 1)
    val cents: IndexedSeq[Seq[Double]] = IndexedSeq.fill(4)(vec())

    val mem = MemoryStream[(Long, Seq[Double])]
    val stream = mem.toDF().toDF("vec_id", "v")
    val q = vectorIndexWriter(stream, col("v"), cents, dir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())

    val batch1 = (0L until 100L).map(i => (i, vec()))
    mem.addData(batch1: _*)
    val run1 = q.start(); run1.awaitTermination()
    val n1 = graft.pipeline.VectorIndex.read(spark, dir).count()
    assert(n1 === 100)

    val batch2 = (100L until 180L).map(i => (i, vec()))
    mem.addData(batch2: _*)
    val run2 = q.start(); run2.awaitTermination()
    val idx = graft.pipeline.VectorIndex.read(spark, dir)
    assert(idx.count() === 180)
    // every appended row carries the cell its vector hashes to (frozen
    // codebook — batch and streaming assignment agree)
    val misassigned = idx.filter(col("cell").cast("bigint") =!=
      graft.functions.CentroidFunctions.nearestCentroidCosine(
        col("v"), graft.functions.VectorFunctions.dotProduct(col("v"), col("v")), cents))
      .count()
    assert(misassigned === 0)
    // replay of an already-committed batch is skipped
    writeVectorBatchIdempotent(batch1.toDF("vec_id", "v"), batchId = 0L, col("v"), cents, dir)
    assert(graft.pipeline.VectorIndex.read(spark, dir).count() === 180)
    // a static probe on the grown index reads only probed partitions
    val probeQ = vec()
    val probed = graft.pipeline.VectorIndex.probeCells(probeQ, cents, 2)
    val got = graft.pipeline.VectorIndex
      .probe(spark, dir, "vec_id", "v", probeQ, cents, nProbe = 2, k = 3).collect()
    assert(got.length === 3)
    assert(probed.length === 2)
  }

  test("streaming vector-index compaction: one file per cell, probes unchanged") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vindex_compact").toString
    val D = 8
    val rnd = new scala.util.Random(7)
    def vec() = Seq.fill(D)(rnd.nextDouble() * 2 - 1)
    val cents: IndexedSeq[Seq[Double]] = IndexedSeq.fill(4)(vec())
    // 5 micro-batches → multiple file sets accumulate per cell (the
    // memstore-accumulation problem compaction exists for)
    (0 until 5).foreach { b =>
      val batch = (b * 100L until (b + 1) * 100L).map(i => (i, vec()))
      writeVectorBatchIdempotent(batch.toDF("vec_id", "v"), b.toLong, col("v"), cents, dir)
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def cellDirs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
    def dataFiles(p: org.apache.hadoop.fs.Path) = fs.listStatus(p)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
        && !f.getPath.getName.startsWith("."))
    assert(cellDirs.nonEmpty)
    assert(cellDirs.exists(c => dataFiles(c.getPath).length > 1),
      "test setup: expected multi-file cells before compaction")
    val probeQ = vec()
    def probeNow() = graft.pipeline.VectorIndex
      .probe(spark, dir, "vec_id", "v", probeQ, cents, nProbe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val before = probeNow()
    graft.pipeline.VectorIndex.compact(spark, dir, "vec_id")
    cellDirs.foreach(c => assert(dataFiles(c.getPath).length == 1,
      s"${c.getPath} not compacted to one file"))
    assert(probeNow() === before)
    // the codebook manifest survives (compaction never re-assigns cells)
    assert(graft.pipeline.VectorIndex.storedCodebookHash(spark, dir)
      === Some(graft.pipeline.VectorIndex.codebookHash(cents)))
    // and the streaming commit log survives: a replayed batch stays skipped
    writeVectorBatchIdempotent(
      (0L until 100L).map(i => (i, vec())).toDF("vec_id", "v"), 0L, col("v"), cents, dir)
    assert(graft.pipeline.VectorIndex.read(spark, dir).count() === 500)
  }

  test("tumbling window counts with watermark drop late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = tumblingCounts(
      mem.toDF().toDF("ts", "event_type", "value"),
      "ts", watermarkDelay = "10 seconds", windowLen = "1 minute")

    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("tumbling").start()

    mem.addData(
      (ts("2026-01-01 00:00:10"), "click", 1.0),
      (ts("2026-01-01 00:00:50"), "click", 2.0),
      (ts("2026-01-01 00:01:05"), "view", 3.0))
    q.processAllAvailable()
    // advance watermark past minute 0 → its windows finalize
    mem.addData((ts("2026-01-01 00:03:00"), "view", 4.0))
    q.processAllAvailable()
    // this row is far behind the watermark (00:02:50) → dropped
    mem.addData((ts("2026-01-01 00:00:30"), "click", 99.0))
    q.processAllAvailable()
    mem.addData((ts("2026-01-01 00:05:00"), "view", 5.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("tumbling")
      .select("window_start", "event_type", "cnt", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(rows.contains((ts("2026-01-01 00:00:00"), "click", 2L, 3.0))) // late row NOT counted
    assert(rows.contains((ts("2026-01-01 00:01:00"), "view", 1L, 3.0)))
  }

  test("sliding windows assign rows to every overlapping window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = slidingCounts(mem.toDF().toDF("ts", "event_type", "value"),
      "ts", watermarkDelay = "0 seconds", windowLen = "2 minutes", slide = "1 minute")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("sliding").start()
    mem.addData((ts("2026-01-01 00:01:30"), "click", 1.0))
    q.processAllAvailable()
    mem.addData((ts("2026-01-01 00:30:00"), "view", 1.0)) // advance watermark
    q.processAllAvailable()
    q.stop()
    val wins = spark.table("sliding").filter($"event_type" === "click")
      .select("window_start").as[Timestamp].collect().toSet
    // a 2m window sliding 1m → the 00:01:30 click lands in two windows
    assert(wins === Set(ts("2026-01-01 00:00:00"), ts("2026-01-01 00:01:00")))
  }

  test("dedupWithinWatermark drops repeats inside the horizon, keeps state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val deduped = dedupWithinWatermark(
      mem.toDF().toDF("id", "ts"), "ts", "10 minutes", "id")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup").start()

    mem.addData((1L, ts("2026-01-01 00:00:00")), (2L, ts("2026-01-01 00:00:30")))
    q.processAllAvailable()
    // id 1 again within the horizon → dropped; id 3 is new → kept
    mem.addData((1L, ts("2026-01-01 00:01:00")), (3L, ts("2026-01-01 00:02:00")))
    q.processAllAvailable()
    // push watermark far past the horizon, then id 1 may legally reappear
    mem.addData((99L, ts("2026-01-01 01:00:00")))
    q.processAllAvailable()
    mem.addData((1L, ts("2026-01-01 00:59:00")))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup").select("id").as[Long].collect().toList
    assert(ids.count(_ == 1L) === 2, s"id 1 once per horizon, got $ids")
    assert(ids.count(_ == 2L) === 1 && ids.count(_ == 3L) === 1)
  }

  test("parquet file-source stream: windowed counts equal the batch result") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events_stream_src").toString
    val rows = (0 until 600).map { i =>
      (new Timestamp(ts("2026-01-01 00:00:00").getTime + i * 1000L),
        if (i % 3 == 0) "click" else "view", i.toDouble)
    }
    rows.toDF("ts", "event_type", "value").write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .parquet(dir)
    val agg = tumblingCounts(stream, "ts", "1 minute", "5 minutes")
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("filestream").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("filestream")
      .select("window_start", "event_type", "cnt")
      .as[(Timestamp, String, Long)].collect().toSet
    val batch = rows.toDF("ts", "event_type", "value")
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start", $"event_type", $"cnt")
      .as[(Timestamp, String, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("trending top-k ranks closed windows exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Timestamp, String, Long, Int)]
    val writer = trendingTopK(
      mem.toDF().toDF("ts", "item"), "ts", "item",
      watermarkDelay = "0 seconds", windowLen = "1 minute", k = 2) { (ranked, _) =>
      out ++= ranked.select("window_start", "item", "cnt", "rnk")
        .as[(Timestamp, String, Long, Int)].collect()
    }
    val q = writer.start()
    // minute 0: a×3, b×2, c×1 → top-2 is (a, b)
    mem.addData(
      (ts("2026-01-01 00:00:01"), "a"), (ts("2026-01-01 00:00:02"), "a"),
      (ts("2026-01-01 00:00:03"), "a"), (ts("2026-01-01 00:00:10"), "b"),
      (ts("2026-01-01 00:00:11"), "b"), (ts("2026-01-01 00:00:20"), "c"))
    q.processAllAvailable()
    // advance the watermark past minute 0 so its window closes
    mem.addData((ts("2026-01-01 00:05:00"), "z"))
    q.processAllAvailable()
    q.stop()
    val m0 = out.filter(_._1 == ts("2026-01-01 00:00:00"))
      .map(r => (r._2, r._3, r._4)).toSet
    assert(m0 === Set(("a", 3L, 1), ("b", 2L, 2)))
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val joined = clickAttribution(
      clicks.toDF().toDF("user_id", "event_id", "ts"),
      purchases.toDF().toDF("user_id", "event_id", "ts"),
      watermarkDelay = "1 minute", windowSec = 600L)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attribution").start()

    clicks.addData((1L, 100L, ts("2026-01-01 00:00:00")),
                   (1L, 101L, ts("2026-01-01 00:08:00")),
                   (2L, 102L, ts("2026-01-01 00:00:00")))
    // u1 buys 9 min after click 100 (in-window for both clicks);
    // u2 buys 20 min after click 102 (outside the 10-min window);
    // u3 buys with no clicks at all
    purchases.addData((1L, 200L, ts("2026-01-01 00:09:00")),
                      (2L, 201L, ts("2026-01-01 00:20:00")),
                      (3L, 202L, ts("2026-01-01 00:05:00")))
    q.processAllAvailable()
    // advance both watermarks so results finalize
    clicks.addData((98L, 999L, ts("2026-01-01 01:00:00")))
    purchases.addData((99L, 998L, ts("2026-01-01 01:00:00")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("attribution")
      .select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 100L, 200L), (1L, 101L, 200L)))
  }

  test("LEFT OUTER stream-stream join emits unmatched clicks after eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val joined = clickAttributionOuter(
      clicks.toDF().toDF("user_id", "event_id", "ts"),
      purchases.toDF().toDF("user_id", "event_id", "ts"),
      watermarkDelay = "1 minute", windowSec = 600L)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attribution_outer").start()

    clicks.addData((1L, 100L, ts("2026-01-01 00:00:00")),
                   (2L, 102L, ts("2026-01-01 00:00:00")))
    // u1 buys in-window; u2's purchase misses the 10-min window
    purchases.addData((1L, 200L, ts("2026-01-01 00:09:00")),
                      (2L, 201L, ts("2026-01-01 00:20:00")))
    q.processAllAvailable()
    // the unmatched click must NOT have been emitted yet: the watermark
    // hasn't proven its window empty
    val early = spark.table("attribution_outer")
      .select("click_id").as[Long].collect().toSet
    assert(!early.contains(102L),
      "outer row emitted before state eviction could prove it unmatched")
    // advance both watermarks well past the join window + delay
    clicks.addData((98L, 999L, ts("2026-01-01 01:00:00")))
    purchases.addData((99L, 998L, ts("2026-01-01 01:00:00")))
    q.processAllAvailable()
    clicks.addData((98L, 997L, ts("2026-01-01 02:00:00")))
    purchases.addData((99L, 996L, ts("2026-01-01 02:00:00")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("attribution_outer")
      .filter($"user_id" < 90)
      .select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Option[Long])].collect().toSet
    // matched row intact; the out-of-window click surfaces exactly once,
    // with a null purchase
    assert(got === Set((1L, 100L, Some(200L)), (2L, 102L, None)))
  }

  test("gap sessionization via flatMapGroupsWithState matches batch replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Click]
    val sessions = sessionize(mem.toDS(), gapMs = 30000L, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()

    // user 1: two sessions (gap 40s between click 2 and 3); user 2: one
    mem.addData(
      Click(1, ts("2026-01-01 00:00:00")), Click(1, ts("2026-01-01 00:00:20")),
      Click(1, ts("2026-01-01 00:01:00")),
      Click(2, ts("2026-01-01 00:00:05")))
    q.processAllAvailable()
    // push watermark far ahead so event-time timeouts fire and close all
    mem.addData(Click(99, ts("2026-01-01 01:00:00")))
    q.processAllAvailable()
    mem.addData(Click(99, ts("2026-01-01 02:00:00")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions")
      .filter($"user_id" < 99)
      .select("user_id", "start", "end", "clicks")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(got === Set(
      (1L, ts("2026-01-01 00:00:00"), ts("2026-01-01 00:00:20"), 2L),
      (1L, ts("2026-01-01 00:01:00"), ts("2026-01-01 00:01:00"), 1L),
      (2L, ts("2026-01-01 00:00:05"), ts("2026-01-01 00:00:05"), 1L)))

    // batch replay over the same rows gives the same sessions
    val batch = Seq((1L, 0L), (1L, 20000000L), (1L, 60000000L), (2L, 5000000L))
      .toDF("user_id", "ts_us")
    val replay = sessionizeBatch(batch, gapUs = 30000000L)
      .select("user_id", "sess_start", "sess_end", "clicks")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(replay === Set(
      (1L, 0L, 20000000L, 2L), (1L, 60000000L, 60000000L, 1L),
      (2L, 5000000L, 5000000L, 1L)))
  }

  test("streaming band-index ingest: bootstrap, append, replay skip, probes see growth") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("bandidx_stream").toString + "/idx"
    val ckpt = Files.createTempDirectory("bandidx_ckpt").toString
    def doc(i: Long) =
      s"alpha bravo charlie delta echo token$i foxtrot golf hotel india$i"
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = bandIndexWriter(stream, dir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
    mem.addData((0L until 20L).map(i => (i, doc(i))): _*)
    val r1 = q.start(); r1.awaitTermination()
    assert(graft.store.BandIndex.sketches(spark, dir).count() === 20)
    mem.addData((20L until 30L).map(i => (i, doc(i))): _*)
    val r2 = q.start(); r2.awaitTermination()
    assert(graft.store.BandIndex.sketches(spark, dir).count() === 30)
    // replay of an already-committed batch is skipped
    writeBandBatchIdempotent(
      (0L until 20L).map(i => (i, doc(i))).toDF("doc_id", "text"), 0L, dir)
    assert(graft.store.BandIndex.sketches(spark, dir).count() === 30)
    // an exact dup of a SECOND-batch doc is found through the grown layout
    val probe = Seq((9000L, doc(25))).toDF("doc_id", "text")
    val got = graft.store.BandIndex.probeCandidates(spark, dir,
        graft.pipeline.Dedup.bandRows(
          graft.pipeline.Dedup.docSketch(probe), "doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(got.contains((25L, 9000L)), s"got $got")
  }

  test("streaming gram-index ingest: bootstrap, append, replay skip, containment probes see growth") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("gramidx_stream").toString + "/idx"
    val ckpt = Files.createTempDirectory("gramidx_ckpt").toString
    // alternating unique/common tokens: every 3-shingle carries a
    // doc-unique token, so cross-doc containment is exactly 0 and the
    // only qualifying pairs are planted ones
    def doc(i: Long) =
      s"alpha$i bravo charlie$i delta echo$i foxtrot golf$i hotel india$i juliet kilo$i lima"
    def gsets(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.TextAnalysis.shingleRows(df)
        .withColumn("x", graft.pipeline.Dedup.baseHash32(col("s")))
        .select("doc_id", "x").distinct()
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = gramIndexWriter(stream, dir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
    mem.addData((0L until 20L).map(i => (i, doc(i))): _*)
    val r1 = q.start(); r1.awaitTermination()
    mem.addData((20L until 30L).map(i => (i, doc(i))): _*)
    val r2 = q.start(); r2.awaitTermination()
    // replay of an already-committed batch is skipped
    writeGramBatchIdempotent(
      (0L until 20L).map(i => (i, doc(i))).toDF("doc_id", "text"), 0L, dir)
    // a truncation of a SECOND-batch doc is contained at exactly 1.0
    // through the grown layout (dfs folded across both appends)
    val probe = Seq((9000L, doc(25).split(" ").dropRight(2).mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.store.GramIndex.probeContainment(spark, dir, gsets(probe))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got === Map((9000L, 25L) -> 1.0), s"got $got")
  }

  test("containment screen at ingest: within-batch + against-index drops, replay skip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("gram_screen_stream").toString + "/idx"
    def doc(i: Long) =
      s"alpha$i bravo charlie$i delta echo$i foxtrot golf$i hotel india$i juliet kilo$i lima"
    def trunc(i: Long) = doc(i).split(" ").dropRight(2).mkString(" ")
    // batch 1 (bootstrap): 10 docs + a truncation of doc 3 at a larger
    // id — contained within-batch (na < nb), never enters the index
    val b1 = ((0L until 10L).map(i => (i, doc(i))) :+ (500L, trunc(3)))
      .toDF("doc_id", "text")
    val s1 = screenGramBatchIdempotent(b1, batchId = 0L, dir)
    assert(s1.map(_.toList) === Some((0L until 10L).toList))
    // batch 2: a truncation of an INDEXED doc (7) → index drop; a fresh
    // doc → kept; an identical pair → the larger id drops (tie rule)
    val b2 = Seq((600L, trunc(7)), (601L, doc(777L)),
      (602L, doc(888L)), (603L, doc(888L))).toDF("doc_id", "text")
    val s2 = screenGramBatchIdempotent(b2, batchId = 1L, dir)
    assert(s2.map(_.toList) === Some(List(601L, 602L)))
    // replay of batch 1 is skipped BEFORE the probe (else its own rows
    // in the index would screen the whole batch out)
    val s1r = screenGramBatchIdempotent(b1, batchId = 0L, dir)
    assert(s1r.isEmpty)
    // the index holds exactly the survivors (batch-2's live in an
    // unfolded delta segment until compact folds them into the base)
    graft.store.GramIndex.compact(spark, dir)
    val profiles = spark.read.parquet(s"$dir/profiles")
      .select("doc_id").as[Long].collect().toSet
    assert(profiles === ((0L until 10L).toSet ++ Set(601L, 602L)))
  }

  test("document dedup-at-ingest: within-batch + against-index drops, replay skip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("band_dedup_stream").toString + "/idx"
    def doc(i: Long) =
      s"alpha bravo charlie delta echo token$i foxtrot golf hotel india$i"
    // batch 1 (bootstrap): 10 docs + an exact dup of doc 3 at a larger id
    val b1 = ((0L until 10L).map(i => (i, doc(i))) :+ (500L, doc(3)))
      .toDF("doc_id", "text")
    val s1 = dedupBandBatchIdempotent(b1, batchId = 0L, dir)
    assert(s1.map(_.toList) === Some((0L until 10L).toList))
    // batch 2: a dup of an INDEXED doc (7), a fresh doc, a within-batch pair
    val b2 = Seq((600L, doc(7)), (601L, doc(777L)),
      (602L, doc(888L)), (603L, doc(888L))).toDF("doc_id", "text")
    val s2 = dedupBandBatchIdempotent(b2, batchId = 1L, dir)
    assert(s2.map(_.toList) === Some(List(601L, 602L)))
    assert(graft.store.BandIndex.sketches(spark, dir).count() === 12)
    // replay of batch 1 is skipped BEFORE the probe (else its own rows
    // in the index would self-dedup the whole batch)
    val s1r = dedupBandBatchIdempotent(b1, batchId = 0L, dir)
    assert(s1r.isEmpty)
    assert(graft.store.BandIndex.sketches(spark, dir).count() === 12)
  }

  test("dedup-at-ingest: within-batch and against-index dups dropped, replay safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("vindex_dedup_stream").toString
    val ckpt = Files.createTempDirectory("vindex_dedup_ckpt").toString
    val D = 8
    val rnd = new scala.util.Random(11)
    def vec() = Seq.fill(D)(rnd.nextDouble() * 2 - 1)
    val cents: IndexedSeq[Seq[Double]] = IndexedSeq.fill(4)(vec())

    val mem = MemoryStream[(Long, Seq[Double])]
    val stream = mem.toDF().toDF("vec_id", "v")
    val q = dedupVectorIndexWriter(stream, "v", "vec_id", cents, dir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())

    // batch 1 (bootstrap: no index yet, only within-batch dedup):
    // 10 distinct vectors + a x2-scaled copy of id 3 (within-batch dup,
    // bigger id -> dropped by the greedy prefix rule)
    val base = (0L until 10L).map(i => (i, vec()))
    val b1 = base :+ (50L, base(3)._2.map(_ * 2.0))
    mem.addData(b1: _*)
    val run1 = q.start(); run1.awaitTermination()
    val ids1 = graft.pipeline.VectorIndex.read(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(ids1 === (0L until 10L).toSet, s"got $ids1")

    // batch 2: a scaled copy of a STREAMED vector (id 7 -> dup against
    // the grown index), a fresh vector, and a within-batch dup pair
    val f1 = vec(); val f2 = vec()
    val b2 = Seq(
      (100L, base(7)._2.map(_ * 0.5)), // index dup (direction preserved)
      (101L, f1), // fresh
      (102L, f2), (103L, f2.map(_ * 2.0))) // within-batch pair: 103 dropped
    mem.addData(b2: _*)
    val run2 = q.start(); run2.awaitTermination()
    val ids2 = graft.pipeline.VectorIndex.read(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(ids2 === ((0L until 10L).toSet + 101L + 102L), s"got $ids2")

    // replay of batch 1 (same batchId) is SKIPPED before the probe runs:
    // its rows cannot self-dedup against their own appended copies, and
    // the index is unchanged
    dedupVectorBatchIdempotent(b1.toDF("vec_id", "v"), batchId = 0L,
      "v", "vec_id", cents, dir)
    assert(graft.pipeline.VectorIndex.read(spark, dir)
      .select("vec_id").as[Long].collect().toSet === ids2)
  }

  test("streaming CMS: merged grid equals one-shot batch grid, replay safe") {
    import spark.implicits._
    import graft.functions.CmsFunctions
    val dir = Files.createTempDirectory("cms_stream").toString
    // three "days" of traffic with overlapping keys
    val b0 = (0L until 500L).map(i => i % 37).toDF("x")
    val b1 = (0L until 300L).map(i => i % 11).toDF("x")
    val b2 = (0L until 200L).map(i => i * 7 % 91).toDF("x")
    writeCmsBatchIdempotent(b0, 0L, col("x"), dir)
    writeCmsBatchIdempotent(b1, 1L, col("x"), dir)
    // failure replay of batch 1 must not double its counts
    writeCmsBatchIdempotent(b1, 1L, col("x"), dir)
    writeCmsBatchIdempotent(b2, 2L, col("x"), dir)
    val merged = cmsMergedGrid(spark, dir)
    val oneShot = b0.union(b1).union(b2)
      .agg(CmsFunctions.cms(col("x")).as("g")).head().getSeq[Long](0)
    assert(merged.toSeq == oneShot)
    // grid rows grow with batch count, not key cardinality
    assert(spark.read.parquet(s"$dir/grids").count() === 3)
    // estimates from the merged grid never underestimate the union
    val exact = b0.union(b1).union(b2).groupBy("x").count()
      .as[(Long, Long)].collect()
    val g = typedLit(merged.toSeq)
    val est = exact.map(_._1).toSeq.toDF("x")
      .withColumn("e", CmsFunctions.cmsEstimate(g, col("x")))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (k, c) => assert(est(k) >= c) }
  }
}
