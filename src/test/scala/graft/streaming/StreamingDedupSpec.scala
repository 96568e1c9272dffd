package graft.streaming

import graft.SparkSuite
import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class StreamingDedupSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming lsh dedup marks later near-dups, ignores unrelated docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val aNear = "the quick brown fox jumps over the lazy dog again and again" // tail trimmed
    val c = "completely different content about distributed database engines here"

    val mem = MemoryStream[(Long, Timestamp, String)]
    val marks = StreamingDedup.lshDedupMarks(
      mem.toDF().toDF("doc_id", "ts", "text"), "ts", 600000L)
    val q = marks.writeStream.outputMode("append").format("memory")
      .queryName("lsh_marks").start()

    mem.addData((1L, ts("2026-01-01 00:00:00"), a))
    q.processAllAvailable()
    mem.addData((2L, ts("2026-01-01 00:01:00"), aNear),
                (3L, ts("2026-01-01 00:01:30"), c))
    q.processAllAvailable()
    // advance the watermark far past the horizon → bucket claims expire
    mem.addData((99L, ts("2026-01-01 02:00:00"), "x y z")) // <3 shingles: claims nothing
    q.processAllAvailable()
    // same text as doc 1, but outside the horizon → fresh claim, no mark
    mem.addData((4L, ts("2026-01-01 01:59:00"), a))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("lsh_marks").select("doc_id", "dup_of")
      .as[(Long, Long)].collect().toSet
    assert(got.nonEmpty && got.forall(_ == ((2L, 1L))),
      s"expected only (2 dup-of 1), got $got")
  }

  test("streaming marks agree with the batch LSH candidate pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // fuzzy corpus: originals at t0, mutations (id+100000, 2 tokens
    // dropped) at t1 — replayed through the stream in arrival order
    val docs = graft.queries.Tables.documents(spark, sf())
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = (s: String) => s.split(" ").filter(_.nonEmpty)
    val mutated = docs.filter(d => toks(d._2).length >= 5)
      .map { case (id, t) =>
        val w = toks(t); (id + 100000L, w.dropRight(2).mkString(" "))
      }

    val mem = MemoryStream[(Long, Timestamp, String)]
    val marks = StreamingDedup.lshDedupMarks(
      mem.toDF().toDF("doc_id", "ts", "text"), "ts", 600000L)
    val q = marks.writeStream.outputMode("append").format("memory")
      .queryName("lsh_marks_corpus").start()
    mem.addData(docs.map(d => (d._1, ts("2026-01-01 00:00:00"), d._2)).toSeq: _*)
    q.processAllAvailable()
    mem.addData(mutated.map(d => (d._1, ts("2026-01-01 00:01:00"), d._2)).toSeq: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("lsh_marks_corpus").select("dup_of", "doc_id")
      .as[(Long, Long)].collect().toSet

    // batch candidate pairs over the identical corpus (same constants)
    val corpus = (docs ++ mutated).toSeq.toDF("doc_id", "text")
    val sigs = TextAnalysis.shingleRows(corpus)
      .withColumn("x", Dedup.baseHash32(col("s")))
      .groupBy("doc_id")
      .agg(Dedup.minhashAggs("x").head, Dedup.minhashAggs("x").tail: _*)
    val batchPairs = Dedup.candidatePairs(Dedup.bandRows(sigs, "doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet

    // every streaming mark is a batch candidate pair (identical band
    // signatures imply a shared bucket in the batch join too)
    val unordered = got.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
    assert(unordered.subsetOf(batchPairs),
      s"streaming-only marks: ${unordered.diff(batchPairs).take(5)}")
    // detection coverage: nearly every mutation is flagged as a dup of
    // SOMETHING earlier (its mark may name a different first-claimant
    // than its constructed twin when a bucket is shared across docs)
    val markedIds = got.map(_._2)
    val caught = mutated.map(_._1).count(markedIds.contains)
    assert(caught >= mutated.length * 95 / 100,
      s"caught $caught of ${mutated.length}")
  }
}
