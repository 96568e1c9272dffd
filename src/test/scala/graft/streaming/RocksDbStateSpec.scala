package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** The 100 TB streaming-state story: the default in-memory (HDFS-backed)
  * state store keeps every key's state on the executor heap, which caps
  * keyed-state cardinality (sessions per user, LSH bucket claims) at
  * heap size. RocksDB spills state to local disk with incremental
  * checkpointing — the provider production deployments run. This suite
  * proves the engine's stateful operators run unchanged on it: the
  * provider is wired by CONFIG (a runtime conf read at query start), not
  * code, so passing here means every flatMapGroupsWithState / dedup /
  * stream-stream-join path in graft.streaming is RocksDB-ready. */
class RocksDbStateSpec extends SparkSuite {

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Provider)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionization state lives in RocksDB and produces the same sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[StreamingIngest.Click]
      val sessions = StreamingIngest.sessionize(mem.toDS(), gapMs = 30000L,
        watermarkDelay = "0 seconds")
      val q = sessions.writeStream.outputMode("append").format("memory")
        .queryName("rocksdb_sessions").start()
      mem.addData(
        StreamingIngest.Click(1, ts("2026-01-01 00:00:00")),
        StreamingIngest.Click(1, ts("2026-01-01 00:00:20")),
        StreamingIngest.Click(2, ts("2026-01-01 00:00:05")))
      q.processAllAvailable()
      mem.addData(StreamingIngest.Click(99, ts("2026-01-01 01:00:00")))
      q.processAllAvailable()
      mem.addData(StreamingIngest.Click(99, ts("2026-01-01 02:00:00")))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("rocksdb_sessions").filter($"user_id" < 99)
        .select("user_id", "clicks").as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 2L), (2L, 1L)))
    }
  }

  test("streaming lsh dedup marks work on RocksDB state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val a = "the quick brown fox jumps over the lazy dog again and again today"
      val mem = MemoryStream[(Long, Timestamp, String)]
      val marks = StreamingDedup.lshDedupMarks(
        mem.toDF().toDF("doc_id", "ts", "text"), "ts", 600000L)
      val q = marks.writeStream.outputMode("append").format("memory")
        .queryName("rocksdb_lsh").start()
      mem.addData((1L, ts("2026-01-01 00:00:00"), a))
      q.processAllAvailable()
      mem.addData((2L, ts("2026-01-01 00:01:00"), a))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("rocksdb_lsh").select("doc_id", "dup_of")
        .as[(Long, Long)].collect().toSet
      assert(got.nonEmpty && got.forall(_ == ((2L, 1L))))
    }
  }
}
