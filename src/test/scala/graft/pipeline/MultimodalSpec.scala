package graft.pipeline

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Specs for the multimodal column plumbing: binary payload + typed
  * metadata, mapPartitions batch decode (stubbed codec), column pruning. */
class MultimodalSpec extends SparkSuite {

  private def media = Multimodal.mediaTable(Tables.documents(spark, sf()))

  test("media table: 32-byte binary payloads with typed metadata") {
    val rows = media.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("payload").length == 32)
      assert(Set("image/fake", "audio/fake", "video/fake")(r.getAs[String]("mime")))
      assert(r.getAs[Int]("n_frames") >= 1 && r.getAs[Int]("n_frames") <= 4)
    }
  }

  test("mapPartitions decode stub produces the SQL-path features") {
    implicit val s = spark
    import s.implicits._
    val ds = media.as[MediaRow]
    val feats = Multimodal.extractFeatures(ds).collect()
    assert(feats.length == 500)
    // the stub's mean must equal the SQL-expressible mean-byte feature
    val sqlMeans = media.select(col("doc_id"),
        Multimodal.meanByte(Multimodal.byteValues(col("payload"), 32), 32).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    feats.foreach { f =>
      assert(math.abs(f.mean_byte - sqlMeans(f.doc_id)) < 1e-12, s"doc ${f.doc_id}")
      assert(f.n_bytes == 32)
      assert(f.frame_bytes.nonEmpty && f.frame_bytes.length <= 32)
    }
  }

  test("metadata-only query never reads the payload column (pruning)") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    media.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir).select("doc_id", "mime", "width")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.split("ReadSchema")(1).split("\n")(0).contains("payload"),
      "payload column must be pruned from the scan")
  }

  test("resize stub: nearest-neighbor striding, distributed via mapPartitions") {
    implicit val s = spark
    import s.implicits._
    val resized = media.as[MediaRow].mapPartitions(_.map { m =>
      (m.doc_id, FakeCodec.resize(m.payload, m.width, m.height, 4, 4))
    }).collect()
    assert(resized.length == 500)
    resized.foreach { case (_, bytes) => assert(bytes.length == 16) }
    // deterministic: same input → same output
    val again = FakeCodec.resize(Array[Byte](1, 2, 3, 4), 2, 2, 4, 4)
    assert(again.toSeq == FakeCodec.resize(Array[Byte](1, 2, 3, 4), 2, 2, 4, 4).toSeq)
  }

  test("frame sampling slices the right 8-byte window") {
    val r = media.filter(col("doc_id") === 7)
      .select(col("payload"),
        Multimodal.frameHex(col("payload"), pmod(col("doc_id"), col("n_frames"))))
      .collect()(0)
    val payload = r.getAs[Array[Byte]](0)
    val nFrames = 1 + 7 % 4 // 4
    val idx = (7 % nFrames).toInt // 3
    val expected = payload.slice(idx * 8, idx * 8 + 8).map("%02x".format(_)).mkString
    assert(r.getString(1) == expected)
  }
}
