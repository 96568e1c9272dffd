package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media row: opaque binary payload + typed metadata (the multimodal
  * column pattern — image/audio/video bytes ride alongside the relational
  * columns; SURVEY.md §2.2 [EXT]). */
final case class MediaRow(
    doc_id: Long,
    mime: String,
    width: Int,
    height: Int,
    n_frames: Int,
    payload: Array[Byte])

/** Extracted features for one media row (the decode output schema). */
final case class MediaFeatures(
    doc_id: Long,
    mime: String,
    n_bytes: Int,
    mean_byte: Double,
    frame_bytes: Array[Byte])

/** [EXT] Multimodal columns: treat image/audio/video as opaque `binary`
  * columns with typed metadata; decode / feature-extract / frame-sample
  * run batch-wise over partitions (the Scala analog of `mapInPandas` —
  * `Dataset.mapPartitions` with an iterator of rows per task, vectorized
  * parquet on the scan side).
  *
  * The decode step is a STUB: real image/audio libs are not in this
  * container, so [[FakeCodec.decode]] derives features deterministically
  * from the bytes. The Spark-side plumbing — BinaryType payload column,
  * metadata struct, partitioning, batch iterator shape, typed output
  * schema — is real and tested (MultimodalSpec).
  *
  * Scale (100 TB): payloads dominate bytes, so the layout rule is
  * column-prune-friendly — metadata queries must never read the payload
  * column (parquet column pruning gives this for free; verified via
  * ReadSchema in .explain). Feature extraction is a narrow per-partition
  * map — no shuffle; partition sizing via files.maxPartitionBytes keeps a
  * task's payload batch in executor memory.
  */
object Multimodal {

  /** Synthesize the `media` table from `documents` (deterministic: payload
    * bytes from md5 of the text — the container has no real image files).
    * payload = unhex(md5(text) ⧺ md5(lang ⧺ ':' ⧺ text)) → 32 bytes. */
  def mediaTable(documents: DataFrame): DataFrame = {
    val hexCol = concat(md5(col("text")), md5(concat(col("lang"), lit(":"), col("text"))))
    documents.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image/fake")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio/fake")
        .otherwise("video/fake").as("mime"),
      (lit(16) + pmod(col("doc_id"), lit(64))).cast("int").as("width"),
      (lit(16) + pmod(col("doc_id"), lit(48))).cast("int").as("height"),
      (lit(1) + pmod(col("doc_id"), lit(4))).cast("int").as("n_frames"),
      unhex(hexCol).as("payload"))
  }

  /** The same synthesis as DuckDB SQL (for oracle parity; `payload_hex`
    * replaces the binary column — DuckDB-side features work on hex text). */
  def duckMediaTable: String =
    """SELECT doc_id,
       (CASE doc_id % 3 WHEN 0 THEN 'image/fake' WHEN 1 THEN 'audio/fake' ELSE 'video/fake' END) AS mime,
       CAST(16 + doc_id % 64 AS INT) AS width,
       CAST(16 + doc_id % 48 AS INT) AS height,
       CAST(1 + doc_id % 4 AS INT) AS n_frames,
       md5(text) || md5(lang || ':' || text) AS payload_hex
       FROM documents"""

  /** Byte values of a binary column as bigint[] (via the hex text — pure
    * built-ins, parity-exact with [[duckByteValues]]). */
  def byteValues(payload: Column, nBytes: Int): Column =
    transform(sequence(lit(0), lit(nBytes - 1)),
      i => conv(substring(lower(hex(payload)), i * 2 + 1, lit(2)), 16, 10).cast("bigint"))

  def duckByteValues(payloadHex: String, nBytes: Int): String = {
    val one = s"(instr('0123456789abcdef', substr($payloadHex, i*2+1, 1)) - 1) * 16" +
      s" + (instr('0123456789abcdef', substr($payloadHex, i*2+2, 1)) - 1)"
    s"list_transform(range($nBytes), i -> CAST($one AS BIGINT))"
  }

  /** Mean byte value — sequential int fold then one exact division. */
  def meanByte(bytes: Column, nBytes: Int): Column =
    aggregate(bytes, lit(0L), (acc, x) => acc + x).cast("double") / lit(nBytes.toDouble)
  def duckMeanByte(bytesExpr: String, nBytes: Int): String =
    s"CAST(list_reduce($bytesExpr, (acc, x) -> acc + x) AS DOUBLE) / $nBytes.0"

  /** Frame sampling: the doc's (doc_id mod n_frames)-th 8-byte frame, as
    * hex (binary substring Spark-side; hex substring oracle-side). */
  def frameHex(payload: Column, frameIdx: Column): Column =
    lower(hex(substring(payload, (frameIdx * 8 + 1).cast("int"), lit(8))))
  def duckFrameHex(payloadHex: String, frameIdx: String): String =
    s"substr($payloadHex, ($frameIdx) * 16 + 1, 16)"

  /** STUB decode: batch feature extraction over partition iterators — the
    * real-decode call site. A production build would decode image/audio
    * bytes here (lib absent in this container → deterministic fake: mean
    * byte + first-frame sample). Plumbing (batching, schema, encoders) is
    * the real thing. */
  def extractFeatures(media: Dataset[MediaRow])(implicit s: SparkSession): Dataset[MediaFeatures] = {
    import s.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (mean, frame) = FakeCodec.decode(m.payload, m.n_frames)
        MediaFeatures(m.doc_id, m.mime, m.payload.length, mean, frame)
      }
    }
  }
}

/** The stubbed decoder (see [[Multimodal.extractFeatures]]). */
object FakeCodec {
  /** Returns (mean byte value, first frame bytes). Real codecs plug in
    * here; signature and batch shape are what production code would use. */
  def decode(payload: Array[Byte], nFrames: Int): (Double, Array[Byte]) = {
    val mean = payload.map(b => (b & 0xff).toLong).sum.toDouble / payload.length
    val frameLen = math.max(payload.length / math.max(nFrames, 1), 1)
    (mean, payload.slice(0, frameLen))
  }

  /** STUB resize: map a (width × height) payload to (w2 × h2) by nearest-
    * neighbor byte striding — deterministic stand-in for a real image
    * scaler, with the real signature (bytes + source dims → bytes). */
  def resize(payload: Array[Byte], width: Int, height: Int,
             w2: Int, h2: Int): Array[Byte] = {
    require(w2 >= 1 && h2 >= 1)
    val out = new Array[Byte](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * width / w2).toInt
        val sy = (y.toLong * height / h2).toInt
        out(y * w2 + x) = payload(((sy * width + sx) % payload.length).toInt)
        x += 1
      }
      y += 1
    }
    out
  }
}
