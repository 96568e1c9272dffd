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

/** [EXT] Multimodal columns: treat image/audio/video as opaque `binary`
  * columns with typed metadata; decode / feature-extract / frame-sample
  * run batch-wise over partitions (the Scala analog of `mapInPandas` —
  * `Dataset.mapPartitions` with an iterator of rows per task, vectorized
  * parquet on the scan side).
  *
  * Every decode is REAL: images through ImageIO ([[ImageCodec]]), audio
  * through javax.sound ([[AudioCodec]]), video containers through the
  * ISO-BMFF box walk ([[VideoContainer]]) and video PIXELS through the
  * MJPEG path ([[synthVideoFrames]]): frames stored as standalone
  * intra-coded images at the container's real sample-table offsets are
  * decodable by the JDK's own image codecs — no external video codec
  * needed, because MJPEG has no inter-frame state.
  *
  * Scale (100 TB): payloads dominate bytes, so the layout rule is
  * column-prune-friendly — metadata queries must never read the payload
  * column (parquet column pruning gives this for free; verified via
  * ReadSchema in .explain). Feature extraction is a narrow per-partition
  * map — no shuffle; partition sizing via files.maxPartitionBytes keeps a
  * task's payload batch in executor memory.
  */
object Multimodal {

  /** The doc_id feed for every synth/codec pipeline below, with a
    * scale-adaptive PARALLELISM FLOOR (optimization guide §2.5 "input
    * skew": one small unsplittable input serializes the whole stage).
    * The codec stages are CPU-bound (real PNG/WAV/MP4 encode+decode per
    * row), so their wall time is task-parallelism-bound — but a small
    * corpus arrives as ONE parquet row group and therefore ONE scan
    * partition, pinning minutes of codec CPU to a single core while the
    * rest idle (measured at sf0.1: q_media_videohash_seq ran 2 tasks on
    * 32 cores, 4.4 task-sec ≈ 4.4 s wall). Repartitioning costs one
    * exchange of ONLY the 8-byte ids (the §8 lightweight-proxy rule:
    * the payloads are synthesized/decoded AFTER the exchange), hashed
    * by doc_id (deterministic row→partition assignment — safe under
    * task retry, unlike round-robin of a non-deterministic input), and
    * only fires when the scan's own parallelism is BELOW the session's
    * (defaultParallelism) — a production-scale scan with enough splits
    * keeps its partitioning and pays nothing. */
  private def idsSpread(documents: DataFrame)(implicit s: SparkSession): Dataset[Long] = {
    import s.implicits._
    val ids = documents.select(col("doc_id")).as[Long]
    val target = s.sparkContext.defaultParallelism
    if (ids.rdd.getNumPartitions < target) ids.repartition(target, col("doc_id"))
    else ids
  }

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

  /** REAL media decode end to end: synthesize a deterministic grayscale
    * image (pixel(i) = (doc_id·31 + i) mod 256) and an 8-bit PCM clip
    * (same formula) per document, ENCODE them through the JDK's real
    * codecs (ImageIO → PNG bytes, javax.sound → WAV bytes), then DECODE
    * the opaque payloads back — ImageIO parses the PNG, AudioSystem
    * parses the RIFF container — and extract features from the decoded
    * rasters/samples: dimensions, mean luma, an 8×8 nearest-neighbor
    * thumbnail mean, sample count, mean amplitude. Because the content
    * formula is arithmetic, a SQL oracle can verify every decoded value
    * exactly without any codec — a real decode path with an exact
    * correctness gate.
    *
    * Scale: one narrow mapPartitions — no shuffle, no driver data; the
    * per-task working set is one image + one clip at a time. This is the
    * shape a production decode stage has (batched partition iterators
    * over a binary payload column); only the synthesis half would be
    * replaced by reading stored payloads. */
  def synthDecodedMedia(documents: DataFrame)(implicit s: SparkSession): Dataset[DecodedMedia] = {
    import s.implicits._
    idsSpread(documents).mapPartitions { ids =>
      ids.map { id =>
        val w = (16 + id % 64).toInt
        val h = (16 + id % 48).toInt
        val px = Array.tabulate(w * h)(i => ((id * 31 + i) % 256).toByte)
        val png = ImageCodec.encodeGrayPng(px, w, h)
        val (dw, dh, dec) = ImageCodec.decodeGray(png)
        val meanLuma = dec.iterator.map(b => (b & 0xff).toLong).sum.toDouble / (dw * dh)
        val thumb = ImageCodec.resizeNearest(dec, dw, dh, 8, 8)
        val thumbMean = thumb.iterator.map(b => (b & 0xff).toLong).sum.toDouble / 64.0
        val n = (256 + id % 512).toInt
        val wav = AudioCodec.encodeWav(Array.tabulate(n)(i => ((id * 31 + i) % 256).toByte))
        val smp = AudioCodec.decodeWav(wav)
        val audioMean = smp.iterator.map(b => (b & 0xff).toLong).sum.toDouble / smp.length
        DecodedMedia(id, dw.toLong, dh.toLong, meanLuma, thumbMean,
          smp.length.toLong, audioMean)
      }
    }
  }

  /** REAL perceptual-hash image dedup end to end: per document, the
    * original image AND a perturbed near-duplicate (every 97th pixel
    * +8 mod 256 — the formula-level analog of recompression noise)
    * each run the FULL real pipeline — PNG encode (ImageIO) → decode →
    * 8×8 nearest-neighbor thumbnail → [[ImageCodec.aHash64]] — and the
    * pair's Hamming distance decides near-duplicate status. Both
    * hashes derive from decoded bytes, yet every bit is arithmetic in
    * the generator constants, so a SQL oracle replays the thumbnails
    * and hashes exactly, codec-free.
    *
    * Scale: one narrow mapPartitions, no shuffle, one image in flight
    * per task — at 100 TB the hash pass runs at scan speed and the
    * downstream dedup is a 64-bit-key bucket join, not an image join. */
  def synthPerceptualHashes(documents: DataFrame)(implicit s: SparkSession): Dataset[PerceptualHash] = {
    import s.implicits._
    idsSpread(documents).mapPartitions { ids =>
      ids.map { id =>
        val w = (16 + id % 64).toInt
        val h = (16 + id % 48).toInt
        def hashOf(px: Int => Long): Long = {
          val arr = Array.tabulate(w * h)(i => px(i).toByte)
          val png = ImageCodec.encodeGrayPng(arr, w, h)
          val (dw, dh, dec) = ImageCodec.decodeGray(png)
          ImageCodec.aHash64(ImageCodec.resizeNearest(dec, dw, dh, 8, 8))
        }
        val a = hashOf(i => (id * 31 + i) % 256)
        val b = hashOf(i => (id * 31 + i + (if (i % 97 == 0) 8 else 0)) % 256)
        // a genuinely DIFFERENT image — unrelated content formula; the
        // classifier must keep it far while holding the b-pair near
        val c = hashOf(i => (id * 37 + 5L * i) % 256)
        val dab = java.lang.Long.bitCount(a ^ b).toLong
        val dac = java.lang.Long.bitCount(a ^ c).toLong
        PerceptualHash(id, a, b, c, dab, dac,
          if (dab <= 10) 1L else 0L, if (dac <= 10) 1L else 0L)
      }
    }
  }

  /** REAL audio perceptual fingerprint end to end — the audio twin of
    * [[synthPerceptualHashes]], completing the modality symmetry: per
    * document the original clip, a perturbed near-duplicate (every 97th
    * sample +8 — the formula-level analog of re-encode jitter) and an
    * envelope-INVERTED unrelated clip each run the FULL real WAV path
    * (encodeWav → AudioSystem decode), then a 64-bit FRAME-ENERGY SIGN
    * hash over the DECODED samples: the clip splits into 64 time frames
    * (boundaries k·n/64), bit k = 1 iff frame k's mean energy exceeds
    * the clip mean — cross-multiplied integers, no float boundary (the
    * aHash discipline on the time-domain energy envelope; the
    * spectral-band variant [[synthSpectralAudioHashes]] rides the same
    * plumbing with a first-difference filterbank in place of the raw
    * frame means, buying exact gain invariance). Clips carry a per-doc 32-bit
    * envelope signature (Knuth-mix of doc_id, bits 0/31 pinned so both
    * levels always occur), so the margin analysis is exact: each
    * frame's mean sits ≥ 240·⌊n/64⌋/n from the clip mean (the floor
    * boundaries make frame lengths uneven, so the worst case over
    * n ∈ [256, 767] is ~3.0 near n = 319 — exactly 3.75 when 64 | n),
    * while the +8 perturbation can shift the comparison by at most
    * 8/⌊n/64⌋ + 64/n ≤ ~2.25 — planted near-dups land at Hamming 0,
    * the inverted clip at exactly 64. Every decoded byte is arithmetic in
    * the generator constants, so a SQL oracle replays all frame sums
    * and bits exactly, codec-free.
    *
    * Scale: one narrow mapPartitions, no shuffle, one clip in flight
    * per task; downstream near-dup grouping is a 64-bit-key bucket
    * join, never an audio-payload join. */
  def synthAudioHashes(documents: DataFrame)(implicit s: SparkSession): Dataset[AudioHash] = {
    import s.implicits._
    idsSpread(documents).mapPartitions { ids =>
      ids.map { id =>
        val n = (256 + id % 512).toInt
        val w32 = ((id + 1) * 2654435761L) & 0xFFFFFFFFL
        // frame k's envelope bit; 0/31 pinned so both levels occur
        def env(k: Int): Int = (k % 32) match {
          case 0 => 0
          case 31 => 1
          case r => ((w32 >> r) & 1L).toInt
        }
        // frame containing sample i under the floor boundaries
        // [k·n/64, (k+1)·n/64): k = ⌈64(i+1)/n⌉ − 1
        def frameOf(i: Int): Int = ((64 * (i + 1) - 1) / n)
        def fpOf(sample: Int => Int): Long = {
          val dec = AudioCodec.decodeWav(AudioCodec.encodeWav(
            Array.tabulate(n)(i => sample(i).toByte)))
          val total = dec.iterator.map(b => (b & 0xff).toLong).sum
          var fp = 0L
          var k = 0
          while (k < 64) {
            val lo = k * n / 64
            val hi = (k + 1) * n / 64
            var fs = 0L
            var i = lo
            while (i < hi) { fs += dec(i) & 0xff; i += 1 }
            if (fs * n > total * (hi - lo)) fp |= (1L << k)
            k += 1
          }
          fp
        }
        def base(i: Int): Int = if (env(frameOf(i)) == 1) 180 else 60
        val a = fpOf(base)
        val b = fpOf(i => base(i) + (if (i % 97 == 0) 8 else 0))
        val c = fpOf(i => if (env(frameOf(i)) == 1) 60 else 180)
        val dab = java.lang.Long.bitCount(a ^ b).toLong
        val dac = java.lang.Long.bitCount(a ^ c).toLong
        AudioHash(id, a, b, c, dab, dac,
          if (dab <= 10) 1L else 0L, if (dac <= 10) 1L else 0L)
      }
    }
  }

  /** REAL video perceptual hash end to end — the third cell of the
    * modality symmetry ([[synthPerceptualHashes]] for images,
    * [[synthAudioHashes]] for audio): per document three MJPEG-style
    * videos (original, +8-every-97th-pixel perturbed near-dup,
    * unrelated content) are each CONTAINERIZED with real sample tables,
    * DEMUXED back through the stsc-run walk, their MIDDLE frame decoded
    * through ImageIO, thumbnailed 8×8 and hashed with
    * [[ImageCodec.aHash64]] — the exact pipeline a production video
    * dedup runs per keyframe (at scale: one narrow mapPartitions per
    * sampled frame, dedup a 64-bit-key bucket join, never a video
    * payload join). Frame pixels are arithmetic in the generator
    * constants, so a SQL oracle replays the sampled thumbnail and every
    * hash bit codec-free — while the Scala side really pays the
    * container parse + image decode. */
  def synthVideoHashes(documents: DataFrame)(implicit s: SparkSession): Dataset[PerceptualHash] = {
    import s.implicits._
    idsSpread(documents).mapPartitions { ids =>
      ids.map { id =>
        val w = (16 + id % 32).toInt
        val h = (16 + id % 24).toInt
        val n = (4 + id % 6).toInt
        val fi = n / 2 // the sampled keyframe
        def hashOf(px: (Int, Int) => Long): Long = {
          // static scene outside the sampled keyframe: every non-fi slot
          // reuses frame 0's bytes (a fixed camera), so the container
          // keeps n REAL samples (stsz/stsc/stco walk unchanged) while
          // the synthesis pays 2 PNG encodes per clip instead of n —
          // the oracle replays only frame fi, which is unaffected
          val f0 = ImageCodec.encodeGrayPng(
            Array.tabulate(w * h)(i => px(0, i).toByte), w, h)
          val fk = ImageCodec.encodeGrayPng(
            Array.tabulate(w * h)(i => px(fi, i).toByte), w, h)
          val frames = (0 until n).map(f => if (f == fi) fk else f0)
          val mp4 = VideoContainer.encodeMp4Frames(
            w, h, timescale = 600, sampleDelta = 25, frames)
          val (off, sz) = VideoContainer.videoSampleRanges(mp4)(fi)
          val (dw, dh, dec) = ImageCodec.decodeGray(
            java.util.Arrays.copyOfRange(mp4, off.toInt, (off + sz).toInt))
          ImageCodec.aHash64(ImageCodec.resizeNearest(dec, dw, dh, 8, 8))
        }
        val a = hashOf((f, i) => (id * 31 + f * 7 + i) % 256)
        val b = hashOf((f, i) =>
          (id * 31 + f * 7 + i + (if (i % 97 == 0) 8 else 0)) % 256)
        val c = hashOf((f, i) => (id * 37 + f * 11 + 5L * i) % 256)
        val dab = java.lang.Long.bitCount(a ^ b).toLong
        val dac = java.lang.Long.bitCount(a ^ c).toLong
        PerceptualHash(id, a, b, c, dab, dac,
          if (dab <= 10) 1L else 0L, if (dac <= 10) 1L else 0L)
      }
    }
  }

  /** SPECTRAL-BAND audio fingerprint — the filterbank variant the
    * [[synthAudioHashes]] scaladoc promises, closing the gain-invariance
    * gap: the frame-ENERGY hash compares absolute frame means, so it is
    * robust to additive jitter but keys on LEVELS; this variant hashes
    * the per-frame HIGH-BAND energy H(k) = Σ |s(i+1) − s(i)| over the
    * frame's decoded samples (the high output of a 2-tap first-difference
    * filterbank — "how much does this frame wiggle", not "how loud is
    * it"), bit k = 1 iff H(k)·(n−64) > H_tot·(len_k−1) (the same
    * cross-multiplied mean-sign discipline). Both sides of the
    * comparison scale linearly under gain, so an EXACT ×2 gain-scaled
    * clip (no rounding, no clipping — levels sized for it) hashes
    * IDENTICALLY: the planted near-dup is the loudness-normalized
    * re-encode the energy hash has no margin story for. The unrelated
    * clip swaps wiggling and flat frames (spectral inversion) and lands
    * at exactly Hamming 64: a spec-frame bit reduces to n−64 > S_spec
    * (S_spec = Σ_spec(len−1), strictly smaller — two flat frames are
    * pinned), so fp = the spec bitmask exactly, complement under
    * inversion. Content: per-frame level 30/90 by the envelope word
    * (levels cancel in the differences — the hash must NOT see them),
    * ±16 alternation on spec frames by a second Knuth-mix word, bits
    * 0/31 pinned so both frame classes always occur. Same real WAV
    * encode→decode path, same narrow mapPartitions scale shape; every
    * decoded byte is arithmetic, so the oracle replays all energies and
    * bits codec-free. */
  def synthSpectralAudioHashes(documents: DataFrame)(implicit s: SparkSession): Dataset[AudioHash] = {
    import s.implicits._
    idsSpread(documents).mapPartitions { ids =>
      ids.map { id =>
        val n = (256 + id % 512).toInt
        val wEnv = ((id + 1) * 2654435761L) & 0xFFFFFFFFL
        val wSpec = ((id + 7) * 2654435761L) & 0xFFFFFFFFL
        def pinned(w: Long, k: Int): Int = (k % 32) match {
          case 0 => 0
          case 31 => 1
          case r => ((w >> r) & 1L).toInt
        }
        def frameOf(i: Int): Int = ((64 * (i + 1) - 1) / n)
        def fpOf(sample: Int => Int): Long = {
          val dec = AudioCodec.decodeWav(AudioCodec.encodeWav(
            Array.tabulate(n)(i => sample(i).toByte)))
          val hk = new Array[Long](64)
          var tot = 0L
          var k = 0
          while (k < 64) {
            val lo = k * n / 64
            val hi = (k + 1) * n / 64
            var e = 0L
            var i = lo
            while (i < hi - 1) {
              e += math.abs((dec(i + 1) & 0xff) - (dec(i) & 0xff)); i += 1
            }
            hk(k) = e; tot += e; k += 1
          }
          var fp = 0L
          val d = (n - 64).toLong
          k = 0
          while (k < 64) {
            val lo = k * n / 64
            val hi = (k + 1) * n / 64
            if (hk(k) * d > tot * (hi - lo - 1)) fp |= (1L << k)
            k += 1
          }
          fp
        }
        def clip(specOf: Int => Int)(i: Int): Int = {
          val f = frameOf(i)
          val lvl = if (pinned(wEnv, f) == 1) 90 else 30
          lvl + (if (specOf(f) == 1) (if (i % 2 == 1) 16 else -16) else 0)
        }
        val base = clip(f => pinned(wSpec, f)) _
        val a = fpOf(base)
        val b = fpOf(i => base(i) * 2) // exact ×2 gain: max 212, no clip
        val c = fpOf(clip(f => 1 - pinned(wSpec, f)))
        val dab = java.lang.Long.bitCount(a ^ b).toLong
        val dac = java.lang.Long.bitCount(a ^ c).toLong
        AudioHash(id, a, b, c, dab, dac,
          if (dab <= 10) 1L else 0L, if (dac <= 10) 1L else 0L)
      }
    }
  }

  /** VIDEO SEQUENCE near-dup hashing — the operator that catches
    * TRIMMED/SHIFTED copies a single middle-keyframe hash
    * ([[synthVideoHashes]]) structurally misses: per video doc, three
    * clips run the full real path (PNG frames → ISO-BMFF container →
    * stsc-walk demux → ImageIO decode → 8×8 thumbnail →
    * [[ImageCodec.aHash64]] PER KEYFRAME): the original (n frames), a
    * TRIMMED copy missing the first frame (n−1 frames — the re-upload
    * that cut the intro), and unrelated content. Clips match by
    * hash-MULTISET overlap: matched = Σ_h min(cnt_a(h), cnt_b(h)), a
    * near-dup iff ≥ 3/4 of the shorter clip's keyframe hashes appear
    * in the longer's (integer cross-multiplied — no float ratio).
    *
    * Every keyframe is hashed, not a 4-slot percentile schedule: under
    * a one-frame shift the ⌊k·n/4⌋ grids of the two clips can be fully
    * DISJOINT (n = 9 trims sample {0,2,4,6} vs shifted {1,3,5,7} — the
    * parity blind spot), so percentile sampling cannot give a shift
    * tolerance no matter the matcher. Production video dedup hashes
    * the (sparse) keyframe track for the same reason; MJPEG demux
    * yields exactly that track. The single-frame blind spot is kept
    * VISIBLE in the output: mid_ab compares the two clips' middle
    * keyframes — the trim shifts the middle index, so it matches for
    * even n always and for odd n only by hash accident (a majority of
    * odd trims defeat it), while the sequence match holds at (n−1)/n
    * for every n.
    *
    * Scale: one narrow mapPartitions, one container in flight per
    * task, no shuffle; downstream corpus-wide matching feeds the
    * per-keyframe 64-bit hashes to [[Dedup.hammingNearDupPairs]] — a
    * banded join, never a payload join. Frame pixels are arithmetic in
    * the generator constants and the trimmed clip's bytes are
    * identical to the original's frames 1..n−1, so a SQL oracle
    * replays every hash and both multiset overlaps codec-free. */
  /** Per-keyframe aHash list of ONE synthesized clip — the shared real
    * path of [[synthVideoSeqHashes]] and [[synthVideoSeqFrameHashes]]:
    * nf PNG frames → real ISO-BMFF container → stsc-walk demux →
    * ImageIO decode → 8×8 thumbnail → aHash64 per keyframe. */
  private def clipFrameHashes(w: Int, h: Int, nf: Int,
                              px: (Int, Int) => Long): IndexedSeq[Long] = {
    val frames = (0 until nf).map(f => ImageCodec.encodeGrayPng(
      Array.tabulate(w * h)(i => px(f, i).toByte), w, h))
    val mp4 = VideoContainer.encodeMp4Frames(
      w, h, timescale = 600, sampleDelta = 25, frames)
    val ranges = VideoContainer.videoSampleRanges(mp4)
    (0 until nf).map { f =>
      val (off, sz) = ranges(f)
      val (dw, dh, dec) = ImageCodec.decodeGray(
        java.util.Arrays.copyOfRange(mp4, off.toInt, (off + sz).toInt))
      ImageCodec.aHash64(ImageCodec.resizeNearest(dec, dw, dh, 8, 8))
    }
  }

  def synthVideoSeqHashes(documents: DataFrame)(implicit s: SparkSession): Dataset[VideoSeqHash] = {
    import s.implicits._
    idsSpread(documents).mapPartitions { ids =>
      ids.map { id =>
        val w = (16 + id % 32).toInt
        val h = (16 + id % 24).toInt
        val n = (4 + id % 6).toInt
        def clipHashes(nf: Int, px: (Int, Int) => Long): IndexedSeq[Long] =
          clipFrameHashes(w, h, nf, px)
        def pa(f: Int, i: Int): Long = (id * 31 + f * 7 + i) % 256
        val a = clipHashes(n, pa)
        val b = clipHashes(n - 1, (f, i) => pa(f + 1, i))
        val c = clipHashes(n, (f, i) => (id * 37 + f * 11 + 5L * i) % 256)
        def overlap(x: Seq[Long], y: Seq[Long]): Long = {
          val cy = y.groupBy(identity).map { case (k, v) => (k, v.size) }
          x.groupBy(identity).iterator
            .map { case (k, v) => math.min(v.size, cy.getOrElse(k, 0)) }.sum.toLong
        }
        val mab = overlap(a, b)
        val mac = overlap(a, c)
        val mid = if (a(n / 2) == b((n - 1) / 2)) 1L else 0L
        VideoSeqHash(id, n.toLong, mab, mac, mid,
          if (mab * 4L >= (n - 1).toLong * 3L) 1L else 0L,
          if (mac * 4L >= (n - 1).toLong * 3L) 1L else 0L)
      }
    }
  }

  /** The CORPUS form of the video-sequence hashes — one row per
    * (clip, keyframe) with the clip's 64-bit frame aHash, the input
    * [[graft.pipeline.Dedup.hammingNearDupPairs]]-style corpus matching
    * consumes (closing the scaladoc promise above: downstream matching
    * is a banded join over these 8-byte hashes, never a payload join).
    * Per video doc three clips land as separate corpus rows — the
    * original (clip_id = doc_id), its first-frame-TRIMMED copy
    * (+100000; frames byte-identical to the original's 1..n−1 through
    * the REAL container encode→demux→decode path) and unrelated
    * content (+200000) — so a cross-clip join must recover exactly the
    * planted (id, id+100000) pairs under the ≥3/4 multiset-overlap
    * verify. Same narrow mapPartitions scale shape as every codec
    * stage; the hash rows are 16 bytes each through any shuffle. */
  def synthVideoSeqFrameHashes(documents: DataFrame)(implicit s: SparkSession): Dataset[VideoFrameHashRow] = {
    import s.implicits._
    idsSpread(documents).mapPartitions { ids =>
      ids.flatMap { id =>
        val w = (16 + id % 32).toInt
        val h = (16 + id % 24).toInt
        val n = (4 + id % 6).toInt
        def pa(f: Int, i: Int): Long = (id * 31 + f * 7 + i) % 256
        def rows(off: Long, hs: IndexedSeq[Long]) =
          hs.zipWithIndex.map { case (fh, f) =>
            VideoFrameHashRow(id + off, f.toLong, fh)
          }
        rows(0L, clipFrameHashes(w, h, n, pa)) ++
          rows(100000L, clipFrameHashes(w, h, n - 1, (f, i) => pa(f + 1, i))) ++
          rows(200000L, clipFrameHashes(w, h, n,
            (f, i) => (id * 37 + f * 11 + 5L * i) % 256))
      }
    }
  }

  /** REAL video pixel decode end to end — the path that retired the
    * last codec stub: per document an MJPEG-style MP4 is synthesized
    * (each frame a standalone intra-coded image — PNG here, the
    * lossless sibling of JPEG on the same ImageIO decode call site —
    * with pixel(f, i) = (doc_id·31 + f·7 + i) mod 256), stored with
    * REAL sample tables ([[VideoContainer.encodeMp4Frames]]). The
    * pipeline then does what a production frame extractor does:
    * DEMUX the byte ranges from the container's own stsz/stsc/stco
    * ([[VideoContainer.videoSampleRanges]]), pick 4 evenly-spaced
    * frames with the same schedule arithmetic as
    * q_media_frame_schedule ((k·n) div 4), slice each frame's bytes
    * and DECODE them through ImageIO. Features come from decoded
    * rasters; the content formula is arithmetic, so a SQL oracle
    * verifies every decoded pixel sum exactly — the PNG/WAV
    * discipline, now covering video.
    *
    * Scale: one narrow mapPartitions — no shuffle; per task one
    * container + one frame in flight. Lossy JPEG frames ride the
    * identical call sites (spec-verified); the oracle query uses
    * lossless frames so the gate stays bit-exact. */
  def synthVideoFrames(documents: DataFrame)(implicit s: SparkSession): Dataset[VideoFrame] = {
    import s.implicits._
    idsSpread(documents).mapPartitions { ids =>
      ids.flatMap { id =>
        val w = (16 + id % 32).toInt
        val h = (16 + id % 24).toInt
        val n = (4 + id % 6).toInt
        val frames = (0 until n).map { f =>
          ImageCodec.encodeGrayPng(
            Array.tabulate(w * h)(i => ((id * 31 + f * 7 + i) % 256).toByte), w, h)
        }
        val mp4 = VideoContainer.encodeMp4Frames(
          w, h, timescale = 600, sampleDelta = 25, frames)
        val ranges = VideoContainer.videoSampleRanges(mp4)
        (0L until 4L).map { k =>
          val fi = k * n / 4
          val (off, sz) = ranges(fi.toInt)
          val bytes = java.util.Arrays.copyOfRange(mp4, off.toInt, (off + sz).toInt)
          val (dw, dh, px) = ImageCodec.decodeGray(bytes)
          var sum = 0L
          var i = 0
          while (i < px.length) { sum += px(i) & 0xff; i += 1 }
          VideoFrame(id, k, fi, dw.toLong, dh.toLong, sum, dw.toLong * dh)
        }
      }
    }
  }
}

/** Per-doc video SEQUENCE match report: keyframe-hash multiset overlaps
  * of the original vs its trimmed copy (matched_ab) and vs unrelated
  * content (matched_ac), the single-middle-frame comparison (mid_ab —
  * the blind spot), and the ≥3/4-overlap sequence verdicts. */
final case class VideoSeqHash(doc_id: Long, n_frames: Long,
                              matched_ab: Long, matched_ac: Long,
                              mid_ab: Long, near_seq_ab: Long,
                              near_seq_ac: Long)

/** One (clip, keyframe) hash row — the corpus form video near-dup
  * matching joins on (see `synthVideoSeqFrameHashes`). */
final case class VideoFrameHashRow(clip_id: Long, f: Long, fh: Long)

/** One decoded video frame: schedule slot `k`, demuxed frame index, and
  * features from the REAL ImageIO decode of the frame's sample bytes. */
final case class VideoFrame(doc_id: Long, k: Long, frame_idx: Long,
                            width_px: Long, height_px: Long,
                            luma_sum: Long, n_px: Long)

/** One synthesized image row: REAL PNG bytes in `payload`. */
final case class ImageRow(doc_id: Long, width: Int, height: Int,
                          payload: Array[Byte])

/** One synthesized audio row: REAL WAV bytes in `payload`. */
final case class AudioRow(doc_id: Long, n_samples: Int, payload: Array[Byte])

/** Decoded media features — every value derived from REAL codec output. */
final case class DecodedMedia(doc_id: Long, width_px: Long, height_px: Long,
                              mean_luma: Double, thumb_mean: Double,
                              audio_n: Long, audio_mean: Double)

/** Per-document perceptual-hash triple: original (a), perturbed
  * near-dup (b) and unrelated image (c), each hashed off REAL decoded
  * bytes. `near_* ` = hamming ≤ 10 — b must classify near, c far. */
final case class PerceptualHash(doc_id: Long, ahash_a: Long, ahash_b: Long,
                                ahash_c: Long, ham_ab: Long, ham_ac: Long,
                                near_ab: Long, near_ac: Long)

/** One audio fingerprint row: frame-energy sign hashes of the original
  * (a), the perturbed near-dup (b) and the envelope-inverted unrelated
  * clip (c), all from REAL WAV decodes, plus Hamming verdicts. */
final case class AudioHash(doc_id: Long, fp_a: Long, fp_b: Long,
                           fp_c: Long, ham_ab: Long, ham_ac: Long,
                           near_ab: Long, near_ac: Long)

/** REAL image codec on the JDK's built-in ImageIO (PNG/JPEG/BMP/GIF ship
  * with the JVM — no external libs needed): grayscale encode, decode to
  * raster samples, nearest-neighbor resample. Used by the image decode
  * pipeline AND the video frame path — MJPEG frames are standalone
  * images, so the same decode call site covers video pixels. */
object ImageCodec {
  import java.awt.image.BufferedImage
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.ImageIO

  // ImageIO's default stream cache is DISK-backed: every read/write
  // spills through a temp file — a hidden fsync per image on a
  // million-image batch. Memory-backed caching is strictly better for
  // our in-memory byte[] payloads (JVM-global, set once per executor).
  ImageIO.setUseCache(false)

  /** Encode 8-bit grayscale pixels (row-major, length w*h) as PNG. */
  def encodeGrayPng(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != $width x $height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, pixels)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Encode 8-bit grayscale pixels as JPEG — the LOSSY sibling of
    * [[encodeGrayPng]] on the same ImageIO writer registry; used by the
    * MJPEG spec path (decoded values are codec-dependent, so the exact
    * oracle rides the lossless PNG frames instead). */
  def encodeGrayJpeg(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != $width x $height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, pixels)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  // Decode-side plumbing reuse: ImageIO.read scans the provider registry
  // and builds a fresh ImageReader PER CALL — measured at ~half the
  // decode cost of a thumbnail-sized PNG (0.105 → 0.054 s / 3000 decodes
  // single-thread, and the registry scan contends across 32 decode
  // tasks: 0.176 → 0.062 s). The decoded image is bit-identical (same
  // PNGImageReader underneath); one reader per task thread, reset
  // between payloads. Falls back to the registry path for any payload
  // the pinned PNG reader rejects (JPEG/BMP/GIF callers).
  private val pngReader = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader =
      ImageIO.getImageReadersByFormatName("png").next()
  }
  private val PngMagic = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47)

  /** Decode an image payload to (width, height, grayscale samples) via
    * ImageIO — the REAL decode call site. Works on any ImageIO-readable
    * format; samples are the first band (= luma for grayscale). */
  def decodeGray(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img =
      if (payload.length >= 4 && payload(0) == PngMagic(0) &&
          payload(1) == PngMagic(1) && payload(2) == PngMagic(2) &&
          payload(3) == PngMagic(3)) {
        val rd = pngReader.get()
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(payload))
        try { rd.setInput(iis, true, true); rd.read(0) }
        finally { rd.setInput(null); iis.close() }
      } else ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    // fast path: an 8-bit single-band raster exposes its samples as the
    // backing byte array directly (PNG grayscale lands here) — same
    // values as getSamples, without the int[] detour + per-pixel copy
    img.getRaster.getDataBuffer match {
      case db: java.awt.image.DataBufferByte
          if db.getSize == w * h && img.getRaster.getNumBands == 1 &&
            db.getOffset == 0 =>
        (w, h, db.getData.clone())
      case _ =>
        val samples = new Array[Int](w * h)
        img.getRaster.getSamples(0, 0, w, h, 0, samples)
        (w, h, samples.map(_.toByte))
    }
  }

  /** 64-bit average hash of an 8×8 grayscale thumbnail — the classic
    * perceptual near-dup fingerprint: bit k set iff thumb(k) is
    * STRICTLY above the thumbnail mean, compared integer-exactly
    * (t(k)·64 > Σt — no double mean, so an engine with no FP can
    * replay every bit). Near-duplicate images land within a few bits
    * of Hamming distance; exact-byte hashing (md5 of the payload)
    * catches none of them, which is why image dedup needs this and not
    * the text path's content hash. */
  def aHash64(thumb: Array[Byte]): Long = {
    require(thumb.length == 64, s"aHash64 expects an 8x8 thumb, got ${thumb.length}")
    var sum = 0L
    var k = 0
    while (k < 64) { sum += (thumb(k) & 0xff); k += 1 }
    var h = 0L
    k = 0
    while (k < 64) {
      if ((thumb(k) & 0xff) * 64L > sum) h |= 1L << k
      k += 1
    }
    h
  }

  /** Nearest-neighbor resample over DECODED pixels (deterministic
    * arithmetic — sx = x*w/w2 integer division — so an oracle can
    * replay the sampled indices exactly). */
  def resizeNearest(pixels: Array[Byte], width: Int, height: Int,
                    w2: Int, h2: Int): Array[Byte] = {
    require(pixels.length == width * height && w2 >= 1 && h2 >= 1)
    val out = new Array[Byte](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * width / w2).toInt
        val sy = (y.toLong * height / h2).toInt
        out(y * w2 + x) = pixels(sy * width + sx)
        x += 1
      }
      y += 1
    }
    out
  }
}

/** REAL audio codec on the JDK's built-in javax.sound.sampled (WAV/PCM
  * ships with the JVM): 8-bit unsigned mono PCM encode + decode. */
object AudioCodec {
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
  import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}

  private def pcm8Mono = new AudioFormat(
    AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)

  // Provider pinning: AudioSystem.write / getAudioInputStream re-scan the
  // SPI registry on EVERY call (and the scan contends across concurrent
  // decode tasks) — measured at 5-10x the cost of the actual WAV work for
  // clip-sized payloads (32-thread microbench: 0.30-0.38 s → 0.04-0.06 s
  // per 12.8k clips). Resolve the JDK's own WAVE provider ONCE and call
  // it directly: the very same codec object the registry would return,
  // byte-identical output (asserted in the microbench and MultimodalSpec).
  // Providers are stateless per call (each write/read builds its own
  // stream state), so one shared instance is thread-safe. Null-guarded:
  // an exotic JRE without the provider falls back to the registry path.
  private val waveWriter: AudioFileWriter = {
    val it = java.util.ServiceLoader.load(classOf[AudioFileWriter]).iterator()
    var found: AudioFileWriter = null
    while (found == null && it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(AudioFileFormat.Type.WAVE)) found = w
    }
    found
  }
  private val waveReader: AudioFileReader = {
    // the STANDARD PCM reader (WaveFileReader) — the float/extensible
    // variants reject plain PCM payloads and defer to it anyway
    val it = java.util.ServiceLoader.load(classOf[AudioFileReader]).iterator()
    var found: AudioFileReader = null
    while (it.hasNext) {
      val r = it.next()
      val n = r.getClass.getSimpleName
      if (n == "WaveFileReader") found = r
    }
    found
  }

  /** Encode 8-bit unsigned samples as a WAV file (RIFF header + PCM). */
  def encodeWav(samples: Array[Byte]): Array[Byte] = {
    val in = new AudioInputStream(
      new ByteArrayInputStream(samples), pcm8Mono, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    if (waveWriter != null) waveWriter.write(in, AudioFileFormat.Type.WAVE, out)
    else AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a WAV payload to its PCM samples via the real RIFF parser
    * (the JDK's WAVE AudioFileReader — parses the container, not our
    * writer); falls back to the full AudioSystem registry for anything
    * the standard PCM reader rejects. */
  def decodeWav(payload: Array[Byte]): Array[Byte] = {
    val in =
      if (waveReader != null)
        try waveReader.getAudioInputStream(new ByteArrayInputStream(payload))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException =>
          AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
        }
      else AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try in.readAllBytes() finally in.close()
  }
}

