package graft.pipeline

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Specs for the multimodal column plumbing: binary payload + typed
  * metadata, mapPartitions batch decode (REAL JDK codecs: ImageIO PNG/
  * JPEG, javax.sound WAV, ISO-BMFF demux), column pruning. */
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

  test("video sample tables: demuxed ranges slice exactly the encoded frames") {
    val (w, h) = (24, 18)
    val frames = (0 until 5).map(f =>
      ImageCodec.encodeGrayPng(
        Array.tabulate(w * h)(i => ((f * 7 + i) % 256).toByte), w, h))
    val mp4 = VideoContainer.encodeMp4Frames(w, h, 600, 25, frames)
    val ranges = VideoContainer.videoSampleRanges(mp4)
    assert(ranges.length == 5)
    // each demuxed range recovers the EXACT encoded frame bytes — the
    // stsz/stsc/stco tables really locate the samples, offsets absolute
    ranges.zip(frames).foreach { case ((off, sz), orig) =>
      assert(sz == orig.length)
      val sliced = java.util.Arrays.copyOfRange(mp4, off.toInt, (off + sz).toInt)
      assert(sliced.toSeq == orig.toSeq)
    }
    // frames are contiguous in the single mdat chunk
    ranges.sliding(2).foreach { case Seq((o1, s1), (o2, _)) =>
      assert(o2 == o1 + s1)
    }
    // the metadata walk still agrees with the richer layout
    val m = VideoContainer.parseMp4(mp4)
    assert(m.videoFrames == 5 && m.width == w && m.height == h)
  }

  test("video frame decode is REAL: tampered frame bytes change the decoded pixels") {
    val (w, h) = (16, 16)
    val px = Array.tabulate(w * h)(i => (i % 256).toByte)
    val mp4 = VideoContainer.encodeMp4Frames(w, h, 600, 25,
      Seq(ImageCodec.encodeGrayPng(px, w, h)))
    val Seq((off, sz)) = VideoContainer.videoSampleRanges(mp4).toSeq
    val (dw, dh, dec) = ImageCodec.decodeGray(
      java.util.Arrays.copyOfRange(mp4, off.toInt, (off + sz).toInt))
    assert((dw, dh) == (w, h) && dec.toSeq == px.toSeq)
    // corrupt one payload byte inside the frame: a stub that derives
    // features from arithmetic would not notice; the real decoder must
    // either fail or produce different pixels
    val bad = mp4.clone()
    bad(off.toInt + sz.toInt / 2) = (bad(off.toInt + sz.toInt / 2) ^ 0x55).toByte
    val changed =
      try {
        val (_, _, d2) = ImageCodec.decodeGray(
          java.util.Arrays.copyOfRange(bad, off.toInt, (off + sz).toInt))
        d2.toSeq != dec.toSeq
      } catch { case _: Exception => true }
    assert(changed, "decode must depend on the actual frame bytes")
  }

  test("MJPEG: JPEG-coded frames decode through the same call sites") {
    // the lossy sibling: frames coded as real JPEG inside the same
    // ISO-BMFF layout — dims exact, decode deterministic, DC preserved
    // within JPEG tolerance (the exact oracle rides PNG frames instead)
    val (w, h) = (32, 24)
    val srcs = (0 until 3).map(f =>
      Array.tabulate(w * h)(i => ((f * 7 + i) % 256).toByte))
    val mp4 = VideoContainer.encodeMp4Frames(w, h, 600, 25,
      srcs.map(ImageCodec.encodeGrayJpeg(_, w, h)))
    val ranges = VideoContainer.videoSampleRanges(mp4)
    assert(ranges.length == 3)
    ranges.zip(srcs).foreach { case ((off, sz), src) =>
      val bytes = java.util.Arrays.copyOfRange(mp4, off.toInt, (off + sz).toInt)
      // JPEG SOI marker: real JPEG bytes inside the container
      assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      val (dw, dh, dec) = ImageCodec.decodeGray(bytes)
      assert((dw, dh) == (w, h))
      val srcMean = src.iterator.map(_ & 0xff).sum.toDouble / (w * h)
      val decMean = dec.iterator.map(_ & 0xff).sum.toDouble / (w * h)
      assert(math.abs(srcMean - decMean) < 3.0,
        s"JPEG decode mean $decMean too far from source $srcMean")
      // deterministic within the JVM: same bytes → same pixels
      val (_, _, again) = ImageCodec.decodeGray(bytes)
      assert(again.toSeq == dec.toSeq)
    }
  }

  test("synthVideoFrames: decoded features equal the generator formula exactly") {
    implicit val s = spark
    val got = Multimodal.synthVideoFrames(
      Tables.documents(spark, sf()).limit(50))(s).collect()
    assert(got.length == 200) // 4 scheduled frames per doc
    got.foreach { f =>
      val id = f.doc_id
      val w = 16 + id % 32; val h = 16 + id % 24; val n = 4 + id % 6
      assert(f.width_px == w && f.height_px == h && f.n_px == w * h)
      assert(f.frame_idx == f.k * n / 4)
      val expected = (0L until w * h)
        .map(i => (id * 31 + f.frame_idx * 7 + i) % 256).sum
      assert(f.luma_sum == expected, s"doc $id frame ${f.frame_idx}")
    }
  }

  test("malformed sample tables fail loudly, never slice garbage") {
    val mp4 = VideoContainer.encodeMp4Frames(16, 16, 600, 25,
      Seq(ImageCodec.encodeGrayPng(new Array[Byte](256), 16, 16)))
    // metadata-only layout (no stco/stsc tables): demux must refuse
    val metaOnly = VideoContainer.encodeMp4(16, 16, 600, 25, 1, withAudio = false)
    val e = intercept[IllegalArgumentException](
      VideoContainer.videoSampleRanges(metaOnly))
    // loud either way: the legacy stsz (count, no table) fails its own
    // fit check, or the missing stco/stsc fail the presence check
    assert(e.getMessage.contains("sample tables") || e.getMessage.contains("stsz"))
    // an stsz pointing past EOF must fail the range check, not AIOOBE:
    // truncate the file just after moov (drop most of the mdat)
    val truncated = java.util.Arrays.copyOf(mp4, mp4.length - 100)
    intercept[IllegalArgumentException](
      VideoContainer.videoSampleRanges(truncated))
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

  test("real resize distributes via mapPartitions over decoded rasters") {
    implicit val s = spark
    import s.implicits._
    val resized = media.as[MediaRow].mapPartitions(_.map { m =>
      // decode-shaped work per row: synthesize the raster from the
      // payload bytes (repeating), resample through the REAL
      // nearest-neighbor path used by the thumbnail/aHash pipeline
      val px = Array.tabulate(m.width * m.height)(i => m.payload(i % m.payload.length))
      (m.doc_id, ImageCodec.resizeNearest(px, m.width, m.height, 4, 4))
    }).collect()
    assert(resized.length == 500)
    resized.foreach { case (_, bytes) => assert(bytes.length == 16) }
  }

  test("REAL PNG codec: encode→decode round trip is pixel-exact") {
    val (w, h) = (37, 23)
    val px = Array.tabulate(w * h)(i => ((i * 31 + 7) % 256).toByte)
    val png = ImageCodec.encodeGrayPng(px, w, h)
    // PNG magic: a real container came out of the encoder
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (dw, dh, dec) = ImageCodec.decodeGray(png)
    assert((dw, dh) == (w, h))
    assert(dec.toSeq == px.toSeq, "gray8 PNG decode must be lossless")
    // resample arithmetic matches the oracle formula exactly
    val thumb = ImageCodec.resizeNearest(dec, w, h, 8, 8)
    val expected = (0 until 64).map { k =>
      val sx = ((k % 8).toLong * w / 8).toInt
      val sy = ((k / 8).toLong * h / 8).toInt
      px(sy * w + sx)
    }
    assert(thumb.toSeq == expected)
  }

  test("REAL WAV codec: encode→decode round trip is sample-exact") {
    val samples = Array.tabulate(777)(i => ((i * 31 + 3) % 256).toByte)
    val wav = AudioCodec.encodeWav(samples)
    // RIFF/WAVE magic: a real container came out of the encoder
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(AudioCodec.decodeWav(wav).toSeq == samples.toSeq)
  }

  test("synthDecodedMedia: decoded features equal the content formula") {
    implicit val s = spark
    val got = Multimodal.synthDecodedMedia(Tables.documents(spark, sf()))
      .collect().map(d => d.doc_id -> d).toMap
    assert(got.size == 500)
    val id = 42L
    val (w, h) = ((16 + id % 64).toInt, (16 + id % 48).toInt)
    val d = got(id)
    assert(d.width_px == w && d.height_px == h)
    val mean = (0 until w * h).map(i => (id * 31 + i) % 256).sum.toDouble / (w * h)
    assert(d.mean_luma == mean, "decoded mean luma must equal the formula")
    val n = (256 + id % 512).toInt
    val amean = (0 until n).map(i => (id * 31 + i) % 256).sum.toDouble / n
    assert(d.audio_n == n && d.audio_mean == amean)
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

  test("mp4 container: write → independent box-walk parse round-trips the metadata") {
    val mp4 = VideoContainer.encodeMp4(width = 640, height = 360,
      timescale = 600, sampleDelta = 25, nFrames = 48, withAudio = true,
      mdatPayload = Array.tabulate(100)(_.toByte))
    val m = VideoContainer.parseMp4(mp4)
    assert(m.nTracks == 2 && m.handlers == Seq("vide", "soun"))
    assert(m.timescale == 600 && m.duration == 48L * 25)
    assert(m.width == 640 && m.height == 360 && m.videoFrames == 48)
    // video-only file
    val solo = VideoContainer.parseMp4(VideoContainer.encodeMp4(
      16, 16, 1000, 40, 250, withAudio = false))
    assert(solo.nTracks == 1 && solo.handlers == Seq("vide") &&
      solo.duration == 10000 && solo.videoFrames == 250)
  }

  test("mp4 parser skips unknown leaves by length and fails loudly on malformed") {
    val mp4 = VideoContainer.encodeMp4(32, 24, 600, 30, 10, withAudio = false)
    // prepend a spec-legal unknown box ('free'): parse must skip it
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4)
    val m = VideoContainer.parseMp4(free ++ mp4)
    assert(m.width == 32 && m.height == 24 && m.videoFrames == 10)
    // truncated mid-box: loud failure, not a zero-filled answer
    intercept[IllegalArgumentException] {
      VideoContainer.parseMp4(mp4.dropRight(mp4.length / 2))
    }
    // garbage bytes: no mvhd → loud failure
    intercept[IllegalArgumentException] {
      VideoContainer.parseMp4(Array.tabulate(64)(_.toByte))
    }
  }

  test("mp4 parser bounds fixed-layout reads by the box body") {
    val mp4 = VideoContainer.encodeMp4(32, 24, 600, 30, 10, withAudio = false)
    // adversarial stts: overwrite the declared entry count with a value
    // that cannot fit the box body — the parse must fail the framing
    // require, not read sibling-box bytes as frame durations
    def indexOf(pat: Array[Byte]): Int =
      mp4.indices.indexWhere(i => i + pat.length <= mp4.length &&
        pat.indices.forall(j => mp4(i + j) == pat(j)))
    val stts = indexOf("stts".getBytes("US-ASCII"))
    assert(stts > 0, "fixture must contain an stts box")
    val evil = mp4.clone()
    // box header at stts-4; body at +8; entry count at body+4
    val cntOff = stts - 4 + 8 + 4
    evil(cntOff) = 0x7f.toByte; evil(cntOff + 1) = 0xff.toByte
    evil(cntOff + 2) = 0xff.toByte; evil(cntOff + 3) = 0xff.toByte
    val e = intercept[IllegalArgumentException] { VideoContainer.parseMp4(evil) }
    assert(e.getMessage.contains("stts"), s"wrong failure: ${e.getMessage}")
    // empty mvhd body: the version read must be a loud require, not a
    // raw ArrayIndexOutOfBoundsException
    val emptyMvhd = Array[Byte](0, 0, 0, 8) ++ "mvhd".getBytes("US-ASCII")
    val e2 = intercept[IllegalArgumentException] {
      VideoContainer.parseMp4(emptyMvhd)
    }
    assert(e2.getMessage.contains("mvhd"), s"wrong failure: ${e2.getMessage}")
  }

  test("aHash64: strict-above-mean bits, two's-complement bit 63, length guard") {
    // uniform thumb: no pixel STRICTLY above the mean → hash 0
    assert(ImageCodec.aHash64(Array.fill(64)(7.toByte)) === 0L)
    // one bright pixel at cell 0: only it exceeds the mean → bit 0
    val one = Array.fill(64)(0.toByte); one(0) = 64.toByte
    assert(ImageCodec.aHash64(one) === 1L)
    // bright pixel at cell 63 → bit 63 = Long.MIN_VALUE two's complement
    val top = Array.fill(64)(0.toByte); top(63) = 64.toByte
    assert(ImageCodec.aHash64(top) === Long.MinValue)
    // bytes are unsigned luma: 0xFF must read as 255, not -1
    val neg = Array.fill(64)(0.toByte); neg(5) = 0xff.toByte
    assert(ImageCodec.aHash64(neg) === (1L << 5))
    // exactly-at-mean is NOT above: alternating 0/2 (mean 1·64=Σ=64)
    val half = Array.tabulate(64)(i => if (i % 2 == 0) 2.toByte else 0.toByte)
    assert(java.lang.Long.bitCount(ImageCodec.aHash64(half)) === 32)
    intercept[IllegalArgumentException] {
      ImageCodec.aHash64(Array.fill(63)(0.toByte))
    }
  }

  test("perceptual hashes: perturbed image stays near, unrelated image lands far") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val rows = Multimodal.synthPerceptualHashes(docs)(spark).collect()
    assert(rows.length === 40)
    assert(rows.forall(_.near_ab === 1L),
      "every +8-perturbed copy must classify as a near-dup")
    assert(rows.count(_.near_ac === 0L) >= 35,
      "unrelated images must overwhelmingly classify far")
    assert(rows.forall(r => r.ham_ab === java.lang.Long.bitCount(r.ahash_a ^ r.ahash_b)))
  }

  test("video hashes: the demuxed+decoded keyframe classifies near/far like the image path") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val rows = Multimodal.synthVideoHashes(docs)(spark).collect()
    assert(rows.length === 40)
    assert(rows.forall(_.near_ab === 1L),
      "every +8-perturbed video must classify as a near-dup")
    assert(rows.count(_.near_ac === 0L) >= 35,
      "unrelated videos must overwhelmingly classify far")
    assert(rows.forall(r => r.ham_ab === java.lang.Long.bitCount(r.ahash_a ^ r.ahash_b)))
  }

  test("video sequence hashes: trimmed copy caught by the multiset, missed by the middle frame on odd n") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val rows = Multimodal.synthVideoSeqHashes(docs)(spark).collect()
    assert(rows.length === 40)
    rows.foreach { r =>
      // the trimmed copy's keyframes are a sub-multiset of the original's
      assert(r.matched_ab === r.n_frames - 1,
        s"doc ${r.doc_id}: trimmed overlap ${r.matched_ab} != ${r.n_frames - 1}")
      assert(r.near_seq_ab === 1L)
      // the blind spot is deterministic: the trim shifts the middle
      // keyframe index, so the single-frame comparison holds exactly
      // when n is even (odd n may still collide by hash accident)
      if (r.n_frames % 2 == 0)
        assert(r.mid_ab === 1L, s"doc ${r.doc_id}: even-n middle frames differ")
    }
    // odd-n middles hold DIFFERENT content, but aHash is invariant to a
    // uniform pixel shift that avoids mod-256 wraps, so some odd
    // middles still collide (+7·Δf is uniform within a frame) — the
    // blind spot only needs to be COMMON to make the sequence operator
    // necessary, and it is: a majority of odd-n trims defeat the
    // single-frame hash while the sequence match catches every one
    val odd = rows.filter(_.n_frames % 2 == 1)
    assert(odd.count(_.mid_ab === 0L) > odd.length * 0.5,
      "a majority of odd-n trims must defeat the single middle-frame hash")
    assert(rows.count(_.near_seq_ac === 0L) >= 36,
      "unrelated clips must overwhelmingly classify far")
  }

  test("audio fingerprints: perturbed clip at Hamming 0, inverted clip at exactly 64") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val rows = Multimodal.synthAudioHashes(docs)(spark).collect()
    assert(rows.length === 40)
    // the margin analysis is deterministic, so the verdicts are exact,
    // not statistical: +8 jitter cannot flip any frame-energy sign
    // (margin ≥ 240·⌊n/64⌋/n — worst ~3.0 at uneven frame splits,
    // 3.75 when 64 | n — vs shift ≤ 8/⌊n/64⌋ + 64/n ≤ ~2.25),
    // inversion flips every one
    assert(rows.forall(_.ham_ab === 0L),
      "every +8-perturbed clip must hash identically")
    assert(rows.forall(_.ham_ac === 64L),
      "the envelope-inverted clip must flip every bit")
    assert(rows.forall(r => r.near_ab === 1L && r.near_ac === 0L))
    // pinned envelope bits 0/31 → both levels always occur → the hash
    // is never degenerate (all-zero / all-one)
    assert(rows.forall(r => r.fp_a != 0L && r.fp_a != -1L))
  }

  test("spectral audio fingerprints: exact x2 gain at Hamming 0, spectral inversion at exactly 64") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val rows = Multimodal.synthSpectralAudioHashes(docs)(spark).collect()
    assert(rows.length === 40)
    // gain invariance is EXACT (both comparison sides scale linearly,
    // no rounding, no clipping), not a margin argument
    assert(rows.forall(_.ham_ab === 0L),
      "every x2 gain-scaled clip must hash identically")
    assert(rows.forall(_.ham_ac === 64L),
      "the spectrally-inverted clip must flip every bit")
    assert(rows.forall(r => r.near_ab === 1L && r.near_ac === 0L))
    // pinned spec bits 0/31 → both frame classes always occur → the
    // hash is never degenerate
    assert(rows.forall(r => r.fp_a != 0L && r.fp_a != -1L))
    // contrast with the ENERGY hash: it keys on levels, so the gain
    // clip is where the spectral variant earns its keep — verify the
    // spectral hash actually differs from the energy hash's bitmask
    // (they sign different signals off the same clips)
    val energy = Multimodal.synthAudioHashes(docs)(spark).collect()
      .map(r => r.doc_id -> r.fp_a).toMap
    assert(rows.count(r => energy(r.doc_id) != r.fp_a) > 30,
      "spectral and energy hashes should rarely coincide")
  }

  test("audio fingerprint decode is REAL: a corrupted RIFF payload fails, not stubs through") {
    val wav = AudioCodec.encodeWav(Array.tabulate(64)(i => i.toByte))
    assert(AudioCodec.decodeWav(wav).length === 64)
    val bad = wav.clone()
    bad(0) = 'X'.toByte // break the RIFF magic
    intercept[Exception] { AudioCodec.decodeWav(bad) }
  }
}
