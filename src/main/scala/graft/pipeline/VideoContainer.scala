package graft.pipeline

import java.io.ByteArrayOutputStream

/** REAL MP4 (ISO base media file format) container handling — the video
  * half of the multimodal column that needs NO codec: an MP4 is a tree
  * of length-prefixed boxes, and every metadata field a pipeline wants
  * (duration, track count, frame count, display size, handler types)
  * lives in fixed-layout header boxes. Container metadata parse is pure
  * arithmetic, the same walk ffprobe/mp4dump do — and for MJPEG-style
  * files (every sample a standalone intra-coded image) pixel decode
  * needs no video codec either: [[videoSampleRanges]] demuxes the real
  * sample-table byte ranges and ImageIO decodes each frame
  * ([[Multimodal.synthVideoFrames]]).
  *
  * [[encodeMp4]] writes a structurally valid minimal file — ftyp, moov
  * (mvhd, one trak per stream with tkhd/mdia/mdhd/hdlr/minf/stbl, the
  * stts table carrying the real frame count and timing), mdat — and
  * [[parseMp4]] walks the boxes back out, recursing only into the
  * container boxes the spec defines as containers and trusting nothing
  * else: reader and writer share no state, so a parse of encoded bytes
  * is a genuine round trip through the interchange format. Both ends
  * fail loudly on malformed framing (truncated box, size < 8).
  *
  * Scale shape: parse cost is a few dozen header bytes per file
  * regardless of payload size (boxes are skipped by their length
  * field, the mdat is never read) — the narrow mapPartitions metadata
  * pass over a binary column, payloads pruned unless asked for. */
object VideoContainer {

  /** Parsed container metadata; `handlers` in trak order (e.g.
    * Seq("vide", "soun")), width/height/frames from the FIRST video
    * trak, duration/timescale from mvhd. */
  final case class Mp4Meta(nTracks: Int, timescale: Long, duration: Long,
                           width: Int, height: Int, videoFrames: Long,
                           handlers: Seq[String])

  // ---- writer ---------------------------------------------------------

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(fourcc: String, parts: Array[Byte]*): Array[Byte] = {
    require(fourcc.length == 4, s"fourcc must be 4 chars: $fourcc")
    val body = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
    be32(8L + body.length) ++ fourcc.getBytes("US-ASCII") ++ body
  }

  private val identityMatrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
    be32(0) ++ be32(0x00010000L) ++ be32(0) ++
    be32(0) ++ be32(0) ++ be32(0x40000000L)

  private def fullBoxHeader(version: Int = 0, flags: Int = 0): Array[Byte] =
    Array(version.toByte, ((flags >> 16) & 0xff).toByte,
      ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte)

  private def trak(handler: String, trackId: Int, duration: Long,
                   width: Int, height: Int, timescale: Long,
                   sampleDelta: Long, nSamples: Long,
                   sampleSizes: Seq[Int] = Nil,
                   chunkOffset: Long = -1L): Array[Byte] = {
    val tkhd = box("tkhd", fullBoxHeader(flags = 7), // enabled|inMovie|inPreview
      be32(0), be32(0),                  // creation, modification
      be32(trackId.toLong), be32(0),     // track id, reserved
      be32(duration),
      be32(0), be32(0),                  // reserved
      be16(0), be16(0), be16(0), be16(0),// layer, altGroup, volume, reserved
      identityMatrix,
      be32(width.toLong << 16), be32(height.toLong << 16)) // 16.16 fixed
    val mdhd = box("mdhd", fullBoxHeader(),
      be32(0), be32(0), be32(timescale), be32(duration),
      be16(0x55c4), be16(0))             // language "und", predefined
    val hdlr = box("hdlr", fullBoxHeader(),
      be32(0), handler.getBytes("US-ASCII"),
      be32(0), be32(0), be32(0),
      Array[Byte](0))                    // empty null-terminated name
    // one stts run: nSamples frames, sampleDelta ticks each — the REAL
    // frame count and timing a demuxer reads
    val stts = box("stts", fullBoxHeader(), be32(1),
      be32(nSamples), be32(sampleDelta))
    val stsd = box("stsd", fullBoxHeader(), be32(0))
    // REAL sample tables when per-sample sizes are given (the MJPEG
    // path): stsz carries each frame's byte size, stsc maps every
    // sample into the single mdat chunk, stco records that chunk's
    // absolute file offset — the three tables a demuxer intersects to
    // locate frame bytes. Without sizes, the legacy metadata-only
    // layout (count in stsz, empty stsc/stco) is preserved.
    val stsz =
      if (sampleSizes.nonEmpty)
        box("stsz", fullBoxHeader(), be32(0), be32(sampleSizes.length.toLong),
          sampleSizes.map(sz => be32(sz.toLong)).foldLeft(Array.emptyByteArray)(_ ++ _))
      else box("stsz", fullBoxHeader(), be32(0), be32(nSamples))
    val stsc =
      if (sampleSizes.nonEmpty)
        box("stsc", fullBoxHeader(), be32(1),
          be32(1), be32(sampleSizes.length.toLong), be32(1)) // one chunk, all samples
      else box("stsc", fullBoxHeader(), be32(0))
    val stco =
      if (sampleSizes.nonEmpty) box("stco", fullBoxHeader(), be32(1), be32(chunkOffset))
      else box("stco", fullBoxHeader(), be32(0))
    val header =
      if (handler == "vide")
        box("vmhd", fullBoxHeader(flags = 1), be16(0),
          be16(0), be16(0), be16(0))
      else
        box("smhd", fullBoxHeader(), be16(0), be16(0))
    val dref = box("dref", fullBoxHeader(), be32(1),
      box("url ", fullBoxHeader(flags = 1))) // self-contained
    val minf = box("minf", header, box("dinf", dref),
      box("stbl", stsd, stts, stsc, stsz, stco))
    box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
  }

  /** Write a minimal, structurally valid MP4: ftyp + moov (mvhd + one
    * video trak, optionally one audio trak) + a small mdat. `duration`
    * = nFrames × sampleDelta ticks at `timescale` ticks/second. */
  def encodeMp4(width: Int, height: Int, timescale: Int, sampleDelta: Int,
                nFrames: Int, withAudio: Boolean,
                mdatPayload: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    require(width > 0 && height > 0 && timescale > 0 &&
      sampleDelta > 0 && nFrames > 0, "all mp4 parameters must be positive")
    val duration = nFrames.toLong * sampleDelta
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp41".getBytes("US-ASCII"))
    val mvhd = box("mvhd", fullBoxHeader(),
      be32(0), be32(0), be32(timescale.toLong), be32(duration),
      be32(0x00010000L), be16(0x0100), be16(0),   // rate, volume, reserved
      be32(0), be32(0), identityMatrix,
      Array.fill(24)(0.toByte),                   // predefined
      be32(if (withAudio) 3L else 2L))            // next track id
    val video = trak("vide", 1, duration, width, height,
      timescale.toLong, sampleDelta.toLong, nFrames.toLong)
    val audio =
      if (withAudio)
        trak("soun", 2, duration, 0, 0, timescale.toLong,
          sampleDelta.toLong, nFrames.toLong)
      else Array.emptyByteArray
    val out = new ByteArrayOutputStream()
    out.write(ftyp)
    out.write(box("moov", mvhd, video, audio))
    out.write(box("mdat", mdatPayload))
    out.toByteArray
  }

  /** Write an MJPEG-style MP4: each element of `frames` is one complete
    * intra-coded image (JPEG or PNG bytes — any ImageIO-decodable
    * format), stored back-to-back in the mdat with REAL sample tables
    * (per-frame sizes in stsz, single-chunk stsc, the mdat body's
    * absolute file offset in stco) — the layout a real MJPEG-in-MP4
    * file uses, which is exactly why the JDK can decode its frames:
    * every sample is a standalone image, no inter-frame state.
    *
    * Two-pass build: stco needs the mdat body offset, which depends on
    * moov's length — but moov's LENGTH is offset-value-independent, so
    * the moov is built once with a placeholder to measure, then rebuilt
    * with the real offset. */
  def encodeMp4Frames(width: Int, height: Int, timescale: Int,
                      sampleDelta: Int, frames: Seq[Array[Byte]],
                      withAudio: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "encodeMp4Frames needs at least one frame")
    require(width > 0 && height > 0 && timescale > 0 && sampleDelta > 0,
      "all mp4 parameters must be positive")
    val nFrames = frames.length
    val duration = nFrames.toLong * sampleDelta
    val sizes = frames.map(_.length)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp41".getBytes("US-ASCII"))
    def moovAt(mdatBodyOff: Long): Array[Byte] = {
      val mvhd = box("mvhd", fullBoxHeader(),
        be32(0), be32(0), be32(timescale.toLong), be32(duration),
        be32(0x00010000L), be16(0x0100), be16(0),
        be32(0), be32(0), identityMatrix,
        Array.fill(24)(0.toByte),
        be32(if (withAudio) 3L else 2L))
      val video = trak("vide", 1, duration, width, height,
        timescale.toLong, sampleDelta.toLong, nFrames.toLong,
        sampleSizes = sizes, chunkOffset = mdatBodyOff)
      val audio =
        if (withAudio)
          trak("soun", 2, duration, 0, 0, timescale.toLong,
            sampleDelta.toLong, nFrames.toLong)
        else Array.emptyByteArray
      box("moov", mvhd, video, audio)
    }
    val moovLen = moovAt(0L).length
    val mdatBodyOff = ftyp.length.toLong + moovLen + 8L
    val mdat = frames.foldLeft(Array.emptyByteArray)(_ ++ _)
    val out = new ByteArrayOutputStream()
    out.write(ftyp)
    out.write(moovAt(mdatBodyOff))
    out.write(box("mdat", mdat))
    out.toByteArray
  }

  // ---- parser ---------------------------------------------------------

  private def rdBe32(b: Array[Byte], off: Int): Long = {
    require(off + 4 <= b.length, s"truncated mp4: need 4 bytes at $off")
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  }
  private def rdBe64(b: Array[Byte], off: Int): Long =
    (rdBe32(b, off) << 32) | rdBe32(b, off + 4)
  private def fourcc(b: Array[Byte], off: Int): String = {
    require(off + 4 <= b.length, s"truncated mp4: need fourcc at $off")
    new String(b, off, 4, "US-ASCII")
  }

  // the spec's pure container boxes this parser recurses into
  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Walk the box tree of any ISO-BMFF payload and extract the
    * container metadata (movie timescale/duration from mvhd, per-trak
    * handler from hdlr, display size from the video trak's tkhd, frame
    * count = total stts sample count of the video trak). Handles
    * 64-bit `largesize` boxes; fails loudly on malformed framing. */
  def parseMp4(payload: Array[Byte]): Mp4Meta = {
    var timescale = 0L
    var duration = 0L
    var width = 0
    var height = 0
    var videoFrames = 0L
    val handlers = scala.collection.mutable.ArrayBuffer.empty[String]
    // per-trak state, committed when the trak closes
    var trakHandler: String = null
    var trakW = 0
    var trakH = 0
    var trakFrames = 0L

    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off < end) {
        require(off + 8 <= end, s"truncated mp4 box header at $off")
        val size0 = rdBe32(payload, off)
        val name = fourcc(payload, off + 4)
        val (bodyOff, size) =
          if (size0 == 1L) (off + 16, rdBe64(payload, off + 8))
          else if (size0 == 0L) (off + 8, (end - off).toLong) // to EOF
          else (off + 8, size0)
        require(size >= (bodyOff - off) && off + size <= end,
          s"malformed mp4 box '$name' at $off: size $size exceeds range $end")
        val bodyEnd = off + size.toInt
        // fixed-layout field reads are bounded by the box's OWN body —
        // a corrupt size/count must fail the same loud require as bad
        // framing, not read sibling-box bytes or throw a raw AIOOBE
        def bounded(need: Int): Unit =
          require(bodyOff + need <= bodyEnd,
            s"malformed mp4 box '$name' at $off: body ${bodyEnd - bodyOff} " +
              s"bytes, needs $need")
        name match {
          case "mvhd" =>
            bounded(1)
            val v = payload(bodyOff) & 0xff
            if (v == 1) {
              bounded(32)
              timescale = rdBe32(payload, bodyOff + 20)
              duration = rdBe64(payload, bodyOff + 24)
            } else {
              bounded(20)
              timescale = rdBe32(payload, bodyOff + 12)
              duration = rdBe32(payload, bodyOff + 16)
            }
          case "tkhd" =>
            bounded(16)
            // width/height are the LAST 8 bytes of tkhd in both versions
            trakW = (rdBe32(payload, bodyEnd - 8) >> 16).toInt
            trakH = (rdBe32(payload, bodyEnd - 4) >> 16).toInt
          case "hdlr" =>
            bounded(12)
            trakHandler = fourcc(payload, bodyOff + 8)
          case "stts" =>
            bounded(8)
            val entries = rdBe32(payload, bodyOff + 4).toInt
            // the declared count must FIT the body: 8 bytes per entry
            // after the 8-byte header (an adversarial count would
            // otherwise read sibling-box bytes as durations, or a
            // negative one silently yield 0 frames)
            require(entries >= 0 && entries.toLong * 8 <= (bodyEnd - bodyOff - 8).toLong,
              s"malformed mp4 stts at $off: $entries entries exceed body " +
                s"${bodyEnd - bodyOff} bytes")
            var i = 0
            var total = 0L
            while (i < entries) {
              total += rdBe32(payload, bodyOff + 8 + i * 8)
              i += 1
            }
            trakFrames = total
          case "trak" =>
            trakHandler = null; trakW = 0; trakH = 0; trakFrames = 0L
            walk(bodyOff, bodyEnd)
            handlers += (if (trakHandler == null) "????" else trakHandler)
            if (trakHandler == "vide" && width == 0) {
              width = trakW; height = trakH; videoFrames = trakFrames
            }
          case c if Containers(c) =>
            walk(bodyOff, bodyEnd)
          case _ => () // leaf we don't need (ftyp, mdat, ...): skip by size
        }
        off = bodyEnd
      }
    }
    walk(0, payload.length)
    require(timescale > 0, "not an mp4: no mvhd box found")
    Mp4Meta(handlers.length, timescale, duration, width, height,
      videoFrames, handlers.toSeq)
  }

  /** DEMUX the first video trak's sample byte ranges from its REAL
    * sample tables — the stsc/stco/stsz intersection every demuxer
    * performs: stsc runs assign samples to chunks, stco gives each
    * chunk's absolute file offset, stsz each sample's size; a sample's
    * range is its chunk offset plus the sizes of the samples before it
    * in that chunk. Returns (absoluteOffset, size) in sample order.
    * Fails loudly on inconsistent tables (declared counts that don't
    * fit their boxes, ranges past EOF, missing tables). */
  def videoSampleRanges(payload: Array[Byte]): IndexedSeq[(Long, Long)] = {
    var sizes: IndexedSeq[Long] = null
    var chunkOffs: IndexedSeq[Long] = null
    var stscRuns: IndexedSeq[(Long, Long)] = null // (firstChunk, samplesPerChunk)
    var trakHandler: String = null
    var tSizes: IndexedSeq[Long] = null
    var tChunkOffs: IndexedSeq[Long] = null
    var tRuns: IndexedSeq[(Long, Long)] = null

    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off < end) {
        require(off + 8 <= end, s"truncated mp4 box header at $off")
        val size0 = rdBe32(payload, off)
        val name = fourcc(payload, off + 4)
        val (bodyOff, size) =
          if (size0 == 1L) (off + 16, rdBe64(payload, off + 8))
          else if (size0 == 0L) (off + 8, (end - off).toLong)
          else (off + 8, size0)
        require(size >= (bodyOff - off) && off + size <= end,
          s"malformed mp4 box '$name' at $off: size $size exceeds range $end")
        val bodyEnd = off + size.toInt
        def entries(headerBytes: Int, perEntry: Int): Int = {
          val n = rdBe32(payload, bodyOff + 4).toInt
          require(n >= 0 && n.toLong * perEntry <= (bodyEnd - bodyOff - headerBytes).toLong,
            s"malformed mp4 $name at $off: $n entries exceed body")
          n
        }
        name match {
          case "hdlr" => trakHandler = fourcc(payload, bodyOff + 8)
          case "stsz" =>
            val fixed = rdBe32(payload, bodyOff + 4)
            val n = rdBe32(payload, bodyOff + 8).toInt
            if (fixed != 0L) tSizes = IndexedSeq.fill(n)(fixed)
            else {
              require(n >= 0 && n.toLong * 4 <= (bodyEnd - bodyOff - 12).toLong,
                s"malformed mp4 stsz at $off: $n sizes exceed body")
              tSizes = (0 until n).map(i => rdBe32(payload, bodyOff + 12 + i * 4))
            }
          case "stco" =>
            val n = entries(8, 4)
            tChunkOffs = (0 until n).map(i => rdBe32(payload, bodyOff + 8 + i * 4))
          case "stsc" =>
            val n = entries(8, 12)
            tRuns = (0 until n).map { i =>
              (rdBe32(payload, bodyOff + 8 + i * 12),
               rdBe32(payload, bodyOff + 12 + i * 12))
            }
          case "trak" =>
            trakHandler = null; tSizes = null; tChunkOffs = null; tRuns = null
            walk(bodyOff, bodyEnd)
            if (trakHandler == "vide" && sizes == null) {
              sizes = tSizes; chunkOffs = tChunkOffs; stscRuns = tRuns
            }
          case c if Containers(c) => walk(bodyOff, bodyEnd)
          case _ => ()
        }
        off = bodyEnd
      }
    }
    walk(0, payload.length)
    require(sizes != null && chunkOffs != null && stscRuns != null &&
      chunkOffs.nonEmpty && stscRuns.nonEmpty,
      "no video trak with populated sample tables (stsz/stco/stsc)")
    // expand stsc runs: run r applies from its firstChunk until the next
    // run's firstChunk (exclusive) or the last chunk
    val ranges = IndexedSeq.newBuilder[(Long, Long)]
    var sample = 0
    var run = 0
    var chunk = 1L
    while (sample < sizes.length) {
      require(chunk <= chunkOffs.length,
        s"inconsistent mp4 sample tables: sample $sample has no chunk")
      while (run + 1 < stscRuns.length && chunk >= stscRuns(run + 1)._1) run += 1
      val perChunk = stscRuns(run)._2
      require(perChunk > 0, "malformed mp4 stsc: zero samples per chunk")
      var within = 0L
      var pos = chunkOffs(chunk.toInt - 1)
      while (within < perChunk && sample < sizes.length) {
        val sz = sizes(sample)
        require(pos + sz <= payload.length,
          s"mp4 sample $sample range [$pos, ${pos + sz}) past EOF ${payload.length}")
        ranges += ((pos, sz))
        pos += sz
        within += 1
        sample += 1
      }
      chunk += 1
    }
    ranges.result()
  }
}
