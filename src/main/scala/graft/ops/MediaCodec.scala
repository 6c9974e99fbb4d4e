package graft.ops

/** Audio/video container metadata codecs — the OTHER half of a
  * multimodal pipeline's metadata pass beside [[ImageCodec]]: WAV
  * (RIFF chunk walk, the public RIFF/WAVE layout) and MP4 (ISO-BMFF
  * box walk over ftyp/moov/mvhd/tkhd/mdat, the public ISO 14496-12
  * layout). Same design rule as the image codec: a 100 TB pipeline's
  * FIRST media pass is header-only (dimensions, duration, rate — a few
  * hundred bytes per asset, no frame decode), so the parsers read
  * exactly the header structures and never materialize media frames;
  * the builders synthesize spec-valid containers ARITHMETICALLY so the
  * DuckDB oracle can derive every parsed field (and the payload-sum
  * decode witness) from doc_id alone — a parser that misreads any
  * offset hash-mismatches.
  *
  * Byte layouts implemented from the public specs only: RIFF/WAVE
  * canonical 44-byte PCM header; ISO-BMFF box = [size u32be][type
  * 4cc][payload], mvhd v0 timescale/duration at body offsets 12/16,
  * tkhd v0 width/height as 16.16 fixed-point at body offsets 76/80.
  */
object MediaCodec {

  // -- WAV ---------------------------------------------------------------

  /** A complete PCM WAV: `ch` channels, `rate` Hz, 16-bit, `nFrames`
    * frames, every sample = `amp`. Canonical 44-byte header + LE data. */
  def buildWav(rate: Int, ch: Int, nFrames: Int, amp: Int): Array[Byte] = {
    require(rate > 0 && ch > 0 && nFrames >= 0 &&
      amp >= Short.MinValue && amp <= Short.MaxValue,
      s"bad wav spec rate=$rate ch=$ch n=$nFrames amp=$amp")
    val dataSize = 2 * ch * nFrames
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * 2) // byte rate
      .putShort((ch * 2).toShort) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < ch * nFrames) { bb.putShort(amp.toShort); i += 1 }
    bb.array()
  }

  /** Parsed WAV metadata + decode witness: (rate, channels, nFrames,
    * durMs, sampleSum). Walks RIFF chunks — unknown chunks skip by
    * their declared size, so nonstandard writers (LIST/INFO chunks
    * before data) still parse. None on anything malformed. */
  def parseWav(b: Array[Byte]): Option[(Int, Int, Long, Long, Long)] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var off = 12
    var rate = -1; var ch = -1; var bits = -1
    var nFrames = -1L; var sum = 0L
    while (off + 8 <= b.length) {
      val size = i32le(b, off + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      if (tag(b, off, "fmt ") && size >= 16) {
        ch = u16le(b, off + 10)
        rate = i32le(b, off + 12)
        bits = u16le(b, off + 22)
      } else if (tag(b, off, "data")) {
        if (ch <= 0 || rate <= 0 || bits != 16) return None // fmt must precede
        nFrames = size.toLong / (2L * ch)
        var i = off + 8
        while (i + 1 < off + 8 + size) { sum += s16le(b, i); i += 2 }
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (rate <= 0 || ch <= 0 || nFrames < 0) None
    else Some((rate, ch, nFrames, nFrames * 1000L / rate, sum))
  }

  // -- MP4 (ISO-BMFF) ----------------------------------------------------

  /** A minimal valid MP4: ftyp + moov(mvhd + trak(tkhd)) + mdat.
    * timescale 1000 so mvhd duration IS milliseconds; tkhd carries
    * width/height as 16.16 fixed point; mdat holds `mdatLen` bytes
    * b(i) = i % 251 (the decode-witness payload). */
  def buildMp4(w: Int, h: Int, durMs: Int, mdatLen: Int = 251): Array[Byte] = {
    require(w > 0 && h > 0 && durMs >= 0 && mdatLen >= 0,
      s"bad mp4 spec ${w}x$h dur=$durMs")
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(16)
      .put("isom".getBytes("US-ASCII")).putInt(0x200)
      .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
      .array())
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // ctime, mtime
        .putInt(1000) // timescale: 1 unit = 1 ms
        .putInt(durMs)
        .putInt(0x00010000) // rate 1.0
        .putShort(0x0100.toShort) // volume 1.0
      bb.position(bb.position() + 10) // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt) // identity matrix
      bb.position(bb.position() + 24) // pre_defined
      bb.putInt(2) // next track id
      box("mvhd", bb.array())
    }
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(0x000007) // version 0, flags: enabled|in-movie|in-preview
        .putInt(0).putInt(0) // ctime, mtime
        .putInt(1) // track id
        .putInt(0) // reserved
        .putInt(durMs)
      bb.position(bb.position() + 8) // reserved
      bb.putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt) // identity matrix
      bb.putInt(w << 16).putInt(h << 16) // 16.16 fixed
      box("tkhd", bb.array())
    }
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    val mdat = box("mdat", Array.tabulate(mdatLen)(i => (i % 251).toByte))
    ftyp ++ moov ++ mdat
  }

  /** Parsed MP4 metadata + decode witness: (durMs, width, height,
    * mdatSum). Top-level box walk; moov's children walked one level
    * down (mvhd / trak→tkhd). None on malformed sizes or missing
    * boxes. */
  def parseMp4(b: Array[Byte]): Option[(Long, Int, Int, Long)] = {
    if (b.length < 8 || !tag(b, 4, "ftyp")) return None
    var durMs = -1L; var w = -1; var h = -1
    var mdatSum = 0L; var sawMdat = false
    def walk(from: Int, to: Int, depth: Int): Boolean = {
      var off = from
      while (off + 8 <= to) {
        val size = i32be(b, off)
        if (size < 8 || off + size > to) return false
        val typ = new String(b, off + 4, 4, "US-ASCII")
        typ match {
          case "moov" | "trak" if depth < 3 =>
            if (!walk(off + 8, off + size, depth + 1)) return false
          case "mvhd" if size >= 8 + 24 =>
            val timescale = i32be(b, off + 8 + 12).toLong
            if (timescale <= 0) return false
            durMs = i32be(b, off + 8 + 16).toLong * 1000L / timescale
          case "tkhd" if size >= 8 + 84 =>
            w = i32be(b, off + 8 + 76) >>> 16
            h = i32be(b, off + 8 + 80) >>> 16
          case "mdat" =>
            sawMdat = true
            var i = off + 8
            while (i < off + size) { mdatSum += (b(i) & 0xff); i += 1 }
          case _ => () // unknown boxes skip by size — forward compatible
        }
        off += size
      }
      off == to
    }
    if (!walk(0, b.length, 0)) None
    else if (durMs < 0 || w < 0 || h < 0 || !sawMdat) None
    else Some((durMs, w, h, mdatSum))
  }

  // -- byte helpers ------------------------------------------------------

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && new String(b, i, 4, "US-ASCII") == t
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def s16le(b: Array[Byte], i: Int): Int = u16le(b, i).toShort.toInt
  private def i32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def i32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
}
