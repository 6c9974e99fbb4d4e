package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins the real-decode contract of [[ImageCodec]]: the PNG builder
  * emits spec-valid bytes the JDK's real decoder accepts, the header
  * parser agrees with the full decoder on every format the JDK can
  * write, and hand-built header bytes (including shapes ImageIO won't
  * produce, like progressive JPEG) parse to their exact dimensions. */
class ImageCodecSpec extends AnyFunSuite {

  test("buildPng emits valid PNG: ImageIO decodes it, pixels round-trip exactly") {
    for ((w, h, g) <- Seq((1, 1, 0), (16, 1, 255), (7, 13, 128), (16, 16, 250))) {
      val png = ImageCodec.buildPng(w, h, g)
      assert(ImageCodec.parseDims(png) === Some(("png", w, h)))
      val Some((dw, dh, sum)) = ImageCodec.decodePixels(png)
      assert((dw, dh) === (w, h))
      assert(sum === w.toLong * h * g, s"pixel sum for ${w}x$h g=$g")
    }
  }

  test("header parse agrees with the full JDK decoder for every writable format") {
    val img = new java.awt.image.BufferedImage(
      37, 21, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (fmt <- Seq("png", "jpeg", "gif", "bmp")) {
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK can't write $fmt")
      val bytes = out.toByteArray
      val parsed = ImageCodec.parseDims(bytes)
      assert(parsed === Some((fmt, 37, 21)), s"header parse of JDK-written $fmt")
      val Some((dw, dh, _)) = ImageCodec.decodePixels(bytes)
      assert((dw, dh) === (37, 21), s"full decode of $fmt")
    }
  }

  test("checked-in JPEG headers: baseline SOF0 after APP0, and progressive SOF2") {
    // FFD8, APP0 (len 16, "JFIF"), SOF0: len 17, precision 8,
    // height 0x0155 = 341, width 0x0200 = 512
    def jpegHeader(sof: Int): Array[Byte] = (Seq(0xff, 0xd8) ++
      Seq(0xff, 0xe0, 0x00, 0x10, 'J'.toInt, 'F'.toInt, 'I'.toInt, 'F'.toInt,
        0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00) ++
      Seq(0xff, sof, 0x00, 0x11, 0x08, 0x01, 0x55, 0x02, 0x00, 0x03) ++
      Seq.fill(10)(0x00)).map(_.toByte).toArray
    assert(ImageCodec.parseDims(jpegHeader(0xc0)) === Some(("jpeg", 512, 341)))
    assert(ImageCodec.parseDims(jpegHeader(0xc2)) === Some(("jpeg", 512, 341)))
    // DHT (0xc4) must NOT be taken for a frame header: DHT first, then SOF0
    val withDht = (Seq(0xff, 0xd8) ++
      Seq(0xff, 0xc4, 0x00, 0x05, 0x00, 0x01, 0x02) ++
      Seq(0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0x40, 0x00, 0x30, 0x03) ++
      Seq.fill(10)(0x00)).map(_.toByte).toArray
    assert(ImageCodec.parseDims(withDht) === Some(("jpeg", 48, 64)))
  }

  test("checked-in GIF and BMP headers parse exact dimensions") {
    val gif = ("GIF89a".getBytes("US-ASCII") ++
      Array(0x40, 0x01, 0xf0, 0x00).map(_.toByte) ++ // 320 x 240 LE
      Array.fill(8)(0.toByte))
    assert(ImageCodec.parseDims(gif) === Some(("gif", 320, 240)))
    val bmp = new Array[Byte](30)
    bmp(0) = 'B'; bmp(1) = 'M'
    java.nio.ByteBuffer.wrap(bmp, 18, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(800).putInt(-600)
    // negative height = top-down row order; dimension is the magnitude
    assert(ImageCodec.parseDims(bmp) === Some(("bmp", 800, 600)))
  }

  test("non-image bytes parse as None, never throw") {
    assert(ImageCodec.parseDims(Array.emptyByteArray) === None)
    assert(ImageCodec.parseDims("plain text payload".getBytes("UTF-8")) === None)
    assert(ImageCodec.parseDims(Array.fill(64)(0xff.toByte)) === None)
  }

  // -- MediaCodec (WAV / MP4 metadata pass) ------------------------------

  test("wav: build/parse round-trips rate, channels, frames, duration, sample sum") {
    val b = MediaCodec.buildWav(rate = 16000, ch = 2, nFrames = 320, amp = -7)
    assert(b.length === 44 + 2 * 2 * 320)
    assert(MediaCodec.parseWav(b) ===
      Some((16000, 2, 320L, 20L, 2L * 320L * -7L)))
  }

  test("wav: unknown RIFF chunks (LIST before data) skip by declared size") {
    val base = MediaCodec.buildWav(8000, 1, 10, 5)
    // splice a LIST chunk (odd size — exercises word-alignment padding)
    // between fmt and data
    val list = "LIST".getBytes("US-ASCII") ++
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(3).array() ++
      Array[Byte](1, 2, 3, 0) // 3 data bytes + pad
    val spliced = base.slice(0, 36) ++ list ++ base.slice(36, base.length)
    // RIFF outer size field must cover the splice
    java.nio.ByteBuffer.wrap(spliced, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(spliced.length - 8)
    assert(MediaCodec.parseWav(spliced) === Some((8000, 1, 10L, 1L, 50L)))
  }

  test("wav: malformed bytes parse as None, never throw") {
    assert(MediaCodec.parseWav(Array.emptyByteArray) === None)
    assert(MediaCodec.parseWav("RIFFxxxxNOPE".getBytes("US-ASCII")) === None)
    // truncated data chunk: declared size exceeds the payload
    val b = MediaCodec.buildWav(8000, 1, 10, 1)
    assert(MediaCodec.parseWav(b.slice(0, b.length - 4)) === None)
  }

  test("mp4: build/parse round-trips duration, 16.16 dimensions, mdat sum") {
    val b = MediaCodec.buildMp4(w = 640, h = 480, durMs = 2000)
    assert(b.length === 499)
    assert(MediaCodec.parseMp4(b) === Some((2000L, 640, 480, 31375L)))
  }

  test("mp4: unknown top-level boxes skip by size; malformed sizes reject") {
    val base = MediaCodec.buildMp4(32, 16, 40)
    // a free box between ftyp and moov is forward-compatible
    val free = java.nio.ByteBuffer.allocate(16).putInt(16)
      .put("free".getBytes("US-ASCII")).putInt(0).putInt(0).array()
    val spliced = base.slice(0, 24) ++ free ++ base.slice(24, base.length)
    assert(MediaCodec.parseMp4(spliced) === Some((40L, 32, 16, 31375L)))
    // a box whose declared size overruns the buffer is malformed, not a crash
    val broken = base.clone()
    java.nio.ByteBuffer.wrap(broken, 24, 4).putInt(1 << 30)
    assert(MediaCodec.parseMp4(broken) === None)
    assert(MediaCodec.parseMp4(Array.emptyByteArray) === None)
  }
}
