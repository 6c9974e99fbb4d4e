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
}
