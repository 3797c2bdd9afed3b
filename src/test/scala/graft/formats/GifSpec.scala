package graft.formats

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayInputStream

/** The from-scratch GIF decoder vs the JDK's ImageIO GIF plugin: ImageIO
  * writes palettized streams (LZW, sub-blocks, color tables) that graft
  * must decode PIXEL-EXACT — GIF is lossless over its palette, so there
  * are no tolerance bands; refusals on hostile structure.
  */
class GifSpec extends AnyFunSuite {

  private def writeGif(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos), "ImageIO must write GIF")
    bos.toByteArray
  }

  private def assertExact(a: Media.Image, b: java.awt.image.BufferedImage): Unit = {
    assert(a.width == b.getWidth && a.height == b.getHeight)
    for (y <- 0 until a.height; x <- 0 until a.width) {
      val p = b.getRGB(x, y)
      assert(a.red(x, y) == ((p >> 16) & 0xff) &&
        a.green(x, y) == ((p >> 8) & 0xff) && a.blue(x, y) == (p & 0xff),
        s"pixel ($x,$y)")
    }
  }

  test("ImageIO-written indexed images decode pixel-exact (LZW + GCT)") {
    val w = 41; val h = 27
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 23) % 256 << 16) | ((y * 31) % 256 << 8) | ((x + y) % 256))
    val gif = writeGif(img)
    assert(new String(gif, 0, 6, "US-ASCII").startsWith("GIF"))
    val dec = Gif.decode(gif)
    // compare against ImageIO's own read of the same bytes (palette
    // quantization already happened at write time — both decoders see
    // the same palette + indices)
    val ref = javax.imageio.ImageIO.read(new ByteArrayInputStream(gif))
    assertExact(dec, ref)
  }

  test("dictionary-growth stress: many distinct runs force wide LZW codes") {
    // 64x64 with a high-entropy indexed pattern: the LZW dictionary
    // grows through several code widths (and typically past a clear)
    val w = 64; val h = 64
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    val rnd = new scala.util.Random(99)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (rnd.nextInt(256) << 16) | (rnd.nextInt(256) << 8) | rnd.nextInt(256))
    val gif = writeGif(img)
    val ref = javax.imageio.ImageIO.read(new ByteArrayInputStream(gif))
    assertExact(Gif.decode(gif), ref)
  }

  test("small and degenerate geometries decode exactly") {
    for ((w, h) <- Seq((1, 1), (1, 13), (13, 1), (3, 5))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 90) % 256 << 16) | ((y * 60) % 256 << 8))
      val gif = writeGif(img)
      val ref = javax.imageio.ImageIO.read(new ByteArrayInputStream(gif))
      assertExact(Gif.decode(gif), ref)
    }
  }

  test("graft-encoded grayscale GIFs: identity round trip AND ImageIO reads them back") {
    // large enough that the root-only LZW stream crosses a width bump
    // (dict passes 512) and, at 70x70, the 4094-entry clear-reset
    val rnd = new scala.util.Random(5)
    for ((w, h) <- Seq((10, 7), (70, 70), (1, 1))) {
      val idx = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
      val gif = Gif.encodeGray(w, h, idx)
      val dec = Gif.decode(gif)
      assert(dec.width == w && dec.height == h)
      assert((0 until w * h).forall { p =>
        val g = idx(p) & 0xff
        (dec.pixels(p * 3) & 0xff) == g && (dec.pixels(p * 3 + 1) & 0xff) == g &&
          (dec.pixels(p * 3 + 2) & 0xff) == g
      }, s"${w}x$h round trip")
      val ref = javax.imageio.ImageIO.read(new ByteArrayInputStream(gif))
      assert(ref != null, s"ImageIO rejected the graft GIF at ${w}x$h")
      assertExact(dec, ref)
    }
  }

  test("refusals: magic, truncation, unknown blocks, hostile dimensions") {
    intercept[IllegalArgumentException](Gif.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](Gif.decode("GIF99a0123456".getBytes))
    val img = new java.awt.image.BufferedImage(9, 9,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    val ok = writeGif(img)
    intercept[IllegalArgumentException](
      Gif.decode(java.util.Arrays.copyOfRange(ok, 0, ok.length / 2)))
    // unknown top-level block byte refuses rather than desyncing
    val junk = ok.clone()
    // find the image descriptor and corrupt its introducer
    var at = -1
    var i = 13
    // skip GCT if present
    if ((junk(10) & 0x80) != 0) i += 3 * (2 << (junk(10) & 7))
    while (at < 0 && i < junk.length) {
      if ((junk(i) & 0xff) == 0x2c) at = i
      else if ((junk(i) & 0xff) == 0x21) { i += 2; while ((junk(i) & 0xff) != 0) i += 1 + (junk(i) & 0xff); i += 1 }
      else i += 1
    }
    assert(at > 0)
    junk(at) = 0x7e.toByte
    val e = intercept[IllegalArgumentException](Gif.decode(junk))
    assert(e.getMessage.contains("unknown block"))
  }
}
