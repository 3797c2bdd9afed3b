package graft.formats

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayInputStream

/** The from-scratch PNG codec vs the JDK's ImageIO plugin, BOTH
  * directions and PIXEL-EXACT (PNG is lossless — no tolerance bands):
  * ImageIO-written RGB / gray / palette streams decode byte-identically
  * in graft, graft-encoded streams decode byte-identically in ImageIO,
  * all five filters defilter correctly, CRC corruption refuses.
  */
class PngSpec extends AnyFunSuite {

  private def refPixel(b: java.awt.image.BufferedImage, x: Int, y: Int): (Int, Int, Int) =
    if (b.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
      val g = b.getRaster.getSample(x, y, 0); (g, g, g)
    } else {
      val p = b.getRGB(x, y)
      ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    }

  private def assertExact(a: Media.Image, b: java.awt.image.BufferedImage): Unit = {
    assert(a.width == b.getWidth && a.height == b.getHeight)
    for (y <- 0 until a.height; x <- 0 until a.width) {
      val (r, g, bl) = refPixel(b, x, y)
      assert(a.red(x, y) == r && a.green(x, y) == g && a.blue(x, y) == bl,
        s"pixel ($x,$y): graft (${a.red(x, y)},${a.green(x, y)},${a.blue(x, y)}) vs referee ($r,$g,$bl)")
    }
  }

  test("graft-encoded RGB decodes pixel-exact in BOTH decoders (filters None/Sub/Up)") {
    val w = 37; val h = 23
    val rnd = new scala.util.Random(42)
    val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
    val png = Png.encode(w, h, rgb)
    val ours = Png.decode(png)
    assert(ours.pixels.sameElements(rgb), "our round trip must be lossless")
    val ref = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
    assert(ref != null, "ImageIO must accept the graft-encoded stream")
    assertExact(ours, ref)
  }

  test("ImageIO-written RGB decodes pixel-exact in graft") {
    val w = 40; val h = 31
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(7)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rnd.nextInt(0xffffff))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    assertExact(Png.decode(bos.toByteArray), img)
  }

  test("ImageIO-written grayscale and palette images decode pixel-exact") {
    val w = 25; val h = 17
    val gray = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0, (x * 9 + y * 13) % 256)
    val gb = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gray, "png", gb))
    assertExact(Png.decode(gb.toByteArray), gray)
    // indexed (palette) image → PLTE path
    val pal = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      pal.setRGB(x, y, ((x * 40) % 256 << 16) | ((y * 30) % 256 << 8))
    val pb = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(pal, "png", pb))
    val dec = Png.decode(pb.toByteArray)
    for (y <- 0 until h; x <- 0 until w) {
      val p = pal.getRGB(x, y)
      assert(dec.red(x, y) == ((p >> 16) & 0xff) &&
        dec.green(x, y) == ((p >> 8) & 0xff) && dec.blue(x, y) == (p & 0xff),
        s"palette pixel ($x,$y)")
    }
  }

  test("all five filters defilter: hand-built Average/Paeth rows") {
    // build a raw scanline buffer using filters 3 and 4 explicitly, wrap
    // in valid chunks, decode, compare against a straight re-filter
    val w = 8; val h = 4
    val rnd = new scala.util.Random(3)
    val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
    val stride = w * 3
    def px(y: Int, x: Int): Int = rgb(y * stride + x) & 0xff
    val raw = new Array[Byte]((stride + 1) * h)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (y <- 0 until h) {
      val f = Seq(0, 3, 4, 3)(y)
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val a = if (x >= 3) px(y, x - 3) else 0
        val b = if (y > 0) px(y - 1, x) else 0
        val c = if (y > 0 && x >= 3) px(y - 1, x - 3) else 0
        val v = f match {
          case 0 => px(y, x)
          case 3 => px(y, x) - (a + b) / 2
          case 4 => px(y, x) - paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + x) = (v & 0xff).toByte
      }
    }
    // reuse the encoder's chunk framing by splicing our IDAT into its output
    val template = Png.encode(w, h, rgb)
    val crc = new java.util.zip.CRC32()
    val deflated = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      bos.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(template, 0, 8 + 25) // signature + IHDR chunk (12 + 13)
    def w32(v: Int): Unit = {
      out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    w32(deflated.length); out.write("IDAT".getBytes, 0, 4)
    out.write(deflated, 0, deflated.length)
    crc.update("IDAT".getBytes); crc.update(deflated)
    w32(crc.getValue.toInt)
    w32(0); out.write("IEND".getBytes, 0, 4)
    val iendCrc = new java.util.zip.CRC32(); iendCrc.update("IEND".getBytes)
    w32(iendCrc.getValue.toInt)
    val dec = Png.decode(out.toByteArray)
    assert(dec.pixels.sameElements(rgb), "Average/Paeth rows must defilter exactly")
    // and the referee agrees the hand-built stream is valid
    val ref = javax.imageio.ImageIO.read(new ByteArrayInputStream(out.toByteArray))
    assert(ref != null)
    assertExact(dec, ref)
  }

  test("refusals: CRC corruption, truncation") {
    val ok = Png.encode(9, 7, Array.fill[Byte](9 * 7 * 3)(55))
    intercept[IllegalArgumentException](Png.decode(Array[Byte](1, 2, 3)))
    // flip a byte inside IDAT: the chunk CRC must catch it
    val bad = ok.clone()
    bad(8 + 25 + 8 + 2) = (bad(8 + 25 + 8 + 2) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](Png.decode(bad))
    assert(e.getMessage.contains("CRC"))
    intercept[IllegalArgumentException](
      Png.decode(java.util.Arrays.copyOfRange(ok, 0, ok.length - 6)))
  }

  test("ImageIO-written ADAM7 interlaced streams decode pixel-exact") {
    // ImageIO's PNG writer emits Adam7 under progressive mode — the
    // referee for the seven-pass scatter; odd dimensions exercise the
    // empty/narrow trailing passes
    for ((w, h) <- Seq((37, 23), (8, 8), (1, 9), (9, 1), (3, 3))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rnd = new scala.util.Random(w * 100 + h)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rnd.nextInt(0xffffff))
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val p = wr.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); wr.dispose()
      val png = bos.toByteArray
      assert((png(8 + 8 + 12) & 0xff) == 1, s"${w}x$h referee stream must be interlaced")
      assertExact(Png.decode(png), img)
    }
  }

  test("ImageIO-written 16-BIT grayscale reduces to the exact high bytes") {
    val w = 21; val h = 14
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val rnd = new scala.util.Random(11)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, rnd.nextInt(65536))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    assert((png(8 + 8 + 8) & 0xff) == 16, "referee stream must be 16-bit")
    val dec = Png.decode(png)
    for (y <- 0 until h; x <- 0 until w) {
      val hi = img.getRaster.getSample(x, y, 0) >> 8
      assert(dec.red(x, y) == hi, s"high byte at ($x,$y)")
    }
  }

  test("fuzz: 12 random sizes round-trip losslessly through both decoders") {
    val rnd = new scala.util.Random(20260814)
    for (_ <- 0 until 12) {
      val w = 1 + rnd.nextInt(50); val h = 1 + rnd.nextInt(50)
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val png = Png.encode(w, h, rgb)
      assert(Png.decode(png).pixels.sameElements(rgb), s"${w}x$h")
      val ref = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
      assert(ref != null, s"ImageIO rejected ${w}x$h")
      for (y <- 0 until h; x <- 0 until w) {
        val p = ref.getRGB(x, y)
        val i = (y * w + x) * 3
        assert((rgb(i) & 0xff) == ((p >> 16) & 0xff) &&
          (rgb(i + 1) & 0xff) == ((p >> 8) & 0xff) &&
          (rgb(i + 2) & 0xff) == (p & 0xff), s"${w}x$h ($x,$y)")
      }
    }
  }
}
