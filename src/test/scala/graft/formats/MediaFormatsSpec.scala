package graft.formats

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayInputStream

/** The from-scratch BMP/WAV codecs vs two independent referees: the JDK's
  * own readers/writers (ImageIO, javax.sound.sampled — both pure JDK, no
  * external libs) and hand-computed byte-level fixtures pinned against
  * the public format specifications.
  */
class MediaFormatsSpec extends AnyFunSuite {

  // ------------------------------------------------------------- BMP

  test("BMP hand-computed fixture: header fields, BGR order, row padding, bottom-up") {
    // 2x2 image, 24bpp: stride = (2*3+3)/4*4 = 8 (2 pad bytes per row).
    // Pixels top-down: (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    val rgb = Array[Byte](
      255.toByte, 0, 0,  0, 255.toByte, 0,
      0, 0, 255.toByte,  255.toByte, 255.toByte, 255.toByte)
    val bmp = Media.Bmp.encode(2, 2, rgb)
    assert(bmp.length == 54 + 16)
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    def i32(off: Int) = (bmp(off) & 0xff) | ((bmp(off + 1) & 0xff) << 8) |
      ((bmp(off + 2) & 0xff) << 16) | ((bmp(off + 3) & 0xff) << 24)
    assert(i32(2) == bmp.length && i32(10) == 54 && i32(14) == 40)
    assert(i32(18) == 2 && i32(22) == 2)
    assert((bmp(28) & 0xff) == 24 && i32(30) == 0)
    // bottom-up: file row 0 = image row 1; BGR storage
    assert((bmp(54) & 0xff) == 255 && (bmp(55) & 0xff) == 0 && (bmp(56) & 0xff) == 0)   // blue px BGR
    assert((bmp(57) & 0xff) == 255 && (bmp(58) & 0xff) == 255 && (bmp(59) & 0xff) == 255)
    assert((bmp(62) & 0xff) == 0 && (bmp(63) & 0xff) == 0 && (bmp(64) & 0xff) == 255)   // red px BGR
    val back = Media.Bmp.decode(bmp)
    assert(back.width == 2 && back.height == 2)
    assert(back.pixels.sameElements(rgb))
    assert(back.red(0, 0) == 255 && back.blue(0, 1) == 255)
  }

  test("BMP decode: JDK ImageIO-written files (the independent referee)") {
    // ImageIO writes its own 24bpp BMP; graft must read it pixel-exact
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 7)
      img.setRGB(x, y, (x * 36 << 16) | (y * 50 << 8) | (x + y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val dec = Media.Bmp.decode(bos.toByteArray)
    assert(dec.width == 7 && dec.height == 5)
    for (y <- 0 until 5; x <- 0 until 7) {
      assert(dec.red(x, y) == x * 36, s"red($x,$y)")
      assert(dec.green(x, y) == y * 50, s"green($x,$y)")
      assert(dec.blue(x, y) == x + y, s"blue($x,$y)")
    }
  }

  test("BMP encode: JDK ImageIO reads graft's files back pixel-exact") {
    val w = 9; val h = 4 // stride 28 with 1 pad byte — padding exercised
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 7) % 256).toByte)
    val img = javax.imageio.ImageIO.read(
      new ByteArrayInputStream(Media.Bmp.encode(w, h, rgb)))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(((p >> 16) & 0xff) == (rgb(base) & 0xff), s"R($x,$y)")
      assert(((p >> 8) & 0xff) == (rgb(base + 1) & 0xff), s"G($x,$y)")
      assert((p & 0xff) == (rgb(base + 2) & 0xff), s"B($x,$y)")
    }
  }

  test("BMP decode: top-down (negative height) and 32bpp variants") {
    // hand-build a 2x2 top-down 32bpp BMP (stride 8, no padding)
    val out = new Array[Byte](54 + 16)
    out(0) = 'B'; out(1) = 'M'
    def putI32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    putI32(2, out.length); putI32(10, 54); putI32(14, 40)
    putI32(18, 2); putI32(22, -2) // negative → top-down
    out(26) = 1; out(28) = 32
    putI32(30, 0); putI32(34, 16)
    // first stored row IS image row 0 (top-down); BGRA per pixel
    val px = Seq((10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120))
    px.zipWithIndex.foreach { case ((r, g, b), i) =>
      out(54 + i * 4) = b.toByte; out(54 + i * 4 + 1) = g.toByte
      out(54 + i * 4 + 2) = r.toByte; out(54 + i * 4 + 3) = 0xff.toByte
    }
    val dec = Media.Bmp.decode(out)
    assert(dec.width == 2 && dec.height == 2)
    assert(dec.red(0, 0) == 10 && dec.green(1, 0) == 50 && dec.blue(0, 1) == 90)
    assert(dec.red(1, 1) == 100)
  }

  test("BMP refusals: compression, palette depth, truncation, bad magic") {
    val good = Media.Bmp.encode(2, 2, new Array[Byte](12))
    def mutated(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    assert(intercept[IllegalArgumentException](
      Media.Bmp.decode(mutated(30, 1))).getMessage.contains("compression"))
    assert(intercept[IllegalArgumentException](
      Media.Bmp.decode(mutated(28, 8))).getMessage.contains("bit depth"))
    assert(intercept[IllegalArgumentException](
      Media.Bmp.decode(good.take(53))).getMessage.contains("BM"))
    assert(intercept[IllegalArgumentException](
      Media.Bmp.decode(good.take(60))).getMessage.contains("truncated"))
    assert(intercept[IllegalArgumentException](
      Media.Bmp.decode(mutated(0, 'X'))).getMessage.contains("magic"))
  }

  // ------------------------------------------------------------- WAV

  test("WAV hand-computed fixture: RIFF layout, LE samples, sign") {
    val samples = Array(0, 1, -1, 32767, -32768, 256)
    val wav = Media.Wav.encode(8000, samples)
    assert(wav.length == 44 + 12)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") == "WAVE")
    assert(new String(wav, 12, 4, "US-ASCII") == "fmt ")
    assert(new String(wav, 36, 4, "US-ASCII") == "data")
    // -1 → 0xFF 0xFF little-endian at sample index 2
    assert((wav(44 + 4) & 0xff) == 0xff && (wav(44 + 5) & 0xff) == 0xff)
    // 256 → 0x00 0x01
    assert((wav(44 + 10) & 0xff) == 0x00 && (wav(44 + 11) & 0xff) == 0x01)
    val back = Media.Wav.decode(wav)
    assert(back.sampleRate == 8000 && back.channels == 1 && back.bitsPerSample == 16)
    assert(back.samples.sameElements(samples))
  }

  test("WAV decode: javax.sound-written files (the independent referee)") {
    import javax.sound.sampled._
    val fmt = new AudioFormat(16000f, 16, 1, true, false) // PCM signed LE
    val samples = Array.tabulate(100)(i => (i * 331 - 16000))
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(i * 2) = s.toByte; pcm(i * 2 + 1) = (s >> 8).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val dec = Media.Wav.decode(bos.toByteArray)
    assert(dec.sampleRate == 16000 && dec.bitsPerSample == 16)
    assert(dec.samples.sameElements(samples))
  }

  test("WAV encode: javax.sound reads graft's files back sample-exact") {
    import javax.sound.sampled._
    val samples = Array.tabulate(64)(i => i * 515 - 16000)
    val ais = AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(Media.Wav.encode(22050, samples)))
    val f = ais.getFormat
    assert(f.getSampleRate == 22050f && f.getChannels == 1 &&
      f.getSampleSizeInBits == 16 && !f.isBigEndian)
    val bytes = ais.readAllBytes()
    assert(bytes.length == samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      val got = ((bytes(i * 2) & 0xff) | ((bytes(i * 2 + 1) & 0xff) << 8)).toShort.toInt
      assert(got == s, s"sample $i")
    }
  }

  test("WAV chunk walk: unknown LIST chunk skipped, odd-size word alignment") {
    // RIFF allows arbitrary chunks between fmt and data; odd-sized
    // chunks pad to even — hand-build one with a 3-byte LIST chunk
    val base = Media.Wav.encode(8000, Array(7, -7))
    val fmtChunk = base.slice(12, 36)
    val dataChunk = base.slice(36, base.length)
    val listChunk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0) // 3 + 1 pad
    val body = fmtChunk ++ listChunk ++ dataChunk
    val out = new Array[Byte](12 + body.length)
    Array[Byte]('R', 'I', 'F', 'F').copyToArray(out, 0)
    val riffSize = 4 + body.length
    out(4) = riffSize.toByte; out(5) = (riffSize >> 8).toByte
    out(6) = (riffSize >> 16).toByte; out(7) = (riffSize >> 24).toByte
    Array[Byte]('W', 'A', 'V', 'E').copyToArray(out, 8)
    body.copyToArray(out, 12)
    val dec = Media.Wav.decode(out)
    assert(dec.samples.sameElements(Array(7, -7)))
  }

  test("hostile sizes refuse loudly, never wrap (review finding)") {
    // WAV data chunk declaring ~Int.MaxValue bytes: the bound check must
    // refuse instead of wrapping negative and allocating gigabytes
    val wav = Media.Wav.encode(8000, Array(1, 2, 3)).clone()
    wav(40) = 0xFF.toByte; wav(41) = 0xFF.toByte
    wav(42) = 0xFF.toByte; wav(43) = 0x7F.toByte
    assert(intercept[IllegalArgumentException](
      Media.Wav.decode(wav)).getMessage.contains("truncated"))
    // BMP declaring width large enough to wrap the stride arithmetic
    val bmp = Media.Bmp.encode(2, 2, new Array[Byte](12)).clone()
    def putI32(off: Int, v: Int): Unit = {
      bmp(off) = v.toByte; bmp(off + 1) = (v >> 8).toByte
      bmp(off + 2) = (v >> 16).toByte; bmp(off + 3) = (v >> 24).toByte
    }
    putI32(18, 715827883) // width * 3 wraps Int
    val e = intercept[IllegalArgumentException](Media.Bmp.decode(bmp))
    assert(e.getMessage.contains("truncated") || e.getMessage.contains("budget"))
    // BOTH axes near Int.MaxValue: products wrap even Long unless the
    // pixel budget is checked first (review finding)
    val bmp2 = Media.Bmp.encode(2, 2, new Array[Byte](12)).clone()
    def putI32b(off: Int, v: Int): Unit = {
      bmp2(off) = v.toByte; bmp2(off + 1) = (v >> 8).toByte
      bmp2(off + 2) = (v >> 16).toByte; bmp2(off + 3) = (v >> 24).toByte
    }
    putI32b(18, Int.MaxValue); putI32b(22, Int.MaxValue)
    val e2 = intercept[IllegalArgumentException](Media.Bmp.decode(bmp2))
    assert(e2.getMessage.contains("budget"))
  }

  test("WAV refusals: non-PCM, bad magic, truncated chunk, missing data") {
    val good = Media.Wav.encode(8000, Array(1, 2, 3))
    def mutated(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    assert(intercept[IllegalArgumentException](
      Media.Wav.decode(mutated(20, 3))).getMessage.contains("format tag"))
    assert(intercept[IllegalArgumentException](
      Media.Wav.decode(mutated(0, 'X'))).getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException](
      Media.Wav.decode(good.take(48))).getMessage.contains("truncated"))
    assert(intercept[IllegalArgumentException](
      Media.Wav.decode(good.take(36))).getMessage.contains("data"))
  }
}

/** G.711 μ-law/A-law companded WAV vs the JDK's own ULAW/ALAW codecs:
  * full 256-codeword expand-table equality both laws, compand round
  * trips, and the container path (tags 7/6).
  */
class CompandedWavSpec extends AnyFunSuite {
  import javax.sound.sampled._

  /** JDK expansion of all 256 codewords of `enc` to 16-bit PCM. */
  private def jdkExpand(enc: AudioFormat.Encoding): Array[Int] = {
    val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
    val bytes = Array.tabulate[Byte](256)(i => i.toByte)
    val in = new AudioInputStream(new ByteArrayInputStream(bytes), src, 256)
    val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val conv = AudioSystem.getAudioInputStream(dst, in)
    val out = conv.readAllBytes()
    assert(out.length == 512)
    Array.tabulate(256)(i =>
      (((out(2 * i) & 0xff) | ((out(2 * i + 1) & 0xff) << 8)).toShort).toInt)
  }

  test("mu-law expand table equals the JDK codec for all 256 codewords") {
    val jdk = jdkExpand(AudioFormat.Encoding.ULAW)
    for (b <- 0 until 256)
      assert(Media.Wav.mulawDecode(b.toByte) == jdk(b),
        f"codeword 0x$b%02X: graft ${Media.Wav.mulawDecode(b.toByte)} vs JDK ${jdk(b)}")
  }

  test("a-law expand table equals the JDK codec for all 256 codewords") {
    val jdk = jdkExpand(AudioFormat.Encoding.ALAW)
    for (b <- 0 until 256)
      assert(Media.Wav.alawDecode(b.toByte) == jdk(b),
        f"codeword 0x$b%02X: graft ${Media.Wav.alawDecode(b.toByte)} vs JDK ${jdk(b)}")
  }

  test("compand round trips: decode∘encode is identity on representable values") {
    // every expanded codeword value must encode back to itself (mu-law;
    // skip the negative-zero codeword whose value collides with +0)
    for (b <- 0 until 256) {
      val v = Media.Wav.mulawDecode(b.toByte)
      assert(Media.Wav.mulawDecode(Media.Wav.mulawEncode(v)) == v, s"mu-law value $v")
      val va = Media.Wav.alawDecode(b.toByte)
      assert(Media.Wav.alawDecode(Media.Wav.alawEncode(va)) == va, s"a-law value $va")
    }
    // non-representable values quantize DOWNWARD-consistently: the
    // re-encode of a decoded value is stable (idempotent quantization)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 1000) {
      val s = rnd.nextInt(65536) - 32768
      val q = Media.Wav.mulawDecode(Media.Wav.mulawEncode(s))
      assert(Media.Wav.mulawDecode(Media.Wav.mulawEncode(q)) == q)
      assert(math.abs(q - s) <= 2048, s"mu-law quantization error too large at $s")
    }
  }

  test("companded WAV containers decode through the chunk walk (tags 7/6)") {
    val vals = Array(0, 132, -396, 8316, -32124, 1052)
    val mu = Media.Wav.encodeCompanded(8000, vals, mulaw = true)
    val dm = Media.Wav.decode(mu)
    assert(dm.sampleRate == 8000 && dm.bitsPerSample == 16)
    assert(dm.samples.toSeq == vals.toSeq, "all values chosen mu-law-representable")
    // javax.sound reads the same container (header referee)
    val jdk = AudioSystem.getAudioInputStream(new ByteArrayInputStream(mu))
    assert(jdk.getFormat.getEncoding == AudioFormat.Encoding.ULAW)
    assert(jdk.getFormat.getSampleRate == 8000f)
    val alVals = Array(8, -8, 344, -43688, 2752)
    val al = Media.Wav.encodeCompanded(8000, alVals, mulaw = false)
    val da = Media.Wav.decode(al)
    assert(da.samples.length == alVals.length)
    assert(da.samples.toSeq == alVals.map(v =>
      Media.Wav.alawDecode(Media.Wav.alawEncode(v))).toSeq)
    assert(AudioSystem.getAudioInputStream(new ByteArrayInputStream(al))
      .getFormat.getEncoding == AudioFormat.Encoding.ALAW)
  }
}

/** MJPEG-in-AVI container: round trips, hand-computed RIFF structure,
  * word alignment, refusals. Frames referee through JpegSpec's ImageIO
  * validation; the container itself has no in-env referee (declared —
  * same posture as Puffin) so the byte layout is pinned by hand.
  */
class AviSpec extends AnyFunSuite {
  private def grayFrame(w: Int, h: Int, level: Int): Array[Byte] = {
    val rgb = Array.fill((w * h * 3))(level.toByte)
    Jpeg.encode(w, h, rgb, quality = 50, grayscale = true)
  }

  test("MJPEG AVI round trip: geometry, frame count, exact frame decode") {
    val levels = Seq(60, 128, 202)
    val frames = levels.map(grayFrame(16, 8, _))
    val avi = Media.Avi.encode(16, 8, 40000, frames)
    val v = Media.Avi.decode(avi)
    assert(v.width == 16 && v.height == 8 && v.usPerFrame == 40000)
    assert(v.numFrames == 3)
    for ((lvl, i) <- levels.zipWithIndex) {
      val img = v.frame(i)
      assert(img.width == 16 && img.height == 8)
      // constant even levels at q50 decode exactly (the m04/m06 envelope)
      assert((0 until 16 * 8).forall(p => (img.pixels(p * 3) & 0xff) == lvl),
        s"frame $i level $lvl")
    }
  }

  test("hand-computed RIFF structure: fourccs, sizes, word alignment") {
    val f0 = grayFrame(8, 8, 100)
    val frames = Seq(f0)
    val avi = Media.Avi.encode(8, 8, 33333, frames)
    def cc(off: Int) = new String(avi, off, 4, "US-ASCII")
    def i32(off: Int) = (avi(off) & 0xff) | ((avi(off + 1) & 0xff) << 8) |
      ((avi(off + 2) & 0xff) << 16) | ((avi(off + 3) & 0xff) << 24)
    assert(cc(0) == "RIFF" && cc(8) == "AVI ")
    assert(i32(4) == avi.length - 8, "RIFF size covers everything after the size field")
    assert(cc(12) == "LIST" && cc(20) == "hdrl")
    assert(cc(24) == "avih" && i32(28) == 56)
    assert(i32(32) == 33333)            // dwMicroSecPerFrame
    assert(i32(48) == 1)                // dwStreams... offset: 24+8+
    assert(i32(24 + 8 + 16) == 1)       // dwTotalFrames at avih+16
    assert(i32(24 + 8 + 32) == 8 && i32(24 + 8 + 36) == 8) // width, height
    // strh declares vids/MJPG
    val strhAt = avi.indexOfSlice("strh".getBytes)
    assert(strhAt > 0 && cc(strhAt + 8) == "vids" && cc(strhAt + 12) == "MJPG")
    // movi list holds one word-aligned 00dc chunk
    val moviAt = avi.indexOfSlice("movi".getBytes)
    assert(moviAt > 0 && cc(moviAt + 4) == "00dc")
    assert(i32(moviAt + 8) == f0.length)
    assert((avi.length & 1) == 0, "odd frame payloads pad to word boundaries")
  }

  test("refusals: magic, truncation, foreign compression") {
    intercept[IllegalArgumentException](Media.Avi.decode(Array[Byte](1, 2, 3)))
    // hostile LIST nesting refuses instead of blowing the stack
    val deep = new java.io.ByteArrayOutputStream()
    deep.write("RIFF".getBytes); deep.write(Array[Byte](-1, -1, 0, 0))
    deep.write("AVI ".getBytes)
    for (_ <- 0 until 1000) {
      deep.write("LIST".getBytes)
      deep.write(Array[Byte](-1, 0, 0, 0)) // size 255
      deep.write("hdrl".getBytes)
    }
    val eNest = intercept[IllegalArgumentException] {
      val b = deep.toByteArray
      Media.Avi.decode(b)
    }
    assert(eNest.getMessage.contains("nesting") || eNest.getMessage.contains("truncated"))
    val ok = Media.Avi.encode(8, 8, 40000, Seq(grayFrame(8, 8, 100)))
    intercept[IllegalArgumentException](
      Media.Avi.decode(java.util.Arrays.copyOfRange(ok, 0, ok.length - 10)))
    // a stream declaring H264 in strf.biCompression must refuse
    val h264 = ok.clone()
    val strfAt = {
      var p = -1
      for (i <- 0 until h264.length - 4)
        if (p < 0 && h264(i) == 's' && h264(i + 1) == 't' && h264(i + 2) == 'r' && h264(i + 3) == 'f') p = i
      p
    }
    assert(strfAt > 0)
    System.arraycopy("H264".getBytes, 0, h264, strfAt + 8 + 16, 4)
    val e = intercept[IllegalArgumentException](Media.Avi.decode(h264))
    assert(e.getMessage.contains("MJPEG"))
    // decoding a frame that disagrees with stream geometry refuses
    val mixed = Media.Avi.encode(8, 8, 40000, Seq(grayFrame(16, 8, 100)))
    val vm = Media.Avi.decode(mixed)
    intercept[IllegalArgumentException](vm.frame(0))
  }
}

/** Magic-byte container sniffing (the m09 ingest dispatch). */
class SniffSpec extends AnyFunSuite {
  test("every codec's output sniffs to its own tag; foreign bytes don't") {
    val rgb = Array.fill[Byte](8 * 8 * 3)(77)
    assert(Media.sniff(Media.Bmp.encode(8, 8, rgb)) == "image/bmp")
    assert(Media.sniff(Png.encode(8, 8, rgb)) == "image/png")
    assert(Media.sniff(Gif.encodeGray(8, 8, Array.fill[Byte](64)(5))) == "image/gif")
    assert(Media.sniff(Jpeg.encode(8, 8, rgb, 50, grayscale = true)) == "image/jpeg")
    assert(Media.sniff(Media.Wav.encode(8000, Array(1, 2, 3))) == "audio/wav")
    assert(Media.sniff(Media.Wav.encodeCompanded(8000, Array(0), mulaw = true)) == "audio/wav")
    assert(Media.sniff(Media.Avi.encode(8, 8, 40000,
      Seq(Jpeg.encode(8, 8, rgb, 50, grayscale = true)))) == "video/x-msvideo")
    assert(Media.sniff(Array[Byte]()) == "unknown")
    assert(Media.sniff("RIFF1234ABCD".getBytes) == "unknown")
    assert(Media.sniff(Array[Byte](0x89.toByte, 'P', 'N')) == "unknown")
  }
}
