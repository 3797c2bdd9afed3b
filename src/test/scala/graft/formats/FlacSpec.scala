package graft.formats

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec vs independent referees where the JDK has one and
  * hand-computed spec fixtures where it doesn't (no FLAC reader ships in
  * the JDK — the Puffin/AVI posture):
  *  - CRC-8/CRC-16 vs an independent mod-2 polynomial long division
  *  - the coded frame number vs the JDK's OWN UTF-8 encoder (the scheme
  *    IS UTF-8 over its 1–4-byte range)
  *  - a whole stream assembled bit-by-bit in the test (STREAMINFO, frame
  *    header, FIXED subframe, hand-zigzagged Rice residuals) that decode
  *    must read back — the layout pin that doesn't trust encode()
  *  - round trips whose DESCRIBED plans pin that LPC, mid/side, wasted
  *    bits, escape partitions, and multi-partition residuals were
  *    genuinely exercised (not just the trivial paths)
  *  - the STREAMINFO MD5 is verified inside decode on every test here,
  *    so each round trip is also an end-to-end PCM-signature check.
  */
class FlacSpec extends AnyFunSuite {

  // independent CRC referee: append n zero bits, mod-2 long division
  private def polyDiv(data: Array[Byte], poly: BigInt, n: Int): Int = {
    var reg = BigInt(0)
    val top = BigInt(1) << n
    for (b <- data; bit <- 7 to 0 by -1) {
      reg = (reg << 1) | ((b >> bit) & 1)
      if ((reg & top) != 0) reg ^= (top | poly)
    }
    for (_ <- 0 until n) {
      reg = reg << 1
      if ((reg & top) != 0) reg ^= (top | poly)
    }
    reg.toInt
  }

  test("CRC-8 (0x07) and CRC-16 (0x8005): check vectors + independent division") {
    val nine = "123456789".getBytes("US-ASCII")
    assert(Flac.crc8(nine, 0, 9) == 0xf4)    // published CRC-8 check value
    assert(Flac.crc16(nine, 0, 9) == 0xfee8) // published CRC-16/UMTS check value
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20) {
      val d = Array.fill[Byte](1 + rnd.nextInt(40))(rnd.nextInt().toByte)
      assert(Flac.crc8(d, 0, d.length) == polyDiv(d, BigInt(0x07), 8))
      assert(Flac.crc16(d, 0, d.length) == polyDiv(d, BigInt(0x8005), 16))
    }
  }

  test("coded frame number == the JDK's UTF-8 bytes over the 1-4 byte range") {
    for (cp <- Seq(0, 1, 0x7f, 0x80, 0x7ff, 0x800, 0xffff, 0x10000, 0x10ffff)) {
      val w = new Flac.BitWriter
      Flac.writeCoded(w, cp.toLong)
      val jdk = new String(Character.toChars(cp)).getBytes("UTF-8")
      assert(w.toBytes.toSeq == jdk.toSeq, s"cp 0x${cp.toHexString}")
    }
    // beyond Unicode (5-7 byte extension): round trip + boundary widths
    for (v <- Seq(0x200000L, (1L << 26) - 1, 1L << 26, (1L << 31) - 1,
        1L << 31, (1L << 36) - 1)) {
      val w = new Flac.BitWriter
      Flac.writeCoded(w, v)
      val bytes = w.toBytes
      val r = new Flac.BitReader(bytes)
      assert(Flac.readCoded(r) == v, s"v=$v")
      val expectLen = if (v < (1L << 26)) 5 else if (v < (1L << 31)) 6 else 7
      assert(bytes.length == expectLen, s"v=$v got ${bytes.length} bytes")
    }
  }

  test("hand-assembled stream: STREAMINFO + FIXED-1 subframe + Rice residuals decode exactly") {
    // mono 8-bit, 4 samples [3, 4, 3, 5]; FIXED order 1 -> residuals
    // s[i]-s[i-1] = [1, -1, 2]; zigzag [2, 1, 4]; rice param 0 is pure
    // unary: 001 01 00001
    val samples = Array(3, 4, 3, 5)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(samples.map(_.toByte))
    val w = new Flac.BitWriter
    w.u(0x664c6143L, 32)             // fLaC
    w.u(0x80, 8); w.u(34, 24)        // last | STREAMINFO, length
    w.u(16, 16); w.u(16, 16)         // min/max blocksize
    w.u(0, 24); w.u(0, 24)           // min/max framesize unknown
    w.u(8000, 20)                    // sample rate
    w.u(0, 3); w.u(7, 5)             // 1 channel, 8 bps
    w.u(4, 36)                       // total samples
    md5.foreach(b => w.u(b & 0xffL, 8))
    val frameStart = w.size
    w.u(0x3ffe, 14); w.u(0, 2)       // sync, reserved, fixed blocking
    w.u(6, 4)                        // blocksize: 8-bit at end of header
    w.u(0, 4)                        // sample rate from STREAMINFO
    w.u(0, 4)                        // 1 channel
    w.u(1, 3); w.u(0, 1)             // 8-bit, reserved
    w.u(0, 8)                        // coded frame number 0
    w.u(3, 8)                        // blocksize-1
    val crc8At = w.size
    w.u(0, 8)
    w.u(0, 1); w.u(9, 6); w.u(0, 1)  // subframe: pad, FIXED order 1, no wasted
    w.s(3, 8)                        // warmup
    w.u(0, 2); w.u(0, 4)             // residual method 0, partition order 0
    w.u(0, 4)                        // rice param 0
    w.u(1, 3)                        // residual 1  -> 001
    w.u(1, 2)                        // residual -1 -> 01
    w.u(1, 5)                        // residual 2  -> 00001
    w.align()
    val crc16At = w.size
    w.u(0, 16)
    val bytes = w.toBytes
    bytes(crc8At) = polyDiv(java.util.Arrays.copyOfRange(bytes, frameStart, crc8At), BigInt(0x07), 8).toByte
    val c16 = polyDiv(java.util.Arrays.copyOfRange(bytes, frameStart, crc16At), BigInt(0x8005), 16)
    bytes(crc16At) = (c16 >> 8).toByte
    bytes(crc16At + 1) = c16.toByte

    val st = Flac.decode(bytes)
    assert(st.sampleRate == 8000 && st.channels == 1 && st.bitsPerSample == 8)
    assert(st.samples.toSeq == samples.toSeq)
    assert(Media.sniff(bytes) == "audio/flac")
  }

  private def roundTrip(sr: Int, ch: Int, bps: Int, s: Array[Int]): Array[Byte] = {
    val bytes = Flac.encode(sr, ch, bps, s)
    val st = Flac.decode(bytes)
    assert(st.sampleRate == sr && st.channels == ch && st.bitsPerSample == bps)
    assert(st.totalSamples == s.length / ch)
    assert(st.samples.toSeq == s.toSeq)
    bytes
  }

  test("encode() header fields byte-pinned") {
    val bytes = Flac.encode(44100, 1, 16, Array(5, 6, 7))
    assert(new String(bytes, 0, 4, "US-ASCII") == "fLaC")
    assert((bytes(4) & 0xff) == 0x80 && bytes(7) == 34) // last STREAMINFO, 34 bytes
    assert(((bytes(8) & 0xff) << 8 | (bytes(9) & 0xff)) == 4096)  // min blocksize
    // sample rate 44100 = 0xAC44 over 20 bits starting at byte 18
    val sr = ((bytes(18) & 0xff) << 12) | ((bytes(19) & 0xff) << 4) | ((bytes(20) & 0xf0) >> 4)
    assert(sr == 44100)
    assert((bytes(20) & 0x0e) == 0)        // channels-1 = 0
    val bpsm1 = ((bytes(20) & 1) << 4) | ((bytes(21) & 0xf0) >> 4)
    assert(bpsm1 == 15)
    // frame sync immediately after the 42-byte header
    assert((bytes(42) & 0xff) == 0xff && (bytes(43) & 0xfc) == 0xf8)
  }

  test("round trip: mono 16-bit across frame boundaries (3 frames, short tail)") {
    val rnd = new scala.util.Random(11)
    val n = 4096 * 2 + 1234
    val s = Array.tabulate(n)(i =>
      (2000 * math.sin(i / 37.0)).toInt + rnd.nextInt(21) - 10)
    val bytes = roundTrip(8000, 1, 16, s)
    val plan = Flac.describe(bytes)
    assert(plan.length == 3 && plan(2).contains("bs=1234"), plan.mkString("; "))
  }

  test("high-frequency tone picks LPC; the plan says so") {
    // at omega = 2 rad/sample, fixed differencing AMPLIFIES the signal
    // ((2 sin 1)^4 = 8x) while a resonant LPC pole pair models it down
    // to the 12-bit coefficient-quantization floor
    val s = Array.tabulate(4096)(i => (12000 * math.sin(2.0 * i)).toInt)
    val bytes = roundTrip(16000, 1, 16, s)
    val plan = Flac.describe(bytes)
    assert(plan.exists(_.contains("LPC")), plan.mkString("; "))
  }

  test("white noise picks the raw-bits escape over Rice") {
    val rnd = new scala.util.Random(23)
    val s = Array.fill(4096)(rnd.nextInt(65536) - 32768)
    val bytes = roundTrip(48000, 1, 16, s)
    val plan = Flac.describe(bytes)
    assert(plan.exists(_.contains("+esc")), plan.mkString("; "))
  }

  test("piecewise signal uses multiple Rice partitions") {
    // quiet half then loud half: one global param overpays; the search
    // must split partitions
    val rnd = new scala.util.Random(31)
    val s = Array.tabulate(4096)(i =>
      if (i < 2048) rnd.nextInt(5) - 2 else rnd.nextInt(4001) - 2000)
    val bytes = roundTrip(8000, 1, 16, s)
    val plan = Flac.describe(bytes)
    assert(plan.exists(l => "/po[1-6]".r.findFirstIn(l).isDefined), plan.mkString("; "))
  }

  test("wasted bits detected and declared") {
    val rnd = new scala.util.Random(41)
    val s = Array.fill(600)((rnd.nextInt(2001) - 1000) * 16)
    val bytes = roundTrip(8000, 1, 16, s)
    val plan = Flac.describe(bytes)
    assert(plan.exists(_.contains("+w4")), plan.mkString("; "))
  }

  test("stereo: correlated channels pick a decorrelated mode; independent noise stays independent") {
    val rnd = new scala.util.Random(53)
    // near-identical channels: side is tiny
    val corr = new Array[Int](2 * 2000)
    for (i <- 0 until 2000) {
      val v = (8000 * math.sin(i / 53.0)).toInt + rnd.nextInt(11) - 5
      corr(2 * i) = v
      corr(2 * i + 1) = v + rnd.nextInt(3) - 1
    }
    val planC = Flac.describe(roundTrip(44100, 2, 16, corr))
    assert(planC.exists(l => l.contains("MS") || l.contains("LS") || l.contains("SR")),
      planC.mkString("; "))
    val indep = Array.fill(2 * 2000)(rnd.nextInt(60000) - 30000)
    val planI = Flac.describe(roundTrip(44100, 2, 16, indep))
    assert(planI.exists(_.contains("I2")), planI.mkString("; "))
  }

  test("round trip: 8-bit, constants, extremes, empty") {
    roundTrip(8000, 1, 8, Array.tabulate(300)(i => (i % 256) - 128))
    roundTrip(8000, 1, 8, Array.fill(100)(42))
    roundTrip(8000, 1, 16, Array(Short.MinValue.toInt, Short.MaxValue.toInt,
      0, -1, 1, Short.MinValue.toInt, Short.MaxValue.toInt))
    roundTrip(8000, 2, 16, Array(-32768, 32767, 32767, -32768))
    val empty = Flac.decode(Flac.encode(8000, 1, 16, Array[Int]()))
    assert(empty.totalSamples == 0 && empty.samples.isEmpty)
  }

  test("hostile inputs refuse loudly") {
    val good = Flac.encode(8000, 1, 16, Array.tabulate(500)(i => i * 7 % 1000 - 500))
    intercept[IllegalArgumentException](Flac.decode(Array[Byte]()))
    intercept[IllegalArgumentException](Flac.decode("fLaX".getBytes ++ good.drop(4)))
    // truncation at every region boundary
    for (cut <- Seq(10, 41, 43, good.length - 3))
      intercept[IllegalArgumentException](Flac.decode(good.take(cut)))
    // flip one bit in the frame header -> CRC-8 (or sync) refusal
    val h = good.clone; h(45) = (h(45) ^ 0x10).toByte
    intercept[IllegalArgumentException](Flac.decode(h))
    // flip one bit deep in the frame body -> CRC-16 (or MD5) refusal
    val b = good.clone; b(good.length - 5) = (b(good.length - 5) ^ 1).toByte
    intercept[IllegalArgumentException](Flac.decode(b))
    // corrupt the STREAMINFO MD5 -> signature refusal
    val m = good.clone; m(26) = (m(26) ^ 0xff).toByte
    val e = intercept[IllegalArgumentException](Flac.decode(m))
    assert(e.getMessage.contains("MD5"))
    // unsupported depth refuses by name: rewrite bps-1 to 11 (12-bit)
    val d = good.clone
    d(20) = (d(20) & 0xfe).toByte
    d(21) = ((d(21) & 0x0f) | (11 << 4) & 0xf0).toByte
    val e2 = intercept[IllegalArgumentException](Flac.decode(d))
    assert(e2.getMessage.contains("12-bit"))
    // hostile declared total: 2^35 samples must refuse before allocating
    val t = good.clone
    t(21) = (t(21) | 0x08).toByte // set a high total-samples bit
    val e3 = intercept[IllegalArgumentException](Flac.decode(t))
    assert(e3.getMessage.contains("2^28") || e3.getMessage.contains("MD5") ||
      e3.getMessage.contains("total"), e3.getMessage)
  }

  test("encode refuses out-of-range input") {
    intercept[IllegalArgumentException](Flac.encode(8000, 3, 16, new Array[Int](3)))
    intercept[IllegalArgumentException](Flac.encode(8000, 1, 12, new Array[Int](4)))
    intercept[IllegalArgumentException](Flac.encode(8000, 1, 16, Array(40000)))
    intercept[IllegalArgumentException](Flac.encode(8000, 1, 8, Array(200)))
    intercept[IllegalArgumentException](Flac.encode(8000, 2, 16, new Array[Int](3)))
    intercept[IllegalArgumentException](Flac.encode(0, 1, 16, new Array[Int](4)))
  }
}
