package graft.formats

/** From-scratch BASELINE JPEG codec (ITU-T T.81 / ISO 10918-1, the
  * public spec; JFIF 1.02 container) — closing the declared
  * compressed-media gap behind the multimodal operators for the most
  * common training-image format. No image libraries involved; JpegSpec
  * cross-validates BOTH directions against the JDK's ImageIO plugin as
  * an independent referee.
  *
  * Envelope (refusals are loud, never guesses):
  *  - decode: baseline sequential DCT (SOF0) only, 8-bit precision,
  *    1-component grayscale or 3-component YCbCr with sampling factors
  *    in {1, 2} (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), single interleaved
  *    scan, restart markers (DRI/RSTn), 8- and 16-bit DQT entries,
  *    byte-stuffed entropy data. Progressive (SOF2), arithmetic coding,
  *    12-bit, and CMYK refuse.
  *  - encode: grayscale or 4:4:4 YCbCr, quality-scaled Annex K quant
  *    tables, the spec's Annex K "typical" Huffman tables, JFIF APP0.
  *
  * Decoder structure follows the spec's own decode procedures (F.2.2:
  * Huffman DECODE via mincode/maxcode/valptr, EXTEND, the zigzag order
  * of A.3.6); chroma upsampling is sample replication (the spec's
  * stated default in A.1.1); the IDCT is the textbook separable
  * double-precision form of A.3.3.
  */
object Jpeg {

  /** A.3.6 zigzag: position-in-scan → natural (row-major) index. */
  private[formats] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization table (natural order). */
  private val StdLumQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table (natural order). */
  private val StdChrQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** libjpeg's public quality→scale mapping (quality_scaling): the de
    * facto meaning of "quality N" every tool shares.
    */
  private[formats] def scaledQuant(std: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality $quality not in 1..100")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    std.map(q => math.min(255, math.max(1, (q * scale + 50) / 100)))
  }

  // Annex K.3 "typical" Huffman tables: (bits per length 1..16, values)
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  // precomputed IDCT/FDCT basis: cosTab(u)(x) = cos((2x+1)·u·π/16)·C(u)
  private val cosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ------------------------------------------------------------- decode

  /** Canonical Huffman table in the spec's F.2.2.3 DECODE form. */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val huffVal: Array[Byte] = vals
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
      require(k == vals.length, s"DHT: ${vals.length} values for $k codes")
    }
  }

  /** Entropy-coded-segment bit reader: 0xFF00 unstuffs to 0xFF; any
    * other marker mid-read refuses (baseline scans end at RST/EOI which
    * the MCU loop consumes explicitly).
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0

    private def nextByte(): Int = {
      require(pos < bytes.length, "JPEG: entropy data truncated")
      val b = bytes(pos) & 0xff
      pos += 1
      if (b == 0xff) {
        require(pos < bytes.length, "JPEG: entropy data truncated at 0xFF")
        val m = bytes(pos) & 0xff
        require(m == 0x00,
          f"JPEG: unexpected marker 0xFF$m%02X inside entropy data")
        pos += 1
      }
      b
    }

    def readBit(): Int = {
      if (nbits == 0) { acc = nextByte(); nbits = 8 }
      nbits -= 1
      (acc >> nbits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(n: Int): Unit = {
      nbits = 0
      require(pos + 2 <= bytes.length, "JPEG: truncated at restart marker")
      val a = bytes(pos) & 0xff; val b = bytes(pos + 1) & 0xff
      require(a == 0xff && b == 0xd0 + n,
        f"JPEG: expected RST$n%d, found 0x$a%02X$b%02X")
      pos += 2
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = readBit()
      var l = 1
      while (code > t.maxCode(l)) {
        require(l < 16, "JPEG: invalid Huffman code (no match in 16 bits)")
        code = (code << 1) | readBit()
        l += 1
      }
      t.huffVal(t.valPtr(l) + code - t.minCode(l)) & 0xff
    }
  }

  /** F.2.2.1 EXTEND: sign-extend an SSSS-category magnitude. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: HuffTable = null
    var acTable: HuffTable = null
    var pred: Int = 0
    var plane: Array[Byte] = null // compW x compH samples
    var compW: Int = 0
    var compH: Int = 0
    var blocksW: Int = 0          // MCU-padded block grid
    var blocksH: Int = 0
    var trueBlocksW: Int = 0      // ceil(true comp dims / 8) — the grid
    var trueBlocksH: Int = 0      // non-interleaved scans cover (B.2.3)
    var coefs: Array[Int] = null  // raw coefficients, 64 per block
  }

  /** Decode a baseline (SOF0) or PROGRESSIVE (SOF2) JPEG to top-down
    * RGB (grayscale replicates into all three channels — same surface as
    * [[Media.Bmp.decode]]). Multi-scan: every scan's coefficients
    * accumulate into a per-component store (spectral selection +
    * successive approximation per T.81 G.1.2, the same control flow the
    * spec's own decode procedures describe); dequantization and the IDCT
    * run once at the end.
    */
  def decode(bytes: Array[Byte]): Media.Image = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG: missing SOI marker")
    var pos = 2
    val quant = new Array[Array[Int]](4) // natural order, per table id
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var progressive = false
    var sawScan = false
    var done = false
    var hMax = 1; var vMax = 1
    var mcusX = 0; var mcusY = 0

    def u16at(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)

    // ---- one entropy-coded scan, accumulating into the coefficient store
    def decodeScan(scanComps: Array[Component], ss: Int, se: Int,
        ah: Int, al: Int, entropyStart: Int): Int = {
      val br = new BitReader(bytes, entropyStart)
      var eobrun = 0
      scanComps.foreach(_.pred = 0)
      val interleaved = scanComps.length > 1

      def dcFirst(c: Component, bi: Int): Unit = {
        val t = br.decodeHuff(c.dcTable)
        require(t <= 11, s"JPEG: DC category $t out of range")
        c.pred += extend(br.receive(t), t)
        c.coefs(bi) = c.pred << al
      }
      def dcRefine(c: Component, bi: Int): Unit =
        if (br.readBit() == 1) c.coefs(bi) |= (1 << al)
      def acFirst(c: Component, bi: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        while (k <= se) {
          val rs = br.decodeHuff(c.acTable)
          val r = rs >> 4; val sv = rs & 0x0f
          if (sv != 0) {
            k += r
            require(k <= se, "JPEG: AC run past band end")
            c.coefs(bi + Zigzag(k)) = extend(br.receive(sv), sv) << al
            k += 1
          } else if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.receive(r)
            k = se + 1
          }
        }
      }
      def acRefine(c: Component, bi: Int): Unit = {
        // T.81 G.1.2.3 / the classic correction-bit control flow
        val p1 = 1 << al; val m1 = -1 << al
        var k = ss
        if (eobrun == 0) {
          var break1 = false
          while (k <= se && !break1) {
            val rs = br.decodeHuff(c.acTable)
            var r = rs >> 4
            var newval = 0
            if ((rs & 0x0f) != 0) {
              require((rs & 0x0f) == 1, "JPEG: AC refinement magnitude must be 1")
              newval = if (br.readBit() == 1) p1 else m1
            } else if (r != 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += br.receive(r)
              break1 = true
            }
            if (!break1) {
              var break2 = false
              while (k <= se && !break2) {
                val z = bi + Zigzag(k)
                val cur = c.coefs(z)
                if (cur != 0) {
                  if (br.readBit() == 1 && (cur & p1) == 0)
                    c.coefs(z) = if (cur >= 0) cur + p1 else cur + m1
                  k += 1
                } else if (r == 0) break2 = true
                else { r -= 1; k += 1 }
              }
              if (newval != 0) {
                require(k <= se, "JPEG: refinement run past band end")
                c.coefs(bi + Zigzag(k)) = newval
              }
              k += 1
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val z = bi + Zigzag(k)
            val cur = c.coefs(z)
            if (cur != 0 && br.readBit() == 1 && (cur & p1) == 0)
              c.coefs(z) = if (cur >= 0) cur + p1 else cur + m1
            k += 1
          }
          eobrun -= 1
        }
      }
      def fullBlock(c: Component, bi: Int): Unit = {
        val t = br.decodeHuff(c.dcTable)
        require(t <= 11, s"JPEG: DC category $t out of range")
        c.pred += extend(br.receive(t), t)
        c.coefs(bi) = c.pred
        var k = 1
        while (k < 64) {
          val rs = br.decodeHuff(c.acTable)
          val r = rs >> 4; val sv = rs & 0x0f
          if (sv == 0) {
            if (r == 15) k += 16 else k = 64
          } else {
            k += r
            require(k < 64, "JPEG: AC run past block end")
            c.coefs(bi + Zigzag(k)) = extend(br.receive(sv), sv)
            k += 1
          }
        }
      }

      def decodeUnit(c: Component, bx: Int, by: Int): Unit = {
        val bi = (by * c.blocksW + bx) * 64
        if (!progressive) fullBlock(c, bi)
        else if (ss == 0) { if (ah == 0) dcFirst(c, bi) else dcRefine(c, bi) }
        else { if (ah == 0) acFirst(c, bi) else acRefine(c, bi) }
      }

      val totalMcus =
        if (interleaved || (!progressive && scanComps.length == comps.length))
          mcusX * mcusY
        else { val c = scanComps(0); c.trueBlocksW * c.trueBlocksH }
      var mcu = 0
      var rstIdx = 0
      while (mcu < totalMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(rstIdx % 8)
          rstIdx += 1
          scanComps.foreach(_.pred = 0)
          eobrun = 0
        }
        if (scanComps.length > 1) {
          val mx = mcu % mcusX; val my = mcu / mcusX
          scanComps.foreach { c =>
            var v = 0
            while (v < c.v) {
              var h = 0
              while (h < c.h) {
                decodeUnit(c, mx * c.h + h, my * c.v + v)
                h += 1
              }
              v += 1
            }
          }
        } else {
          // non-interleaved: one data unit per MCU over the component's
          // TRUE block grid (no MCU padding — B.2.3)
          val c = scanComps(0)
          decodeUnit(c, mcu % c.trueBlocksW, mcu / c.trueBlocksW)
        }
        mcu += 1
      }
      br.pos
    }

    // -------------------------------------------------- marker sequence
    while (!done) {
      require(pos + 2 <= bytes.length, "JPEG: truncated before EOI")
      require((bytes(pos) & 0xff) == 0xff, f"JPEG: expected marker at $pos")
      // optional 0xFF fill bytes before a marker (B.1.1.2)
      while (pos + 1 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      require(pos + 2 <= bytes.length, "JPEG: truncated before EOI")
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd9) { // EOI
        require(sawScan, "JPEG: EOI before any scan")
        done = true
      } else {
        require(marker != 0xd8 && (marker < 0xd0 || marker > 0xd7),
          "JPEG: stray SOI/RST in header sequence")
        require(pos + 4 <= bytes.length, "JPEG: truncated segment header")
        val len = u16at(pos + 2)
        require(len >= 2 && pos.toLong + 2 + len <= bytes.length.toLong,
          f"JPEG: truncated segment 0xFF$marker%02X")
        val seg = pos + 4          // first payload byte
        val segEnd = pos + 2 + len
        marker match {
          case 0xdb => // DQT — possibly several tables in one segment
            var p = seg
            while (p < segEnd) {
              val pq = (bytes(p) & 0xff) >> 4
              val tq = bytes(p) & 0x0f
              require(pq <= 1, s"JPEG: bad DQT precision $pq")
              require(tq < 4, s"JPEG: bad DQT id $tq")
              val tbl = new Array[Int](64)
              var i = 0
              p += 1
              while (i < 64) {
                val v = if (pq == 0) { val x = bytes(p) & 0xff; p += 1; x }
                  else { val x = u16at(p); p += 2; x }
                require(v > 0, "JPEG: zero quantizer")
                tbl(Zigzag(i)) = v
                i += 1
              }
              quant(tq) = tbl
            }
          case 0xc4 => // DHT — possibly several tables
            var p = seg
            while (p < segEnd) {
              val tc = (bytes(p) & 0xff) >> 4
              val th = bytes(p) & 0x0f
              require(tc <= 1 && th < 4, s"JPEG: bad DHT class/id $tc/$th")
              val bits = (0 until 16).map(i => bytes(p + 1 + i) & 0xff).toArray
              val n = bits.sum
              require(n <= 256 && p + 17 + n <= segEnd, "JPEG: DHT overruns segment")
              val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + n)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTables(th) = t else acTables(th) = t
              p += 17 + n
            }
          case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
            require(comps == null, "JPEG: multiple frame headers")
            progressive = marker == 0xc2
            val prec = bytes(seg) & 0xff
            require(prec == 8, s"JPEG: unsupported precision $prec (baseline is 8)")
            height = u16at(seg + 1)
            width = u16at(seg + 3)
            require(width > 0 && height > 0, s"JPEG: bad dimensions ${width}x$height")
            // the multi-scan coefficient store costs 4 bytes/pixel/component,
            // so the budget is tighter than the raster-only codecs': 2^26
            // pixels (8K x 8K) caps a hostile header at ~256 MB per plane
            require(width.toLong * height <= (1L << 26),
              s"JPEG dimensions ${width}x$height exceed the decodable pixel budget")
            val nc = bytes(seg + 5) & 0xff
            require(nc == 1 || nc == 3,
              s"JPEG: unsupported component count $nc (grayscale or YCbCr)")
            comps = (0 until nc).map { i =>
              val o = seg + 6 + i * 3
              val id = bytes(o) & 0xff
              val hv = bytes(o + 1) & 0xff
              val c = Component(id, hv >> 4, hv & 0x0f, bytes(o + 2) & 0x0f)
              require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
                s"JPEG: unsupported sampling ${c.h}x${c.v} (only 1 and 2)")
              // Tq is a 4-bit nibble but quant has 4 slots (T.81 B.2.2) —
              // validate before quant(c.tq) is ever indexed
              require(c.tq < 4, s"JPEG: bad component DQT id ${c.tq}")
              c
            }.toArray
            hMax = comps.map(_.h).max
            vMax = comps.map(_.v).max
            mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            comps.foreach { c =>
              c.blocksW = mcusX * c.h
              c.blocksH = mcusY * c.v
              c.compW = c.blocksW * 8
              c.compH = c.blocksH * 8
              c.trueBlocksW = ((width * c.h + hMax - 1) / hMax + 7) / 8
              c.trueBlocksH = ((height * c.v + vMax - 1) / vMax + 7) / 8
              c.coefs = new Array[Int](c.blocksW * c.blocksH * 64)
            }
          case m if m == 0xc1 || m == 0xc3 ||
              (m >= 0xc5 && m <= 0xc7) || (m >= 0xc9 && m <= 0xcf && m != 0xcc) =>
            throw new IllegalArgumentException(
              f"JPEG: unsupported frame type 0xFF$m%02X (baseline SOF0 or progressive SOF2 only)")
          case 0xdd => // DRI
            restartInterval = u16at(seg)
          case 0xda => // SOS
            require(comps != null, "JPEG: SOS before the frame header")
            val ns = bytes(seg) & 0xff
            require(ns >= 1 && ns <= comps.length, s"JPEG: bad scan component count $ns")
            val scanComps = new Array[Component](ns)
            var p = seg + 1
            var i = 0
            while (i < ns) {
              val cid = bytes(p) & 0xff
              val c = comps.find(_.id == cid).getOrElse(
                throw new IllegalArgumentException(s"JPEG: scan references unknown component $cid"))
              scanComps(i) = c
              // Td/Ta are 4-bit stream nibbles but only 0..3 name tables
              // (T.81 B.2.3) — validate BEFORE indexing or a hostile byte
              // escapes as ArrayIndexOutOfBounds instead of the declared
              // refusal (found by the CodecFuzzSpec hostile battery)
              val td = (bytes(p + 1) & 0xff) >> 4
              val ta = bytes(p + 1) & 0x0f
              require(td < 4 && ta < 4, s"JPEG: bad scan entropy-table ids $td/$ta")
              c.dcTable = dcTables(td)
              c.acTable = acTables(ta)
              p += 2; i += 1
            }
            val ss = bytes(p) & 0xff
            val se = bytes(p + 1) & 0xff
            val ah = (bytes(p + 2) & 0xff) >> 4
            val al = bytes(p + 2) & 0x0f
            if (progressive) {
              require(ss <= 63 && se <= 63 && ss <= se, s"JPEG: bad spectral band $ss..$se")
              require(ss != 0 || se == 0, "JPEG: progressive DC scan must have Se=0")
              require(ss == 0 || ns == 1,
                "JPEG: progressive AC scans are single-component")
            } else {
              require(ss == 0 && se == 63 && ah == 0 && al == 0 && ns == comps.length,
                "JPEG: baseline scan must be a full interleaved 0..63 scan")
            }
            // tables actually used by this scan must exist
            scanComps.foreach { c =>
              if (ss == 0 && ah == 0 || !progressive)
                require(c.dcTable != null, "JPEG: scan references an undefined DC table")
              if (se > 0 || !progressive)
                require(c.acTable != null, "JPEG: scan references an undefined AC table")
            }
            sawScan = true
            pos = decodeScan(scanComps, ss, se, ah, al, segEnd)
            // re-sync on the next marker (the entropy reader stops
            // mid-byte; padding bits fill to the boundary)
            while (pos < bytes.length && (bytes(pos) & 0xff) != 0xff) pos += 1
          case _ => () // APPn, COM, others: skip
        }
        if (marker != 0xda) pos = segEnd
      }
    }

    // ------------------------------------------- dequantize + IDCT
    comps.foreach { c =>
      require(quant(c.tq) != null, s"JPEG: component ${c.id} references undefined DQT ${c.tq}")
      c.plane = new Array[Byte](c.compW * c.compH)
      val q = quant(c.tq)
      val coef = new Array[Int](64)
      val out = new Array[Double](64)
      var by = 0
      while (by < c.blocksH) {
        var bx = 0
        while (bx < c.blocksW) {
          val bi = (by * c.blocksW + bx) * 64
          var i = 0
          while (i < 64) { coef(i) = c.coefs(bi + i) * q(i); i += 1 }
          // separable IDCT: rows then columns (A.3.3)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              var sum = 0.0
              var u = 0
              while (u < 8) { sum += cosTab(u)(x) * coef(y * 8 + u); u += 1 }
              out(y * 8 + x) = sum / 2.0
              x += 1
            }
            y += 1
          }
          var x = 0
          while (x < 8) {
            val col = new Array[Double](8)
            var v = 0
            while (v < 8) {
              var sum = 0.0
              var u = 0
              while (u < 8) { sum += cosTab(u)(v) * out(u * 8 + x); u += 1 }
              col(v) = sum / 2.0
              v += 1
            }
            var yy = 0
            while (yy < 8) {
              val s2 = math.round(col(yy) + 128.0).toInt
              val clamped = if (s2 < 0) 0 else if (s2 > 255) 255 else s2
              c.plane((by * 8 + yy) * c.compW + bx * 8 + x) = clamped.toByte
              yy += 1
            }
            x += 1
          }
          bx += 1
        }
        by += 1
      }
    }

    // color reconstruction: replicate chroma (A.1.1 default filter),
    // JFIF YCbCr → RGB
    val rgb = new Array[Byte](width * height * 3)
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = c.plane(y * c.compW + x)
          val d = (y * width + x) * 3
          rgb(d) = g; rgb(d + 1) = g; rgb(d + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val Array(cy, cb, cr) = comps
      def sample(c: Component, x: Int, y: Int): Int =
        c.plane((y * c.v / vMax) * c.compW + (x * c.h / hMax)) & 0xff
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = cy.plane((y * cy.v / vMax) * cy.compW + (x * cy.h / hMax)) & 0xff
          val cbv = sample(cb, x, y) - 128
          val crv = sample(cr, x, y) - 128
          def clamp(d: Double): Byte = {
            val i = math.round(d).toInt
            (if (i < 0) 0 else if (i > 255) 255 else i).toByte
          }
          val d = (y * width + x) * 3
          rgb(d) = clamp(yv + 1.402 * crv)
          rgb(d + 1) = clamp(yv - 0.344136 * cbv - 0.714136 * crv)
          rgb(d + 2) = clamp(yv + 1.772 * cbv)
          x += 1
        }
        y += 1
      }
    }
    Media.Image(width, height, rgb)
  }

  // ------------------------------------------------------------- encode

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (spec F.1.2.3). */
    def flush(): Unit = if (nbits > 0) { write(0xff, 8 - nbits) }
  }

  /** Canonical codes from (bits, vals): value → (code, length). C.2. */
  private def buildCodes(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val codes = new Array[(Int, Int)](256)
    var code = 0; var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        codes(vals(k) & 0xff) = (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    codes
  }

  private def ssss(v: Int): Int = {
    var t = 0; var a = math.abs(v)
    while (a > 0) { t += 1; a >>= 1 }
    t
  }

  /** Baseline JFIF encode of top-down RGB pixels: grayscale = true emits
    * one component; otherwise 4:4:4 YCbCr. Quality per libjpeg's shared
    * scaling of the Annex K tables.
    */
  def encode(width: Int, height: Int, rgb: Array[Byte], quality: Int = 85,
      grayscale: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(rgb.length == width * height * 3,
      s"pixel buffer ${rgb.length} != $width x $height x 3")
    val lumQ = scaledQuant(StdLumQuant, quality)
    val chrQ = scaledQuant(StdChrQuant, quality)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    // JFIF APP0
    marker(0xe0); u16(16)
    out.write('J'); out.write('F'); out.write('I'); out.write('F'); out.write(0)
    out.write(1); out.write(2)   // version 1.02
    out.write(0)                 // no density units
    u16(1); u16(1)               // aspect 1:1
    out.write(0); out.write(0)   // no thumbnail
    // DQT (zigzag order on the wire)
    def dqt(id: Int, tbl: Array[Int]): Unit = {
      marker(0xdb); u16(67); out.write(id)
      var i = 0
      while (i < 64) { out.write(tbl(Zigzag(i))); i += 1 }
    }
    dqt(0, lumQ)
    if (!grayscale) dqt(1, chrQ)
    // SOF0
    val nc = if (grayscale) 1 else 3
    marker(0xc0); u16(8 + 3 * nc)
    out.write(8); u16(height); u16(width); out.write(nc)
    var ci = 0
    while (ci < nc) {
      out.write(ci + 1)          // component id 1..3
      out.write(0x11)            // 1x1 sampling (4:4:4)
      out.write(if (ci == 0) 0 else 1)
      ci += 1
    }
    // DHT
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xc4); u16(19 + vals.length)
      out.write((cls << 4) | id)
      bits.foreach(out.write)
      out.write(vals, 0, vals.length)
    }
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    if (!grayscale) { dht(0, 1, DcChrBits, DcChrVals); dht(1, 1, AcChrBits, AcChrVals) }
    // SOS
    marker(0xda); u16(6 + 2 * nc); out.write(nc)
    ci = 0
    while (ci < nc) {
      out.write(ci + 1)
      out.write(if (ci == 0) 0x00 else 0x11)
      ci += 1
    }
    out.write(0); out.write(63); out.write(0) // Ss/Se/AhAl

    // component planes (full resolution, 4:4:4)
    val planes = new Array[Array[Int]](nc)
    var p = 0
    while (p < nc) { planes(p) = new Array[Int](width * height); p += 1 }
    var i = 0
    while (i < width * height) {
      val r = rgb(i * 3) & 0xff
      val g = rgb(i * 3 + 1) & 0xff
      val b = rgb(i * 3 + 2) & 0xff
      if (grayscale) {
        planes(0)(i) = math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
      } else {
        planes(0)(i) = math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
        planes(1)(i) = math.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt
        planes(2)(i) = math.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt
      }
      i += 1
    }
    def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

    val bw = new BitWriter(out)
    val dcCodes = Array(buildCodes(DcLumBits, DcLumVals),
      buildCodes(DcChrBits, DcChrVals))
    val acCodes = Array(buildCodes(AcLumBits, AcLumVals),
      buildCodes(AcChrBits, AcChrVals))
    val preds = new Array[Int](nc)
    val block = new Array[Double](64)
    val qcoef = new Array[Int](64)
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        ci = 0
        while (ci < nc) {
          val plane = planes(ci)
          val q = if (ci == 0) lumQ else chrQ
          val tid = if (ci == 0) 0 else 1
          // sample the 8x8 block (edge replication), level-shift
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val sx = math.min(bx * 8 + x, width - 1)
              val sy = math.min(by * 8 + y, height - 1)
              block(y * 8 + x) = clamp255(plane(sy * width + sx)) - 128.0
              x += 1
            }
            y += 1
          }
          // separable FDCT (A.3.3 forward form), quantize
          val tmp = new Array[Double](64)
          var u = 0
          while (u < 8) {
            var yy = 0
            while (yy < 8) {
              var sum = 0.0
              var x = 0
              while (x < 8) { sum += cosTab(u)(x) * block(yy * 8 + x); x += 1 }
              tmp(yy * 8 + u) = sum / 2.0
              yy += 1
            }
            u += 1
          }
          var v = 0
          while (v < 8) {
            var uu = 0
            while (uu < 8) {
              var sum = 0.0
              var yy = 0
              while (yy < 8) { sum += cosTab(v)(yy) * tmp(yy * 8 + uu); yy += 1 }
              val nat = v * 8 + uu
              qcoef(nat) = math.round(sum / 2.0 / q(nat)).toInt
              uu += 1
            }
            v += 1
          }
          // entropy-code: DC diff then AC run-lengths, zigzag order
          val diff = qcoef(0) - preds(ci)
          preds(ci) = qcoef(0)
          val t = ssss(diff)
          val (dcode, dlen) = dcCodes(tid)(t)
          bw.write(dcode, dlen)
          if (t > 0) {
            val v2 = if (diff < 0) diff + (1 << t) - 1 else diff
            bw.write(v2, t)
          }
          var k = 1
          var run = 0
          while (k < 64) {
            val c = qcoef(Zigzag(k))
            if (c == 0) run += 1
            else {
              while (run > 15) {
                val (zc, zl) = acCodes(tid)(0xf0); bw.write(zc, zl) // ZRL
                run -= 16
              }
              val s = ssss(c)
              val (code, len) = acCodes(tid)((run << 4) | s)
              bw.write(code, len)
              val v2 = if (c < 0) c + (1 << s) - 1 else c
              bw.write(v2, s)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (ec, el) = acCodes(tid)(0x00); bw.write(ec, el) } // EOB
          ci += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
