package graft.formats

/** From-scratch codecs for the media containers the multimodal operators
  * (SURVEY §2.6) decode — no image/audio libraries involved, built
  * against the public format specifications:
  *
  *  - BMP: Windows BITMAPFILEHEADER + BITMAPINFOHEADER, 24/32-bpp
  *    uncompressed (`BI_RGB`), 4-byte-padded rows, bottom-up (positive
  *    height) or top-down (negative height) — the format Microsoft
  *    documents in the Wdk `Bitmap Storage` pages.
  *  - WAV: RIFF container with `fmt ` + `data` chunks, PCM
  *    (`wFormatTag=1`) 8/16-bit plus G.711 μ-law/A-law (tags 7/6),
  *    word-aligned chunk walk — per the original IBM/Microsoft RIFF spec
  *    and ITU-T G.711.
  *  - AVI: RIFF `AVI ` with `hdrl` (avih + strl) and `movi` lists,
  *    MJPEG (`MJPG`) video frames decoded by [[Jpeg]] — per Microsoft's
  *    AVI RIFF documentation.
  *
  * Anything outside that envelope (compressed BMP, float/ADPCM WAV,
  * non-MJPEG AVI streams, truncated containers) refuses loudly rather
  * than guessing. MediaFormatsSpec cross-validates against the JDK's own
  * readers/writers (`javax.imageio.ImageIO`, `javax.sound.sampled`) as
  * independent referees where the JDK has one (BMP/WAV/JPEG frames),
  * plus hand-computed byte-level fixtures (the AVI container itself has
  * no in-env referee — same posture as Puffin).
  */
object Media {

  /** Container sniff by magic bytes — the dispatch step of a mixed-media
    * ingestion directory (m09). Returns a MIME-ish tag or "unknown";
    * never throws on short/foreign buffers.
    */
  def sniff(b: Array[Byte]): String = {
    def at(off: Int, s: String): Boolean =
      b.length >= off + s.length && s.indices.forall(i => b(off + i) == s.charAt(i).toByte)
    if (at(0, "BM")) "image/bmp"
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && at(1, "PNG")) "image/png"
    else if (at(0, "GIF8")) "image/gif"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "image/jpeg"
    else if (at(0, "fLaC")) "audio/flac"
    else if (at(0, "RIFF") && at(8, "WAVE")) "audio/wav"
    else if (at(0, "RIFF") && at(8, "AVI ")) "video/x-msvideo"
    else "unknown"
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
  }
  private def putI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }

  // ---------------------------------------------------------------- BMP

  /** Decoded raster: `pixels` is row-major TOP-DOWN RGB, 3 bytes per
    * pixel (storage order in the file is BGR bottom-up; decode
    * normalizes both).
    */
  case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    def red(x: Int, y: Int): Int = pixels((y * width + x) * 3) & 0xff
    def green(x: Int, y: Int): Int = pixels((y * width + x) * 3 + 1) & 0xff
    def blue(x: Int, y: Int): Int = pixels((y * width + x) * 3 + 2) & 0xff
  }

  object Bmp {
    /** 24-bpp `BI_RGB` encode from top-down RGB pixel bytes: 14-byte file
      * header, 40-byte info header, rows written bottom-up with each row
      * padded to a 4-byte boundary.
      */
    def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3,
        s"pixel buffer ${rgb.length} != $width x $height x 3")
      val stride = (width * 3 + 3) / 4 * 4
      val dataSize = stride * height
      val out = new Array[Byte](54 + dataSize)
      out(0) = 'B'; out(1) = 'M'
      putI32(out, 2, out.length)       // bfSize
      putI32(out, 10, 54)              // bfOffBits
      putI32(out, 14, 40)              // biSize (BITMAPINFOHEADER)
      putI32(out, 18, width)
      putI32(out, 22, height)          // positive → bottom-up
      putU16(out, 26, 1)               // biPlanes
      putU16(out, 28, 24)              // biBitCount
      putI32(out, 30, 0)               // biCompression = BI_RGB
      putI32(out, 34, dataSize)
      var y = 0
      while (y < height) {
        val rowTop = height - 1 - y    // file row y holds image row rowTop
        var x = 0
        while (x < width) {
          val src = (rowTop * width + x) * 3
          val dst = 54 + y * stride + x * 3
          out(dst) = rgb(src + 2)      // B
          out(dst + 1) = rgb(src + 1)  // G
          out(dst + 2) = rgb(src)      // R
          x += 1
        }
        y += 1
      }
      out
    }

    /** Decode 24/32-bpp uncompressed BMP to top-down RGB. Refuses
      * compressed pixel formats, palette depths, and truncated buffers.
      */
    def decode(bytes: Array[Byte]): Image = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
        "not a BMP: missing 'BM' magic or header too short")
      val offBits = i32(bytes, 10)
      val dibSize = i32(bytes, 14)
      require(dibSize >= 40,
        s"unsupported DIB header size $dibSize (need BITMAPINFOHEADER+)")
      val width = i32(bytes, 18)
      val rawHeight = i32(bytes, 22)
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      val bpp = u16(bytes, 28)
      val compression = i32(bytes, 30)
      require(compression == 0,
        s"unsupported BMP compression $compression (only BI_RGB)")
      require(bpp == 24 || bpp == 32,
        s"unsupported BMP bit depth $bpp (only 24/32)")
      require(width > 0 && height >= 0, s"bad dimensions ${width}x$rawHeight")
      val bytesPerPx = bpp / 8
      // all size arithmetic in Long, and the pixel budget FIRST: with
      // width·height ≤ Int.MaxValue/3 pinned, no later product (stride
      // ≤ 4·width+4, stride·height) can overflow Long — a hostile
      // header near Int.MaxValue on BOTH axes must hit a refusal, never
      // wrap past one into a negative allocation
      require(width.toLong * height <= Int.MaxValue / 3,
        s"BMP dimensions ${width}x$height exceed the decodable pixel budget")
      val strideL = (width.toLong * bytesPerPx + 3) / 4 * 4
      require(offBits >= 0 && strideL * height <= bytes.length.toLong - offBits,
        s"truncated BMP: need ${offBits + strideL * height} bytes, have ${bytes.length}")
      val stride = strideL.toInt
      val rgb = new Array[Byte](width * height * 3)
      var fileRow = 0
      while (fileRow < height) {
        val y = if (topDown) fileRow else height - 1 - fileRow
        var x = 0
        while (x < width) {
          val src = offBits + fileRow * stride + x * bytesPerPx
          val dst = (y * width + x) * 3
          rgb(dst) = bytes(src + 2)     // R
          rgb(dst + 1) = bytes(src + 1) // G
          rgb(dst + 2) = bytes(src)     // B
          x += 1
        }
        fileRow += 1
      }
      Image(width, height, rgb)
    }
  }

  // ---------------------------------------------------------------- WAV

  /** Decoded PCM audio: `samples` interleaved across channels — 16-bit
    * as signed values, 8-bit as the format's unsigned 0–255.
    */
  case class Audio(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int])

  object Wav {
    /** G.711 μ-law compand/expand (the 16-bit-scaled table the JDK's own
      * ULAW codec uses: BIAS 0x84, magnitudes up to 32124 = ((15·8+132)
      * <<7)−132). decode(encode(x)) == x exactly for representable x —
      * the identity the m05 gate's oracle rides.
      */
    def mulawEncode(s: Int): Byte = {
      val sign = if (s < 0) 0x80 else 0
      var x = math.min(if (s < 0) -s else s, 32635)
      x += 0x84
      var e = 7
      while (e > 0 && (x & (0x80 << e)) == 0) e -= 1
      val m = (x >> (e + 3)) & 0x0f
      (~(sign | (e << 4) | m)).toByte
    }

    def mulawDecode(b: Byte): Int = {
      val u = ~b & 0xff
      val e = (u >> 4) & 7
      val m = u & 0x0f
      val x = (((m << 3) | 0x84) << e) - 0x84
      if ((u & 0x80) != 0) -x else x
    }

    /** G.711 A-law (ITU-T; even-bit inversion 0x55): 13-bit magnitudes,
      * the scale the JDK's ALAW codec expands to (<<3 on decode).
      */
    def alawEncode(s: Int): Byte = {
      val sign = if (s >= 0) 0x80 else 0
      val x = math.min((if (s < 0) -s else s) >> 3, 4095)
      // segment e ≥ 1 covers x ∈ [2^(e+4), 2^(e+5)); e = 0 below 32
      var e = 7
      while (e > 0 && x < (0x20 << (e - 1))) e -= 1
      val m = if (e == 0) x >> 1 else (x >> e) & 0x0f
      ((sign | (e << 4) | m) ^ 0x55).toByte
    }

    def alawDecode(b: Byte): Int = {
      val u = (b ^ 0x55) & 0xff
      val e = (u >> 4) & 7
      val m = u & 0x0f
      val x = if (e == 0) (m << 1) | 1 else ((m | 0x10) << e) | (1 << (e - 1))
      val v = x << 3
      if ((u & 0x80) != 0) v else -v
    }

    /** Companded mono encode (WAVE_FORMAT_MULAW=7 / ALAW=6, 8 bits per
      * sample): same canonical RIFF layout as [[encode]].
      */
    def encodeCompanded(sampleRate: Int, samples: Array[Int], mulaw: Boolean): Array[Byte] = {
      val out = new Array[Byte](44 + samples.length)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putI32(out, 4, 36 + samples.length)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putI32(out, 16, 16)
      putU16(out, 20, if (mulaw) 7 else 6)
      putU16(out, 22, 1)
      putI32(out, 24, sampleRate)
      putI32(out, 28, sampleRate)      // byte rate: 1 byte/sample
      putU16(out, 32, 1)               // block align
      putU16(out, 34, 8)               // bits per sample
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      putI32(out, 40, samples.length)
      var i = 0
      while (i < samples.length) {
        out(44 + i) = if (mulaw) mulawEncode(samples(i)) else alawEncode(samples(i))
        i += 1
      }
      out
    }

    /** 16-bit signed mono PCM encode: RIFF/WAVE with a canonical 16-byte
      * `fmt ` chunk followed by `data`.
      */
    def encode(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
      val dataSize = samples.length * 2
      val out = new Array[Byte](44 + dataSize)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putI32(out, 4, 36 + dataSize)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putI32(out, 16, 16)              // fmt chunk size
      putU16(out, 20, 1)               // PCM
      putU16(out, 22, 1)               // mono
      putI32(out, 24, sampleRate)
      putI32(out, 28, sampleRate * 2)  // byte rate
      putU16(out, 32, 2)               // block align
      putU16(out, 34, 16)              // bits per sample
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      putI32(out, 40, dataSize)
      var i = 0
      while (i < samples.length) {
        val s = samples(i)
        require(s >= Short.MinValue && s <= Short.MaxValue, s"sample $s out of 16-bit range")
        putU16(out, 44 + i * 2, s & 0xffff)
        i += 1
      }
      out
    }

    /** Decode WAV: word-aligned chunk walk (unknown chunks like `LIST`
      * are skipped). `fmt ` must declare PCM 8/16-bit or G.711
      * μ-law/A-law (tags 7/6, 8-bit) — companded data EXPANDS to linear
      * samples (`bitsPerSample` reports 16, the decoded representation).
      */
    def decode(bytes: Array[Byte]): Audio = {
      require(bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
        "not a WAV: missing RIFF/WAVE magic")
      var pos = 12
      var fmtSeen = false
      var tag = 0
      var channels = 0; var sampleRate = 0; var bits = 0
      var samples: Array[Int] = null
      while (pos + 8 <= bytes.length && samples == null) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val size = i32(bytes, pos + 4)
        // Long arithmetic: a chunk size near Int.MaxValue must refuse
        // here, not wrap the bound check and blow up downstream
        require(size >= 0 && pos.toLong + 8 + size <= bytes.length.toLong,
          s"truncated WAV chunk '$id' at $pos (size $size)")
        id match {
          case "fmt " =>
            require(size >= 16, s"fmt chunk too short: $size")
            tag = u16(bytes, pos + 8)
            require(tag == 1 || tag == 6 || tag == 7,
              s"unsupported WAV format tag $tag (PCM, A-law, or mu-law)")
            channels = u16(bytes, pos + 10)
            sampleRate = i32(bytes, pos + 12)
            bits = u16(bytes, pos + 22)
            if (tag == 1)
              require(bits == 8 || bits == 16,
                s"unsupported PCM bit depth $bits (only 8/16)")
            else
              require(bits == 8, s"companded WAV must be 8-bit, got $bits")
            require(channels >= 1, s"bad channel count $channels")
            // i32 read: a flipped top bit yields a NEGATIVE rate the
            // decoder would otherwise hand downstream (hostile-sweep find)
            require(sampleRate >= 1, s"bad sample rate $sampleRate")
            fmtSeen = true
          case "data" =>
            require(fmtSeen, "WAV data chunk before fmt chunk")
            // self-consistency: the payload must be a whole number of
            // sample FRAMES — a corrupted channel count (or a truncated
            // 16-bit tail) would otherwise decode to samples that
            // mis-align every per-channel consumer downstream (found by
            // the CodecFuzzSpec hostile battery)
            require(size % (bits / 8) == 0,
              s"WAV data length $size is not whole ${bits}-bit samples")
            val n = size / (bits / 8)
            require(n % channels == 0,
              s"WAV data ($n samples) is not a whole number of $channels-channel frames")
            val out = new Array[Int](n)
            var i = 0
            if (tag == 7) {
              while (i < n) { out(i) = mulawDecode(bytes(pos + 8 + i)); i += 1 }
            } else if (tag == 6) {
              while (i < n) { out(i) = alawDecode(bytes(pos + 8 + i)); i += 1 }
            } else if (bits == 16) {
              while (i < n) {
                out(i) = u16(bytes, pos + 8 + i * 2).toShort.toInt
                i += 1
              }
            } else {
              while (i < n) { out(i) = bytes(pos + 8 + i) & 0xff; i += 1 }
            }
            samples = out
          case _ => () // skip unknown chunk (LIST, fact, …)
        }
        pos += 8 + size + (size & 1)   // RIFF chunks are word-aligned
      }
      require(samples != null, "WAV has no data chunk")
      Audio(sampleRate, channels, if (tag == 1) bits else 16, samples)
    }
  }

  // ---------------------------------------------------------------- AVI

  /** Decoded video container: raw per-frame payloads (MJPEG bytes) plus
    * stream geometry; [[Video.frame]] decodes one frame through [[Jpeg]]
    * — per-frame decode is the access pattern training pipelines sample
    * with, so frames stay lazy.
    */
  case class Video(width: Int, height: Int, usPerFrame: Int,
      frames: IndexedSeq[Array[Byte]]) {
    def numFrames: Int = frames.length
    def frame(i: Int): Image = {
      val img = Jpeg.decode(frames(i))
      require(img.width == width && img.height == height,
        s"frame $i is ${img.width}x${img.height}, stream says ${width}x$height")
      img
    }
  }

  object Avi {
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** Minimal standard MJPEG AVI: RIFF(AVI ) → LIST(hdrl){avih,
      * LIST(strl){strh 'vids'/'MJPG', strf BITMAPINFOHEADER}} →
      * LIST(movi){00dc…}, word-aligned. Frames are JPEG payloads
      * (callers encode via [[Jpeg.encode]]).
      */
    def encode(width: Int, height: Int, usPerFrame: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
      require(usPerFrame > 0, s"bad frame interval $usPerFrame")
      val bos = new java.io.ByteArrayOutputStream()
      def w32(v: Int): Unit = {
        bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
      }
      def tag(t: String): Unit = bos.write(t.getBytes("US-ASCII"))
      val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
      val moviBody = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
      val strl = 4 + 8 + 56 + 8 + 40
      val hdrl = 4 + 8 + 56 + 8 + strl
      val riffBody = 4 + 8 + hdrl + 8 + moviBody
      tag("RIFF"); w32(riffBody); tag("AVI ")
      tag("LIST"); w32(hdrl); tag("hdrl")
      tag("avih"); w32(56)
      w32(usPerFrame); w32(0); w32(0)
      w32(0)                            // dwFlags: no idx1, so no HASINDEX
      w32(frames.length); w32(0); w32(1) // streams
      w32(maxFrame); w32(width); w32(height)
      w32(0); w32(0); w32(0); w32(0)    // reserved
      tag("LIST"); w32(strl); tag("strl")
      tag("strh"); w32(56)
      tag("vids"); tag("MJPG")
      w32(0); w32(0); w32(0)            // flags, prio+lang, initialFrames
      w32(1); w32(1000000 / usPerFrame.max(1)) // scale, rate ≈ fps
      w32(0); w32(frames.length)        // start, length
      w32(maxFrame); w32(-1); w32(0)    // suggested buffer, quality, sampleSize
      // rcFrame: left top right bottom (u16 each)
      bos.write(0); bos.write(0); bos.write(0); bos.write(0)
      bos.write(width & 0xff); bos.write((width >> 8) & 0xff)
      bos.write(height & 0xff); bos.write((height >> 8) & 0xff)
      tag("strf"); w32(40)
      w32(40); w32(width); w32(height)
      bos.write(1); bos.write(0)        // planes
      bos.write(24); bos.write(0)       // bit count
      tag("MJPG")                       // biCompression
      w32(width * height * 3); w32(0); w32(0); w32(0); w32(0)
      tag("LIST"); w32(moviBody); tag("movi")
      frames.foreach { f =>
        tag("00dc"); w32(f.length)
        bos.write(f, 0, f.length)
        if ((f.length & 1) == 1) bos.write(0) // word alignment
      }
      bos.toByteArray
    }

    /** Parse an MJPEG AVI: walk RIFF lists for `avih` (geometry, frame
      * interval) and the `movi` frame chunks (`00dc`/`00db` of stream 0).
      * Non-MJPEG video streams refuse; `idx1`/other chunks are skipped.
      */
    def decode(bytes: Array[Byte]): Video = {
      require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
        fourcc(bytes, 8) == "AVI ", "not an AVI: missing RIFF/AVI magic")
      var width = 0; var height = 0; var usPerFrame = 0
      var avihSeen = false
      var compression: String = null
      val frames = IndexedSeq.newBuilder[Array[Byte]]

      def i32(off: Int): Int =
        (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
          ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)

      def walk(start: Int, end: Int, depth: Int = 0): Unit = {
        // hostile LIST nesting must refuse, not blow the stack
        require(depth <= 16, s"AVI: LIST nesting deeper than 16 at $start")
        var pos = start
        while (pos + 8 <= end) {
          val id = fourcc(bytes, pos)
          val size = i32(pos + 4)
          require(size >= 0 && pos.toLong + 8 + size <= end.toLong,
            s"truncated AVI chunk '$id' at $pos (size $size)")
          id match {
            case "LIST" =>
              walk(pos + 12, pos + 8 + size, depth + 1) // skip the list type fourcc
            case "avih" =>
              require(size >= 40, s"avih too short: $size")
              usPerFrame = i32(pos + 8)
              width = i32(pos + 40); height = i32(pos + 44)
              avihSeen = true
            case "strf" =>
              if (size >= 20 && compression == null) {
                val c = fourcc(bytes, pos + 8 + 16)
                if (c != "\u0000\u0000\u0000\u0000") compression = c
              }
            case "00dc" | "00db" =>
              frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size)
            case _ => () // strh, idx1, JUNK, vedt, …
          }
          pos += 8 + size + (size & 1)   // RIFF chunks are word-aligned
        }
      }
      walk(12, bytes.length)
      require(avihSeen, "AVI has no avih header")
      require(compression == null || compression == "MJPG" || compression == "mjpg",
        s"unsupported AVI video compression '$compression' (MJPEG only)")
      require(width > 0 && height > 0, s"bad AVI dimensions ${width}x$height")
      Video(width, height, usPerFrame, frames.result())
    }
  }
}
