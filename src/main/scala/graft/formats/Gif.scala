package graft.formats

/** From-scratch GIF decoder (the public GIF87a/GIF89a specification):
  * logical screen descriptor, global/local color tables, variable-width
  * LZW decompression (clear/end codes, dictionary growth to 12 bits),
  * sub-block reassembly, the four-pass GIF interlace, and 89a extension
  * blocks (skipped; transparency is dropped with the alpha channel, the
  * same posture as PNG). Animated files decode their FIRST frame — the
  * still-image surface [[Media.Image]] shares with the other codecs.
  * Undefined blocks, truncated streams, and out-of-range LZW codes
  * refuse loudly. GifSpec referees against the JDK's ImageIO GIF plugin.
  */
object Gif {

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Variable-width GIF-LZW expansion of `data` (reassembled sub-block
    * bytes) with initial code size `minCodeSize`, producing `expected`
    * color indices.
    */
  private def lzw(data: Array[Byte], minCodeSize: Int, expected: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, s"GIF: bad LZW min code size $minCodeSize")
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    // dictionary: prefix link + suffix byte per code
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = end + 1
    var codeWidth = minCodeSize + 1
    var prev = -1
    var acc = 0; var accBits = 0
    var pos = 0
    val stack = new Array[Byte](4096)

    def emit(codeIn: Int): Unit = {
      var sp = 0
      var code = codeIn
      while (code >= clear) { // walk the chain (root codes are < clear)
        require(sp < stack.length, "GIF: LZW chain overflow")
        stack(sp) = suffix(code); sp += 1
        code = prefix(code)
      }
      require(outPos + sp + 1 <= expected, "GIF: LZW output exceeds image size")
      out(outPos) = code.toByte; outPos += 1
      while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
    }
    def firstOf(codeIn: Int): Byte = {
      var code = codeIn
      while (code >= clear) code = prefix(code)
      code.toByte
    }

    while (outPos < expected) {
      while (accBits < codeWidth) {
        require(pos < data.length, "GIF: truncated LZW stream")
        acc |= (data(pos) & 0xff) << accBits
        accBits += 8; pos += 1
      }
      val code = acc & ((1 << codeWidth) - 1)
      acc >>>= codeWidth; accBits -= codeWidth
      if (code == clear) {
        dictSize = end + 1; codeWidth = minCodeSize + 1; prev = -1
      } else if (code == end) {
        require(outPos == expected,
          s"GIF: LZW end code after $outPos of $expected pixels")
      } else {
        require(code < dictSize || (code == dictSize && prev >= 0),
          s"GIF: LZW code $code out of range (dict $dictSize)")
        if (prev < 0) {
          require(code < clear, "GIF: first code after clear must be a root")
          emit(code)
        } else {
          if (code == dictSize) {
            // KwKwK case: add entry = prev + firstOf(prev), THEN emit it
            require(dictSize < 4096, "GIF: KwKwK code with a full dictionary")
            prefix(dictSize) = prev; suffix(dictSize) = firstOf(prev)
            dictSize += 1
            emit(code)
          } else {
            if (dictSize < 4096) {
              prefix(dictSize) = prev; suffix(dictSize) = firstOf(code)
              dictSize += 1
            }
            emit(code)
          }
        }
        if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        prev = code
      }
    }
    out
  }

  /** Minimal legal GIF89a encoder: 256-entry grayscale global color
    * table, one image, LZW emitting ROOT CODES only — the encoder never
    * uses dictionary entries but must still MIRROR the decoder's
    * dictionary growth (width bumps at 2^w, clear before overflow) so
    * the variable-width stream stays in sync. Spec-legal output every
    * decoder accepts (GifSpec pins ImageIO reading it back exactly).
    */
  def encodeGray(width: Int, height: Int, indices: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(indices.length == width * height,
      s"index buffer ${indices.length} != $width x $height")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    out.write(0x80 | 0x07) // GCT present, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c); w16(0); w16(0); w16(width); w16(height); out.write(0)
    out.write(8) // LZW min code size
    val clear = 256; val end = 257
    val body = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    var codeWidth = 9
    var dictSize = end + 1
    var afterClear = true
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += codeWidth
      while (accBits >= 8) { body.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
    }
    put(clear)
    i = 0
    while (i < indices.length) {
      if (dictSize >= 4094) { // clear before the decoder's table can fill
        put(clear); dictSize = end + 1; codeWidth = 9; afterClear = true
      }
      put(indices(i) & 0xff)
      if (afterClear) afterClear = false
      else {
        dictSize += 1 // the decoder adds one entry per code after the first
        if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
      }
      i += 1
    }
    put(end)
    if (accBits > 0) body.write((acc & 0xff).toInt)
    val data = body.toByteArray
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Media.Image = {
    require(bytes.length >= 13, "not a GIF: too short")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: signature '$sig'")
    val screenW = u16(bytes, 6)
    val screenH = u16(bytes, 8)
    require(screenW > 0 && screenH > 0, s"GIF: bad screen ${screenW}x$screenH")
    require(screenW.toLong * screenH <= Int.MaxValue / 3,
      s"GIF dimensions ${screenW}x$screenH exceed the decodable pixel budget")
    val packed = bytes(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 3 * (2 << (packed & 7))
      require(pos + n <= bytes.length, "GIF: truncated global color table")
      gct = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
    }

    def skipSubBlocks(): Unit = {
      require(pos < bytes.length, "GIF: truncated at sub-block length")
      var n = bytes(pos) & 0xff
      pos += 1
      while (n != 0) {
        require(pos + n < bytes.length, "GIF: truncated sub-blocks")
        pos += n
        n = bytes(pos) & 0xff
        pos += 1
      }
    }

    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks (all skipped)
          require(pos + 2 <= bytes.length, "GIF: truncated extension")
          pos += 2
          skipSubBlocks()
        case 0x2c => // image descriptor — decode and return the first frame
          require(pos + 10 <= bytes.length, "GIF: truncated image descriptor")
          val left = u16(bytes, pos + 1); val top = u16(bytes, pos + 3)
          val w = u16(bytes, pos + 5); val h = u16(bytes, pos + 7)
          val ip = bytes(pos + 9) & 0xff
          pos += 10
          require(w > 0 && h > 0 && left + w <= screenW && top + h <= screenH,
            s"GIF: frame ${w}x$h at ($left,$top) outside ${screenW}x$screenH")
          val interlaced = (ip & 0x40) != 0
          var ct = gct
          if ((ip & 0x80) != 0) {
            val n = 3 * (2 << (ip & 7))
            require(pos + n <= bytes.length, "GIF: truncated local color table")
            ct = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
            pos += n
          }
          require(ct != null, "GIF: image with no color table")
          require(pos < bytes.length, "GIF: truncated before LZW data")
          val minCode = bytes(pos) & 0xff
          pos += 1
          val data = new java.io.ByteArrayOutputStream()
          require(pos < bytes.length, "GIF: truncated at first image sub-block")
          var n = bytes(pos) & 0xff
          pos += 1
          while (n != 0) {
            require(pos + n < bytes.length, "GIF: truncated image data")
            data.write(bytes, pos, n)
            pos += n
            n = bytes(pos) & 0xff
            pos += 1
          }
          val idx = lzw(data.toByteArray, minCode, w * h)
          // de-interlace: GIF's four passes are ROW interleaves
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(h)(identity)
            else {
              val order = new Array[Int](h)
              var r = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- start until h by step) {
                order(r) = y; r += 1
              }
              order
            }
          val rgb = new Array[Byte](w * h * 3)
          var srcRow = 0
          while (srcRow < h) {
            val y = rowOrder(srcRow)
            var x = 0
            while (x < w) {
              val ci = (idx(srcRow * w + x) & 0xff) * 3
              require(ci + 2 < ct.length, s"GIF: color index out of table at ($x,$y)")
              val d = (y * w + x) * 3
              rgb(d) = ct(ci); rgb(d + 1) = ct(ci + 1); rgb(d + 2) = ct(ci + 2)
              x += 1
            }
            srcRow += 1
          }
          return Media.Image(w, h, rgb)
        case 0x3b =>
          throw new IllegalArgumentException("GIF: trailer before any image frame")
        case other =>
          throw new IllegalArgumentException(f"GIF: unknown block 0x$other%02X at $pos")
      }
    }
    throw new IllegalArgumentException("GIF: no image frame found")
  }
}
