package graft.formats

import java.util.zip.{CRC32, Deflater, Inflater}

/** From-scratch PNG codec (RFC 2083 / ISO 15948, the public spec) — the
  * second-most-common training-image format, and the LOSSLESS one: the
  * ImageIO referee comparisons are pixel-exact, no tolerance bands.
  *
  * Envelope:
  *  - decode: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette,
  *    8-bit indices), 4 (gray+alpha), 6 (RGBA); all five scanline
  *    filters (None/Sub/Up/Average/Paeth); ADAM7 interlacing (seven
  *    independently-filtered passes scattered onto the raster); multiple
  *    IDAT chunks; chunk CRCs VERIFIED (a corrupt chunk refuses, never
  *    mis-decodes); alpha is dropped (the raster is the RGB surface
  *    [[Media.Image]] shares with BMP/JPEG); 16-bit samples reduce to
  *    their high byte. Sub-byte depths refuse loudly.
  *  - encode: color type 2 (RGB), one filter per row cycling
  *    None/Sub/Up (so decoders — ours and the referee — must really
  *    defilter), zlib-wrapped deflate per the spec.
  *
  * zlib streams ride the JDK's Deflater/Inflater exactly like the Avro
  * codec's raw-deflate blocks (nowrap = false here: PNG wants the RFC
  * 1950 wrapper + adler32).
  */
object Png {
  private val Magic = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def zlibInflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater(false)
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(!inf.needsDictionary(), "PNG: preset-dictionary zlib stream")
        require(n > 0 || inf.finished() || !inf.needsInput(),
          "PNG: truncated zlib stream")
        out.write(buf, 0, n)
      }
    } finally inf.end()
    out.toByteArray
  }

  private def zlibDeflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, false)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    } finally d.end()
    out.toByteArray
  }

  /** Paeth predictor (RFC 2083 §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  def decode(bytes: Array[Byte]): Media.Image = {
    require(bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == Magic(i)),
      "not a PNG: missing signature")
    var pos = 8
    var width = 0; var height = 0
    var depth = 0; var colorType = -1
    var interlaced = false
    var palette: Array[Byte] = null
    var ihdrSeen = false; var iendSeen = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!iendSeen) {
      require(pos + 12 <= bytes.length, "PNG: truncated chunk header")
      val len = be32(bytes, pos)
      require(len >= 0 && pos.toLong + 12 + len <= bytes.length.toLong,
        s"PNG: truncated chunk at $pos (len $len)")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == be32(bytes, pos + 8 + len),
        s"PNG: CRC mismatch on chunk '$typ'")
      typ match {
        case "IHDR" =>
          require(len == 13, s"PNG: IHDR length $len")
          width = be32(bytes, pos + 8)
          height = be32(bytes, pos + 12)
          depth = bytes(pos + 16) & 0xff
          colorType = bytes(pos + 17) & 0xff
          val compression = bytes(pos + 18) & 0xff
          val filterMethod = bytes(pos + 19) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(width > 0 && height > 0, s"PNG: bad dimensions ${width}x$height")
          require(width.toLong * height <= Int.MaxValue / 4,
            s"PNG dimensions ${width}x$height exceed the decodable pixel budget")
          require(depth == 8 || depth == 16,
            s"PNG: unsupported bit depth $depth (8/16 only)")
          require(Set(0, 2, 3, 4, 6).contains(colorType),
            s"PNG: unsupported color type $colorType")
          require(depth == 8 || colorType != 3, "PNG: 16-bit palette is not a legal combination")
          require(compression == 0 && filterMethod == 0,
            "PNG: unknown compression/filter method")
          require(interlace <= 1, s"PNG: unknown interlace method $interlace")
          interlaced = interlace == 1
          ihdrSeen = true
        case "PLTE" =>
          require(len % 3 == 0 && len <= 256 * 3, s"PNG: bad PLTE length $len")
          palette = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case "IDAT" =>
          require(ihdrSeen, "PNG: IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" => iendSeen = true
        case _ => () // ancillary chunks (tEXt, gAMA, tRNS alpha is DROPPED with the channel, …)
      }
      pos += 12 + len
    }
    require(ihdrSeen, "PNG: missing IHDR")
    if (colorType == 3) require(palette != null, "PNG: palette image without PLTE")
    val channels = colorType match {
      case 0 | 3 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
    }
    val raw = zlibInflate(idat.toByteArray)
    // the filter unit is the PIXEL in bytes: 16-bit samples filter over
    // 2-byte units (RFC 2083 §6.2's bpp definition)
    val bpp = channels * (depth / 8)
    val stride = width * bpp

    // defilter one filtered sub-image of `w`x`h` pixels starting at
    // `off` in the inflated stream; returns (pixels, bytes consumed)
    def defilter(off: Int, w: Int, h: Int): (Array[Byte], Int) = {
      val st = w * bpp
      require(raw.length - off >= (st + 1) * h,
        s"PNG: decompressed stream too short (need ${(st + 1) * h} at $off, have ${raw.length - off})")
      val img = new Array[Byte](st * h)
      var y = 0
      while (y < h) {
        val filter = raw(off + y * (st + 1)) & 0xff
        val rowIn = off + y * (st + 1) + 1
        val rowOut = y * st
        var x = 0
        while (x < st) {
          val cur = raw(rowIn + x) & 0xff
          val a = if (x >= bpp) img(rowOut + x - bpp) & 0xff else 0
          val b = if (y > 0) img(rowOut - st + x) & 0xff else 0
          val c = if (y > 0 && x >= bpp) img(rowOut - st + x - bpp) & 0xff else 0
          val v = filter match {
            case 0 => cur
            case 1 => cur + a
            case 2 => cur + b
            case 3 => cur + (a + b) / 2
            case 4 => cur + paeth(a, b, c)
            case f => throw new IllegalArgumentException(s"PNG: bad filter $f on row $y")
          }
          img(rowOut + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      (img, (st + 1) * h)
    }

    val img: Array[Byte] =
      if (!interlaced) {
        val (full, used) = defilter(0, width, height)
        require(used == raw.length, s"PNG: ${raw.length - used} trailing bytes after image data")
        full
      } else {
        // Adam7 (RFC 2083 §2.6): seven sub-images, each independently
        // filtered, scattered onto the full raster by the pass grids
        val starts = Array((0, 0), (4, 0), (0, 4), (2, 0), (0, 2), (1, 0), (0, 1))
        val steps = Array((8, 8), (8, 8), (4, 8), (4, 4), (2, 4), (2, 2), (1, 2))
        val full = new Array[Byte](stride * height)
        var off = 0
        var p = 0
        while (p < 7) {
          val (x0, y0) = starts(p); val (dx, dy) = steps(p)
          val wp = (width - x0 + dx - 1) / dx
          val hp = (height - y0 + dy - 1) / dy
          if (wp > 0 && hp > 0) {
            val (sub, used) = defilter(off, wp, hp)
            off += used
            var sy = 0
            while (sy < hp) {
              var sx = 0
              while (sx < wp) {
                var ch = 0
                while (ch < bpp) {
                  full(((y0 + sy * dy) * width + x0 + sx * dx) * bpp + ch) =
                    sub((sy * wp + sx) * bpp + ch)
                  ch += 1
                }
                sx += 1
              }
              sy += 1
            }
          }
          p += 1
        }
        require(off == raw.length, s"PNG: ${raw.length - off} trailing bytes after Adam7 passes")
        full
      }
    // 16-bit samples reduce to their HIGH byte (the 8-bit projection
    // training pipelines take; lower byte is sub-quantization detail)
    val img8: Array[Byte] =
      if (depth == 8) img
      else {
        val out = new Array[Byte](width * height * channels)
        var i = 0
        while (i < out.length) { out(i) = img(i * 2); i += 1 }
        out
      }
    // expand to the shared RGB surface
    val rgb = new Array[Byte](width * height * 3)
    var i = 0
    val n = width * height
    while (i < n) {
      colorType match {
        case 0 | 4 =>
          val g = img8(i * channels)
          rgb(i * 3) = g; rgb(i * 3 + 1) = g; rgb(i * 3 + 2) = g
        case 2 | 6 =>
          rgb(i * 3) = img8(i * channels)
          rgb(i * 3 + 1) = img8(i * channels + 1)
          rgb(i * 3 + 2) = img8(i * channels + 2)
        case 3 =>
          val idx = (img8(i) & 0xff) * 3
          require(idx + 2 < palette.length, s"PNG: palette index out of range at pixel $i")
          rgb(i * 3) = palette(idx)
          rgb(i * 3 + 1) = palette(idx + 1)
          rgb(i * 3 + 2) = palette(idx + 2)
      }
      i += 1
    }
    Media.Image(width, height, rgb)
  }

  /** Encode top-down RGB as an 8-bit color-type-2 PNG; rows cycle
    * None/Sub/Up filters so the round trip exercises real defiltering.
    */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(rgb.length == width * height * 3,
      s"pixel buffer ${rgb.length} != $width x $height x 3")
    val stride = width * 3
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val filter = if (y == 0) 0 else if (y % 2 == 1) 1 else 2
      raw(y * (stride + 1)) = filter.toByte
      var x = 0
      while (x < stride) {
        val cur = rgb(y * stride + x) & 0xff
        val v = filter match {
          case 0 => cur
          case 1 => cur - (if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0)
          case 2 => cur - (rgb((y - 1) * stride + x) & 0xff)
        }
        raw(y * (stride + 1) + 1 + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def w32(v: Int): Unit = {
        out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
        out.write((v >> 8) & 0xff); out.write(v & 0xff)
      }
      w32(data.length)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      w32(crc.getValue.toInt)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >> 24).toByte; ihdr(1) = (width >> 16).toByte
    ihdr(2) = (width >> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >> 24).toByte; ihdr(5) = (height >> 16).toByte
    ihdr(6) = (height >> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8; ihdr(9) = 2 // depth 8, color type 2 (RGB)
    chunk("IHDR", ihdr)
    chunk("IDAT", zlibDeflate(raw))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
