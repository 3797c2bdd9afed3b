package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.formats.Media
import graft.sources.Tables

/** Multimodal-column operators (SURVEY §2.6): opaque binary payloads with
  * a typed metadata struct, decoded and feature-extracted in
  * per-partition batches.
  *
  * The codecs are REAL from-scratch parsers ([[graft.formats.Media]]):
  * BMP (24-bpp BI_RGB, padded bottom-up rows) for images and RIFF/WAV
  * (16-bit PCM) for audio — no libraries involved. The gates fabricate
  * genuine containers deterministically from document text (gray pixel /
  * PCM sample per character), so the decoded pixel and sample arithmetic
  * is reproducible by the DuckDB oracle from the text alone, while the
  * Spark side exercises the full encode → binary column → partition-batch
  * decode → feature path. MediaFormatsSpec cross-validates the codecs
  * against the JDK's ImageIO / javax.sound referees byte-for-byte.
  *
  * Scale shape: one decoder pass per row inside `mapPartitions` (codec
  * state amortized per batch), features are fixed-width vectors — no
  * shuffle until the final presentation sort.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String, width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int, feature: Array[Double], feature_norm: Double)

  /** Image width used by the text→BMP fabrication: each document becomes
    * a 25-pixel-wide grayscale image, one pixel per character, truncated
    * to whole rows (25·⌊n/25⌋ chars). 25·3 = 75 bytes/row pads to a
    * 76-byte stride, so the BMP row-padding path is exercised on every
    * document.
    */
  private val ImgW = 25

  /** Rebin a histogram to `n` coarser bins (real image-resize arithmetic
    * on the feature axis: mass-preserving aggregation).
    */
  private[operators] def rebin(feature: Array[Double], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    var i = 0
    while (i < feature.length) { out(i * n / feature.length) += feature(i); i += 1 }
    out
  }

  /** Every `stride`-th element — frame sampling over a decoded stream. */
  private[operators] def frameSample(payload: Array[Byte], stride: Int): Array[Byte] =
    payload.indices.collect { case i if i % stride == 0 => payload(i) }.toArray

  /** Text → real 24-bpp BMP: one gray pixel per character (r=g=b=code),
    * width [[ImgW]], whole rows only.
    */
  private def textToBmp(text: String): (Array[Byte], Int) = {
    val h = text.length / ImgW
    val rgb = new Array[Byte](ImgW * h * 3)
    var i = 0
    while (i < ImgW * h) {
      val c = text.charAt(i).toByte
      rgb(i * 3) = c; rgb(i * 3 + 1) = c; rgb(i * 3 + 2) = c
      i += 1
    }
    (Media.Bmp.encode(ImgW, h, rgb), h)
  }

  /** Red channel of a decoded image, row-major top-down — for the
    * grayscale fabrication this is exactly the retained character codes.
    */
  private def redChannel(img: Media.Image): Array[Byte] = {
    val out = new Array[Byte](img.width * img.height)
    var i = 0
    while (i < out.length) { out(i) = img.pixels(i * 3); i += 1 }
    out
  }

  /** m01: binary payload + metadata → per-partition batch decode →
    * feature rows. Payloads are REAL BMP containers fabricated from the
    * document text; the decode is the from-scratch BMP parser, and the
    * oracle pins the container size (54-byte headers + 76-byte padded
    * rows) and the normalization invariant of the histogram features.
    */
  def m01MultimodalPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val (bmp, h) = textToBmp(text)
        MediaRow(id, bmp, "image/bmp", ImgW, h)
      }

    // Batch shape: one decoder context per partition (a real codec would
    // init native state here once, then stream rows through it).
    val feats = media.mapPartitions { rows =>
      rows.map { r =>
        val gray = redChannel(Media.Bmp.decode(r.payload))
        val sampled = frameSample(gray, stride = 2)
        val bins = new Array[Double](16)
        var i = 0
        while (i < sampled.length) { bins((sampled(i) & 0xff) >> 4) += 1.0; i += 1 }
        if (sampled.length > 0) {
          var b = 0; while (b < 16) { bins(b) /= sampled.length; b += 1 }
        }
        val f = rebin(bins, 8)
        MediaFeatures(r.doc_id, r.format, r.payload.length, f,
          math.sqrt(f.map(x => x * x).sum))
      }
    }
    // feature_ok: decoded-pixel histograms normalize to sum 1 and rebin
    // preserves mass, so a correctly-decoded non-empty image yields sum≈1
    // — an oracle-checkable invariant of the decode+feature path (exact
    // pixel values are pinned in m02 and MediaFormatsSpec)
    feats.toDF()
      .withColumn("feature_ok",
        col("n_bytes") === 54 || abs(aggregate(col("feature"), lit(0.0), _ + _) - 1.0) < 1e-9)
      .select(col("doc_id"), col("format"), col("n_bytes"), col("feature_ok"))
      .orderBy(col("doc_id"))
  }

  /** BMP container arithmetic: 14+40 header bytes plus ⌊n/25⌋ rows of
    * 76-byte stride (75 pixel bytes padded to 4-byte alignment).
    */
  val m01Oracle: String =
    """SELECT doc_id, 'image/bmp' AS format,
      |  CAST(54 + (strlen(text) // 25) * 76 AS INT) AS n_bytes,
      |  TRUE AS feature_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  case class FrameFeatures(doc_id: Long, n_frames: Int, f0: Double, f1: Double, f2: Double, f3: Double)

  /** m02: REAL pixel arithmetic, VALUE-checked end to end — the payload
    * is a genuine BMP, the decode walks headers, strides, padding and
    * bottom-up rows, and the recovered gray values are exactly the
    * retained character codes, so the oracle recomputes every feature
    * from the text: every 4th pixel → 16-bin histogram → rebin to 4 →
    * one double division per bin (bit-exact on both engines).
    */
  def m02FrameFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val (bmp, h) = textToBmp(text)
        MediaRow(id, bmp, "image/bmp", ImgW, h)
      }
    media.mapPartitions { rows =>
      rows.map { r =>
        val gray = redChannel(Media.Bmp.decode(r.payload))
        val frames = frameSample(gray, stride = 4)
        val counts = new Array[Double](16)
        var i = 0
        while (i < frames.length) { counts((frames(i) & 0xff) >> 4) += 1.0; i += 1 }
        val binned = rebin(counts, 4)
        val n = frames.length
        def norm(b: Int): Double = if (n == 0) 0.0 else binned(b) / n
        FrameFeatures(r.doc_id, n, norm(0), norm(1), norm(2), norm(3))
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Retained pixels = first 25·⌊n/25⌋ code points (ASCII corpus: bytes
    * == code points); every-4th of those, 4-bin histogram by code//64
    * (== rebin of the 16-bin code//16 histogram).
    */
  val m02Oracle: String =
    """WITH fr AS (
      |  SELECT doc_id,
      |    [unicode(c) for c in
      |      list_filter(regexp_split_to_array(text, ''), (c, i) ->
      |        i <= 25 * (strlen(text) // 25) AND (i - 1) % 4 = 0)] AS f
      |  FROM documents)
      |SELECT doc_id, CAST(len(f) AS INT) AS n_frames,
      |  len(list_filter(f, x -> x // 64 = 0)) / CAST(len(f) AS DOUBLE) AS f0,
      |  len(list_filter(f, x -> x // 64 = 1)) / CAST(len(f) AS DOUBLE) AS f1,
      |  len(list_filter(f, x -> x // 64 = 2)) / CAST(len(f) AS DOUBLE) AS f2,
      |  len(list_filter(f, x -> x // 64 = 3)) / CAST(len(f) AS DOUBLE) AS f3
      |FROM fr ORDER BY doc_id""".stripMargin

  case class AudioSegments(doc_id: Long, n_windows: Int, n_voiced: Int,
      longest_run: Int, total_energy: Long)

  /** Deterministic text→PCM fabrication shared by m03/m12: one sample per
    * CODE POINT (not UTF-16 unit — DuckDB's regexp_split_to_array +
    * unicode() iterate code points, so astral-plane text must yield the
    * same frame count on both sides), centered at cp−32 and clamped to
    * the 16-bit WAV sample range so high code points survive the encode/
    * decode round trip with the value the oracle computes.
    */
  private[operators] def fabricateSamples(text: String): Array[Int] = {
    val cps = text.codePoints().toArray
    val samples = new Array[Int](cps.length)
    var i = 0
    while (i < samples.length) {
      samples(i) = math.min(32767, math.max(-32768, cps(i) - 32)); i += 1
    }
    samples
  }

  /** m03: AUDIO voice-activity segmentation over REAL WAV containers —
    * each document becomes 16-bit mono PCM (sample per character,
    * centered at code−32), the from-scratch RIFF parser recovers the
    * samples, then window → per-window energy → threshold → contiguous
    * voiced segments, all in integer math so the oracle recomputes every
    * value exactly, including the run-length logic (longest voiced
    * segment) real segmenters hang everything on.
    */
  def m03AudioSegments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val threshold = 120000L
    val media: Dataset[MediaRow] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        MediaRow(id, Media.Wav.encode(8000, fabricateSamples(text)),
          "audio/wav", 0, 0)
      }
    media.mapPartitions { rows =>
      rows.map { r =>
        val audio = Media.Wav.decode(r.payload)
        val s = audio.samples
        val nw = s.length / 25
        var run = 0; var best = 0; var voiced = 0; var total = 0L
        var w = 0
        while (w < nw) {
          var e = 0L
          var i = w * 25; val end = i + 25
          while (i < end) { e += s(i).toLong * s(i); i += 1 }
          total += e
          if (e > threshold) { voiced += 1; run += 1; if (run > best) best = run }
          else run = 0
          w += 1
        }
        AudioSegments(r.doc_id, nw, voiced, best, total)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Islands (gaps-and-islands on window index) recompute the longest
    * voiced run; all arithmetic integer → exact.
    */
  val m03Oracle: String =
    """WITH cp AS (
      |  SELECT doc_id, [unicode(c) for c in regexp_split_to_array(text, '')] AS cs
      |  FROM documents
      |), w AS (
      |  SELECT doc_id, i.i AS widx,
      |    list_sum([ least(x-32,32767)*least(x-32,32767)
      |               for x in cs[i.i*25+1 : i.i*25+25] ]) AS energy
      |  FROM cp, LATERAL (SELECT UNNEST(generate_series(0,
      |    CAST(FLOOR(len(cs)/25.0) AS INT)-1)) AS i) i
      |), v AS (
      |  SELECT doc_id, widx, energy, energy > 120000 AS voiced FROM w
      |), isl AS (
      |  SELECT doc_id, voiced,
      |    widx - ROW_NUMBER() OVER (PARTITION BY doc_id, voiced ORDER BY widx) AS grp
      |  FROM v
      |), runs AS (
      |  SELECT doc_id, COUNT(*) AS run_len FROM isl WHERE voiced
      |  GROUP BY doc_id, grp
      |)
      |SELECT d.doc_id,
      |  CAST(COALESCE(s.n_windows, 0) AS INT) AS n_windows,
      |  CAST(COALESCE(s.n_voiced, 0) AS INT) AS n_voiced,
      |  CAST(COALESCE(r.longest, 0) AS INT) AS longest_run,
      |  CAST(COALESCE(s.total_energy, 0) AS BIGINT) AS total_energy
      |FROM documents d
      |LEFT JOIN (
      |  SELECT doc_id, COUNT(*) AS n_windows,
      |    COUNT(*) FILTER (WHERE voiced) AS n_voiced,
      |    SUM(energy) AS total_energy
      |  FROM v GROUP BY doc_id) s ON d.doc_id = s.doc_id
      |LEFT JOIN (
      |  SELECT doc_id, MAX(run_len) AS longest FROM runs GROUP BY doc_id) r
      |  ON d.doc_id = r.doc_id
      |ORDER BY d.doc_id""".stripMargin

  case class JpegBlocks(doc_id: Long, n_blocks: Int, sum_levels: Long, pos_checksum: Long)

  /** m04: COMPRESSED images — a full baseline-JPEG round trip
    * (entropy coding, Huffman tables, quantization, FDCT/IDCT, marker
    * structure) through the from-scratch [[graft.formats.Jpeg]] codec,
    * VALUE-checked end to end. Each document fabricates a grayscale
    * JPEG of 8x8-constant blocks whose levels are EVEN character codes
    * at quality 50: a DC-only block with 8·(g−128) divisible by q00=16
    * survives quantization exactly (JpegSpec pins the property and
    * referees both directions against ImageIO), so every decoded block
    * mean equals its source level and the DuckDB oracle recomputes the
    * features from the text alone — lossy-codec plumbing with a
    * lossless oracle. Same batch-decode scale shape as m01.
    */
  def m04JpegBlocks(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.formats.Jpeg
    val media: Dataset[MediaRow] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val nb = text.length / 25
        if (nb == 0) MediaRow(id, Array.empty[Byte], "image/jpeg", 0, 0)
        else {
          val w = 8 * nb; val h = 8
          val rgb = new Array[Byte](w * h * 3)
          var b = 0
          while (b < nb) {
            val g = (2 * text.charAt(b * 25)).toByte // even level 64..252
            var y = 0
            while (y < h) {
              var x = 0
              while (x < 8) {
                val i = (y * w + b * 8 + x) * 3
                rgb(i) = g; rgb(i + 1) = g; rgb(i + 2) = g
                x += 1
              }
              y += 1
            }
            b += 1
          }
          MediaRow(id, Jpeg.encode(w, h, rgb, quality = 50, grayscale = true),
            "image/jpeg", w, h)
        }
      }
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.payload.isEmpty) JpegBlocks(r.doc_id, 0, 0L, 0L)
        else {
          val img = Jpeg.decode(r.payload)
          val nb = img.width / 8
          // features from DECODED pixels only — a wrong coefficient,
          // Huffman code, or IDCT would shift a block mean and break the
          // text-derived oracle
          var sum = 0L; var chk = 0L
          var b = 0
          while (b < nb) {
            var s = 0L
            var y = 0
            while (y < img.height) {
              var x = 0
              while (x < 8) { s += img.red(b * 8 + x, y); x += 1 }
              y += 1
            }
            val mean = s / 64
            sum += mean; chk += (b + 1).toLong * mean
            b += 1
          }
          JpegBlocks(r.doc_id, nb, sum, chk)
        }
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Block b's level is 2·unicode(text[b·25+1]); decoded means equal the
    * levels exactly (q50 DC-only exactness), so sums replay from text.
    */
  val m04Oracle: String =
    """WITH b AS (
      |  SELECT doc_id, strlen(text) // 25 AS nb,
      |    [2 * unicode(text[i * 25 + 1]) for i in range(strlen(text) // 25)] AS lv
      |  FROM documents)
      |SELECT doc_id, CAST(nb AS INT) AS n_blocks,
      |  CAST(COALESCE(list_sum(lv), 0) AS BIGINT) AS sum_levels,
      |  CAST(COALESCE(list_sum([ (i + 1) * lv[i + 1] for i in range(len(lv))]), 0) AS BIGINT)
      |    AS pos_checksum
      |FROM b ORDER BY doc_id""".stripMargin

  case class CompandedAudio(doc_id: Long, n_samples: Int, sum_samples: Long, pos_checksum: Long)

  /** m05: COMPRESSED audio — G.711 μ-law companded WAV (format tag 7)
    * through the from-scratch expand/compand tables
    * (CompandedWavSpec pins all 256 codewords against the JDK's own
    * ULAW codec). Every sample is chosen μ-law-REPRESENTABLE — character
    * code c maps to the codeword (e = c/16, m = c%16), whose expanded
    * value ((m·8+132)·2^e − 132) survives the lossy compander exactly —
    * so decoded sums replay from the text, same lossless-oracle-over-
    * lossy-format construction as m04. Batch decode shape as m03.
    */
  def m05MulawAudio(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val samples = new Array[Int](text.length)
        var i = 0
        while (i < samples.length) {
          val c = text.charAt(i).toInt
          samples(i) = (((c % 16) * 8 + 132) << (c / 16)) - 132
          i += 1
        }
        MediaRow(id, Media.Wav.encodeCompanded(8000, samples, mulaw = true),
          "audio/basic", 0, 0)
      }
    media.mapPartitions { rows =>
      rows.map { r =>
        val audio = Media.Wav.decode(r.payload)
        val s = audio.samples
        var sum = 0L; var chk = 0L
        var i = 0
        while (i < s.length) {
          sum += s(i); chk += (i + 1).toLong * s(i)
          i += 1
        }
        CompandedAudio(r.doc_id, s.length, sum, chk)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Sample i is the expanded codeword of code cs[i]: exact integer
    * arithmetic both engines.
    */
  val m05Oracle: String =
    """WITH cp AS (
      |  SELECT doc_id, [unicode(ch) for ch in regexp_split_to_array(text, '')] AS cs
      |  FROM documents)
      |SELECT doc_id, CAST(len(cs) AS INT) AS n_samples,
      |  CAST(COALESCE(list_sum(
      |    [((x % 16) * 8 + 132) * (1 << (x // 16)) - 132 for x in cs]), 0) AS BIGINT)
      |    AS sum_samples,
      |  CAST(COALESCE(list_sum(
      |    [i * (((cs[i] % 16) * 8 + 132) * (1 << (cs[i] // 16)) - 132)
      |     for i in range(1, len(cs) + 1)]), 0) AS BIGINT) AS pos_checksum
      |FROM cp ORDER BY doc_id""".stripMargin

  case class VideoFrames(doc_id: Long, n_frames: Int, sum_levels: Long,
      sampled_sum: Long, pos_checksum: Long)

  /** m06: VIDEO — MJPEG-in-AVI containers ([[graft.formats.Media.Avi]]:
    * RIFF hdrl/movi walk) with per-frame JPEG decode and FRAME SAMPLING
    * (every 2nd frame — the keyframe-subsample pattern video pipelines
    * feature-extract with). Each document fabricates one 8x8
    * constant-gray frame per 60 characters at quality 50 (the m04
    * exactness envelope), so every decoded frame mean equals its source
    * level and the DuckDB oracle replays frame sums, the sampled-subset
    * sum, and a positional checksum from the text. Per-frame decode is
    * lazy inside mapPartitions — the batch shape scales to long videos
    * (only sampled frames would pay decode in a real pipeline).
    */
  def m06VideoFrames(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.formats.Jpeg
    val media: Dataset[MediaRow] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val nf = text.length / 60
        if (nf == 0) MediaRow(id, Array.empty[Byte], "video/x-msvideo", 0, 0)
        else {
          val frames = (0 until nf).map { f =>
            val g = (2 * text.charAt(f * 60)).toByte
            Jpeg.encode(8, 8, Array.fill(8 * 8 * 3)(g), quality = 50, grayscale = true)
          }
          MediaRow(id, Media.Avi.encode(8, 8, 40000, frames), "video/x-msvideo", 8, 8)
        }
      }
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.payload.isEmpty) VideoFrames(r.doc_id, 0, 0L, 0L, 0L)
        else {
          val v = Media.Avi.decode(r.payload)
          var sum = 0L; var sampled = 0L; var chk = 0L
          var f = 0
          while (f < v.numFrames) {
            val img = v.frame(f)
            var s = 0L
            var p = 0
            while (p < 64) { s += img.pixels(p * 3) & 0xff; p += 1 }
            val mean = s / 64
            sum += mean; chk += (f + 1).toLong * mean
            if (f % 2 == 0) sampled += mean
            f += 1
          }
          VideoFrames(r.doc_id, v.numFrames, sum, sampled, chk)
        }
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Frame f's level is 2·unicode(text[f·60+1]); decoded means replay
    * exactly (q50 constant-block envelope).
    */
  val m06Oracle: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    [2 * unicode(text[f * 60 + 1]) for f in range(strlen(text) // 60)] AS lv
      |  FROM documents)
      |SELECT doc_id, CAST(len(lv) AS INT) AS n_frames,
      |  CAST(COALESCE(list_sum(lv), 0) AS BIGINT) AS sum_levels,
      |  CAST(COALESCE(list_sum([lv[i + 1] for i in range(len(lv)) if i % 2 = 0]), 0)
      |    AS BIGINT) AS sampled_sum,
      |  CAST(COALESCE(list_sum([(i + 1) * lv[i + 1] for i in range(len(lv))]), 0)
      |    AS BIGINT) AS pos_checksum
      |FROM b ORDER BY doc_id""".stripMargin

  case class PngPixels(doc_id: Long, n_pixels: Int, sum_r: Long, sum_g: Long,
      sum_b: Long, pos_checksum: Long)

  /** m07: LOSSLESS compressed images — PNG ([[graft.formats.Png]]: zlib
    * IDAT, scanline filters, CRC-verified chunks). Because the codec is
    * lossless, the gate needs NO exactness construction: arbitrary
    * text-derived RGB pixels (three channel mixes per character) survive
    * encode→decode byte-for-byte and every channel sum replays from the
    * text in DuckDB. The encoder cycles None/Sub/Up filters, so the
    * distributed decode really defilters. Batch shape as m01.
    */
  def m07PngPixels(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.formats.Png
    val media: Dataset[MediaRow] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val h = text.length / ImgW
        if (h == 0) MediaRow(id, Array.empty[Byte], "image/png", 0, 0)
        else {
          val rgb = new Array[Byte](ImgW * h * 3)
          var i = 0
          while (i < ImgW * h) {
            val c = text.charAt(i).toInt
            rgb(i * 3) = c.toByte
            rgb(i * 3 + 1) = ((c * 3) % 256).toByte
            rgb(i * 3 + 2) = ((c * 7) % 256).toByte
            i += 1
          }
          MediaRow(id, Png.encode(ImgW, h, rgb), "image/png", ImgW, h)
        }
      }
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.payload.isEmpty) PngPixels(r.doc_id, 0, 0L, 0L, 0L, 0L)
        else {
          val img = Png.decode(r.payload)
          val n = img.width * img.height
          var sr = 0L; var sg = 0L; var sb = 0L; var chk = 0L
          var i = 0
          while (i < n) {
            val red = img.pixels(i * 3) & 0xff
            sr += red
            sg += img.pixels(i * 3 + 1) & 0xff
            sb += img.pixels(i * 3 + 2) & 0xff
            chk += (i + 1).toLong * red
            i += 1
          }
          PngPixels(r.doc_id, n, sr, sg, sb, chk)
        }
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Pixel i is (c, 3c mod 256, 7c mod 256) of the i-th retained
    * character — lossless codec, exact replay.
    */
  val m07Oracle: String =
    """WITH cp AS (
      |  SELECT doc_id,
      |    [unicode(ch) for ch in
      |      list_filter(regexp_split_to_array(text, ''), (ch, i) ->
      |        i <= 25 * (strlen(text) // 25))] AS cs
      |  FROM documents)
      |SELECT doc_id, CAST(len(cs) AS INT) AS n_pixels,
      |  CAST(COALESCE(list_sum(cs), 0) AS BIGINT) AS sum_r,
      |  CAST(COALESCE(list_sum([(x * 3) % 256 for x in cs]), 0) AS BIGINT) AS sum_g,
      |  CAST(COALESCE(list_sum([(x * 7) % 256 for x in cs]), 0) AS BIGINT) AS sum_b,
      |  CAST(COALESCE(list_sum([i * cs[i] for i in range(1, len(cs) + 1)]), 0)
      |    AS BIGINT) AS pos_checksum
      |FROM cp ORDER BY doc_id""".stripMargin

  case class GifPixels(doc_id: Long, n_pixels: Int, sum_gray: Long, pos_checksum: Long)

  /** m08: LZW-compressed images — GIF ([[graft.formats.Gif]]: variable-
    * width LZW, sub-block reassembly, color tables). Grayscale palette =
    * identity, indices = character codes, so the lossless round trip
    * replays exactly from text (the m07 construction over a DIFFERENT
    * compression family — dictionary coding vs deflate). Batch shape as
    * m01; decode features come from DECODED pixels only.
    */
  def m08GifPixels(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.formats.Gif
    val media: Dataset[MediaRow] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val h = text.length / ImgW
        if (h == 0) MediaRow(id, Array.empty[Byte], "image/gif", 0, 0)
        else {
          val idx = new Array[Byte](ImgW * h)
          var i = 0
          while (i < idx.length) { idx(i) = text.charAt(i).toByte; i += 1 }
          MediaRow(id, Gif.encodeGray(ImgW, h, idx), "image/gif", ImgW, h)
        }
      }
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.payload.isEmpty) GifPixels(r.doc_id, 0, 0L, 0L)
        else {
          val img = Gif.decode(r.payload)
          val n = img.width * img.height
          var sum = 0L; var chk = 0L
          var i = 0
          while (i < n) {
            val g = img.pixels(i * 3) & 0xff
            sum += g; chk += (i + 1).toLong * g
            i += 1
          }
          GifPixels(r.doc_id, n, sum, chk)
        }
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Pixel i is the i-th retained character code (identity palette). */
  val m08Oracle: String =
    """WITH cp AS (
      |  SELECT doc_id,
      |    [unicode(ch) for ch in
      |      list_filter(regexp_split_to_array(text, ''), (ch, i) ->
      |        i <= 25 * (strlen(text) // 25))] AS cs
      |  FROM documents)
      |SELECT doc_id, CAST(len(cs) AS INT) AS n_pixels,
      |  CAST(COALESCE(list_sum(cs), 0) AS BIGINT) AS sum_gray,
      |  CAST(COALESCE(list_sum([i * cs[i] for i in range(1, len(cs) + 1)]), 0)
      |    AS BIGINT) AS pos_checksum
      |FROM cp ORDER BY doc_id""".stripMargin

  case class IngestRow(doc_id: Long, format: String, n_units: Int, pos_checksum: Long)

  /** m09: FILE ingestion — the step every real multimodal pipeline
    * starts from: a DIRECTORY of media files read through Spark's OWN
    * `binaryFile` source (path/length/content rows, partitioned file
    * listing — the same source a 1000-executor ingest uses against
    * object storage), formats DISPATCHED by magic-byte sniffing
    * ([[Media.sniff]]), each file decoded by its own codec. The fixture
    * directory is fabricated DISTRIBUTED (each partition writes its own
    * files — the embarrassingly-parallel shape; locally a tmpdir stands
    * in for shared storage) with the format rotating by doc_id: BMP /
    * PNG / GIF carry character-code pixels, μ-law WAV carries
    * representable-codeword samples — all four lossless-or-exact, so
    * one positional checksum per file replays from the text regardless
    * of container. Docs too short for a whole image row produce no file
    * and zero-fill through a left join (the oracle agrees).
    */
  private def buildFixture(docs: DataFrame, dir: java.io.File): Unit = {
    import docs.sparkSession.implicits._
    import graft.formats.{Gif, Png}
    val written = docs.as[(Long, String)].mapPartitions { rows =>
      rows.map { case (id, text) =>
        val payload: Array[Byte] = (id % 4) match {
          case 0 =>
            val h = text.length / ImgW
            if (h == 0) null
            else {
              val rgb = new Array[Byte](ImgW * h * 3)
              var i = 0
              while (i < ImgW * h) {
                val c = text.charAt(i).toByte
                rgb(i * 3) = c; rgb(i * 3 + 1) = c; rgb(i * 3 + 2) = c
                i += 1
              }
              Media.Bmp.encode(ImgW, h, rgb)
            }
          case 1 =>
            val h = text.length / ImgW
            if (h == 0) null
            else {
              val rgb = new Array[Byte](ImgW * h * 3)
              var i = 0
              while (i < ImgW * h) {
                val c = text.charAt(i).toByte
                rgb(i * 3) = c; rgb(i * 3 + 1) = c; rgb(i * 3 + 2) = c
                i += 1
              }
              Png.encode(ImgW, h, rgb)
            }
          case 2 =>
            val h = text.length / ImgW
            if (h == 0) null
            else {
              val idx = new Array[Byte](ImgW * h)
              var i = 0
              while (i < idx.length) { idx(i) = text.charAt(i).toByte; i += 1 }
              Gif.encodeGray(ImgW, h, idx)
            }
          case _ =>
            val samples = new Array[Int](text.length)
            var i = 0
            while (i < samples.length) {
              val c = text.charAt(i).toInt
              samples(i) = (((c % 16) * 8 + 132) << (c / 16)) - 132
              i += 1
            }
            Media.Wav.encodeCompanded(8000, samples, mulaw = true)
        }
        if (payload == null) 0L
        else {
          java.nio.file.Files.write(
            new java.io.File(dir, s"doc-$id.bin").toPath, payload)
          1L
        }
      }
    }.reduce(_ + _)
    require(written > 0, "media ingest fixture produced no files")
  }

  /** Materialize the m09 loose-object fixture dir for `sfDir` (marker-
    * cached: the fixture is DETERMINISTIC per source dir — same docs →
    * same files byte for byte — so a completed build is reusable and
    * repeated gate/bench runs pay only the ingestion read, not 5000
    * rewrites). Shared by m09 (loose read) and m13 (packed read).
    */
  /** Ingest fixture dirs touched this JVM (loose + packs), for
    * family-boundary eviction in single-JVM scale runs: the sf100 loose
    * fixture is ~20 GB that nothing reads after the m-family finishes,
    * and the r20 capstone measured it pinned to JVM exit — the same
    * retained-fixture disk tax the q23/st evictions retired in r19.
    */
  private val ingestFixtureDirs = scala.collection.mutable.Set.empty[java.io.File]

  /** Build the m13 fixture chain (loose objects + packs) OUTSIDE any
    * timed gate — the q23-prewarm discipline: a fresh JVM would
    * otherwise pay the whole one-time build (1083 s at sf100, r19
    * ledger) inside m13's first timed rep. Marker-cached, so a box that
    * already holds the fixture pays only the marker check.
    */
  def prewarmIngestFixture(spark: SparkSession, sfDir: String): Unit = {
    ensurePacks(spark, sfDir); ()
  }

  /** Release every ingest fixture dir this JVM touched (recursive,
    * markers included — the marker discipline makes the next builder
    * rebuild from scratch). Called by Bench at the m-family boundary
    * under SPARK_GRAFT_EVICT_FAMILY; safe because no gate outside the
    * m-family reads these dirs.
    */
  def evictIngestFixtures(): Unit =
    ingestFixtureDirs.synchronized {
      ingestFixtureDirs.foreach(d => graft.TempDirs.deleteTree(d.toPath))
      ingestFixtureDirs.clear()
    }

  private def looseFixture(spark: SparkSession, sfDir: String): java.io.File = {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_media_ingest_${Integer.toHexString(sfDir.hashCode)}")
    ingestFixtureDirs.synchronized { ingestFixtureDirs += dir; () }
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val marker = new java.io.File(dir, "_GRAFT_FIXTURE")
    val markerWant = s"$sfDir:$nDocs:v1"
    val fresh = !(marker.exists() &&
      scala.util.Try(new String(java.nio.file.Files.readAllBytes(marker.toPath)))
        .toOption.contains(markerWant))
    if (fresh) {
      if (dir.exists()) {
        Option(dir.listFiles()).foreach(_.foreach(_.delete())); ()
      } else { dir.mkdirs(); () }
      buildFixture(docs, dir)
      java.nio.file.Files.write(marker.toPath, markerWant.getBytes); ()
    }
    dir
  }

  /** Sniff-dispatch decode + positional checksum over (doc_id, content)
    * rows — the SAME pass whether the payloads arrive as loose objects
    * (m09) or from coalesced packs (m13): pack-vs-loose is a storage
    * layout choice, invisible to decode.
    */
  private def decodeFeatures(bin: DataFrame): DataFrame = {
    import bin.sparkSession.implicits._
    import graft.formats.{Gif, Png}
    bin.as[(Long, Array[Byte])].mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val fmt = Media.sniff(bytes)
        fmt match {
          case "image/bmp" | "image/png" | "image/gif" =>
            val img =
              if (fmt == "image/bmp") Media.Bmp.decode(bytes)
              else if (fmt == "image/png") Png.decode(bytes)
              else Gif.decode(bytes)
            val n = img.width * img.height
            var chk = 0L
            var i = 0
            while (i < n) { chk += (i + 1).toLong * (img.pixels(i * 3) & 0xff); i += 1 }
            IngestRow(id, fmt, n, chk)
          case "audio/wav" =>
            val audio = Media.Wav.decode(bytes)
            var chk = 0L
            var i = 0
            while (i < audio.samples.length) {
              chk += (i + 1).toLong * audio.samples(i); i += 1
            }
            IngestRow(id, fmt, audio.samples.length, chk)
          case other =>
            throw new IllegalStateException(s"unsniffable ingest payload: $other")
        }
      }
    }.toDF()
  }

  /** Zero-fill docs whose text was too short for a whole image row (they
    * produce no file; the oracle agrees) and fix the output order.
    */
  private def zeroFilled(spark: SparkSession, sfDir: String, feats: DataFrame): DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"),
        expr("CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'image/png' " +
          "WHEN 2 THEN 'image/gif' ELSE 'audio/wav' END").as("expected_format"))
      .join(feats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("format"), col("expected_format")).as("format"),
        coalesce(col("n_units"), lit(0)).as("n_units"),
        coalesce(col("pos_checksum"), lit(0L)).as("pos_checksum"))
      .orderBy(col("doc_id"))

  def m09BinaryIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = looseFixture(spark, sfDir)
    // the REAL ingestion read: Spark's binaryFile source over the dir.
    // Load the DIRECTORY with pathGlobFilter rather than a `doc-*.bin`
    // glob: a glob expands to one ROOT PATH PER FILE before listing, and
    // the planner then stats every root individually (a 5000-task listing
    // job here; per-key LIST calls against object storage at fleet
    // scale). One directory root + filter = one listStatus per directory.
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "doc-*.bin")
      .load(dir.getAbsolutePath)
      .select(
        regexp_extract(col("path"), "doc-(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("content"))
    zeroFilled(spark, sfDir, decodeFeatures(bin))
  }

  /** m13: PACKED ingestion — the m09 pipeline run the way a 100 TB lake
    * actually stores a crawl: the loose objects are coalesced ONCE into
    * parquet packs ([[ingestCoalesced]] — narrow pass, ~k objects/file,
    * byte-identical payloads) and every later read is file-count-bounded
    * instead of object-count-bounded (measured 17.4× at 500k objects,
    * `bench_scaling_r18.json` `ingest_probe_500k`; m09's loose listing at
    * 5M objects is what OOM'd r17's shared sf100 JVM). Decode is the
    * IDENTICAL sniff-dispatch pass m09 runs — same oracle, so the gate
    * proves pack-then-decode ≡ loose-decode end to end. The pack dir is
    * marker-cached beside the fixture.
    */
  def m13PackedIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val packDir = ensurePacks(spark, sfDir)
    val bin = readPacks(spark, s"${packDir.getAbsolutePath}/data")
    zeroFilled(spark, sfDir, decodeFeatures(bin))
  }

  /** Materialize (or marker-hit) the m13 pack dir for `sfDir` — the
    * shared build step behind the gate and [[prewarmIngestFixture]].
    */
  private def ensurePacks(spark: SparkSession, sfDir: String): java.io.File = {
    val loose = looseFixture(spark, sfDir)
    val packDir = new java.io.File(loose.getParentFile,
      loose.getName + "_packs")
    ingestFixtureDirs.synchronized { ingestFixtureDirs += packDir; () }
    val marker = new java.io.File(packDir, "_GRAFT_PACKS")
    val markerWant = packsMarkerWant(loose)
    val fresh = !(marker.exists() &&
      scala.util.Try(new String(java.nio.file.Files.readAllBytes(marker.toPath)))
        .toOption.contains(markerWant))
    if (fresh) {
      packDir.mkdirs()
      ingestCoalesced(spark, loose.getAbsolutePath,
        s"${packDir.getAbsolutePath}/data", recordsPerPack = 500)
      java.nio.file.Files.write(marker.toPath, markerWant.getBytes); ()
    }
    packDir
  }

  /** The pack dir's cache-marker content: embeds the FIXTURE's own marker
    * (sfDir + nDocs + version), not just its path — the fixture rebuilds
    * in place when its corpus changes (same path, new marker), and packs
    * keyed on path alone would silently serve the STALE corpus and fail
    * the oracle confusingly (r18 ADVICE #2). Any fixture rebuild now
    * changes this string, invalidating the packs with it. Pinned in
    * MultimodalSpec.
    */
  private[operators] def packsMarkerWant(loose: java.io.File): String = {
    val fixtureMarker = new java.io.File(loose, "_GRAFT_FIXTURE")
    val fixtureContent = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(fixtureMarker.toPath)))
      .getOrElse("missing")
    s"${loose.getAbsolutePath}:$fixtureContent:v1"
  }

  /** Image formats checksum character-code pixels over the first
    * 25·⌊n/25⌋ chars; WAV checksums expanded codewords over all chars.
    */
  val m09Oracle: String =
    """WITH cp AS (
      |  SELECT doc_id, CAST(doc_id % 4 AS INT) AS fmt,
      |    [unicode(ch) for ch in regexp_split_to_array(text, '')] AS acs,
      |    strlen(text) AS n
      |  FROM documents),
      |x AS (
      |  SELECT doc_id, fmt,
      |    CASE WHEN fmt = 3 THEN acs ELSE acs[1 : 25 * (n // 25)] END AS cs
      |  FROM cp)
      |SELECT doc_id,
      |  CASE fmt WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'image/png'
      |    WHEN 2 THEN 'image/gif' ELSE 'audio/wav' END AS format,
      |  CAST(len(cs) AS INT) AS n_units,
      |  CAST(COALESCE(list_sum([i * (CASE WHEN fmt = 3
      |    THEN ((cs[i] % 16) * 8 + 132) * (1 << (cs[i] // 16)) - 132
      |    ELSE cs[i] END) for i in range(1, len(cs) + 1)]), 0) AS BIGINT)
      |    AS pos_checksum
      |FROM x ORDER BY doc_id""".stripMargin

  /** m09 SCALE companion — small-object COALESCING ingest (VERDICT r17
    * "Next round #5"; Iceberg's `rewrite_data_files` bin-pack analogue
    * moved to the ingest boundary). A real crawl dump is millions of
    * KB-sized objects; reading them per-file forever means every
    * downstream pass pays the per-object LIST/open cost (m09's sf100
    * shape is 5M files — excluded from the ×1000 row precisely because
    * it is file-count-linear). The fix every large pipeline ships: ONE
    * distributed pass that packs ~`recordsPerPack` objects per output
    * file, after which all downstream reads are file-count-bounded.
    *
    * Shape notes (the cluster-correct choices):
    *   - `coalesce`, NOT `repartition`: packing needs no co-location, so
    *     shuffling 100 TB of payload bytes through the exchange would be
    *     pure waste. Coalesce is a narrow dependency — the same tasks
    *     that read the small objects stream them into the packs, and the
    *     only driver-side work is the file listing.
    *   - Packs are PARQUET with a binary `content` column: splittable,
    *     doc_id-pushdown-able, and byte-identical on round trip (pinned
    *     in MultimodalSpec), i.e. the packed lake is a strict upgrade
    *     over the loose-object one, not a new bespoke container.
    *   - Memory is bounded by ONE payload + the parquet writer's row
    *     group, never by pack size or partition size (rows stream
    *     through; nothing accumulates a partition in heap).
    *
    * Returns the number of pack files written (== the coalesced
    * partition count: min(ceil(n/recordsPerPack), listing partitions),
    * every coalesced partition nonempty because coalesce unions
    * contiguous nonempty inputs).
    */
  def ingestCoalesced(spark: SparkSession, srcDir: String, packDir: String,
                      recordsPerPack: Int): Long = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "doc-*.bin")
      .load(srcDir)
      .select(
        regexp_extract(col("path"), "doc-(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("content"))
    // metadata-only pass: binaryFile prunes `content` for a count, so
    // this is the listing cost, not a data read
    val n = bin.count()
    val numPacks = math.max(1L, (n + recordsPerPack - 1) / recordsPerPack).toInt
    // coalesce can only DECREASE the partition count: in the loose-object
    // regime (listing partitions >= numPacks — the shape this exists for)
    // it is the narrow no-exchange pass described above, but a source
    // that is ALREADY coarse (fewer listing partitions than requested
    // packs) would silently come out larger/fewer than asked. That regime
    // gets an honest range-repartition on doc_id instead — it shuffles
    // the payload bytes, which is exactly the cost of asking a
    // pre-coalesced corpus to be split finer (callers who don't want it
    // pass a larger recordsPerPack), and range (not round-robin, which
    // leaves empty partitions → missing packs) both honors the pack
    // count and leaves each pack a doc_id RANGE, so the packed lake gets
    // min/max footer pruning on doc_id for free. Pinned in MultimodalSpec.
    // PRECONDITION of the "honors the pack count" claim: doc_ids are
    // UNIQUE (they are, by the doc-<id>.bin naming) — a range partitioner
    // over a key space with fewer distinct values than numPacks emits
    // fewer non-empty partitions than asked, so duplicate-heavy keys
    // would yield fewer packs with no error. The divergence check below
    // makes that regime visible instead of silent.
    val distributed =
      if (bin.rdd.getNumPartitions >= numPacks) bin.coalesce(numPacks)
      else bin.repartitionByRange(numPacks, col("doc_id"))
    distributed.write.mode("overwrite").parquet(packDir)
    val written = spark.read.parquet(packDir).inputFiles.length.toLong
    if (written != numPacks) System.err.println(
      s"[ingestCoalesced] wrote $written packs, asked $numPacks " +
        s"($n records @ $recordsPerPack/pack) — range sampling emitted " +
        "fewer non-empty partitions than requested (duplicate/skewed doc_ids?)")
    written
  }

  /** Read a packed ingest dir back to (doc_id, content) — plain parquet;
    * downstream decode is IDENTICAL to the loose-object path's.
    */
  def readPacks(spark: SparkSession, packDir: String): DataFrame =
    spark.read.parquet(packDir).select(col("doc_id"), col("content"))

  case class FlacSamples(doc_id: Long, n_samples: Int, sum_samples: Long, pos_checksum: Long)

  /** m10: LOSSLESS compressed audio — FLAC ([[graft.formats.Flac]]:
    * linear prediction + Rice-coded residuals, the third entropy-coding
    * family after DCT/deflate/LZW). Each document fabricates a STEREO
    * stream from its characters (left an affine map of the char code,
    * right = left minus a small char-derived delta — the shape that
    * makes the encoder's per-frame stereo-mode search pick a
    * decorrelated assignment), so the decode path exercises prediction,
    * Rice, and mid/side reconstruction per row. FLAC is lossless, so
    * the DuckDB oracle replays exact sums from the text with no
    * exactness construction; the codec's CRC-8/CRC-16/MD5 checks run on
    * every row, making the gate ALSO a per-document integrity audit.
    */
  def m10FlacSamples(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val pcm = new Array[Int](text.length * 2)
        var i = 0
        while (i < text.length) {
          val c = text.charAt(i).toInt % 256
          val left = c * 199 - 25000
          pcm(2 * i) = left
          pcm(2 * i + 1) = left - (c % 64 - 32)
          i += 1
        }
        MediaRow(id, graft.formats.Flac.encode(16000, 2, 16, pcm), "audio/flac", 0, 0)
      }
    media.mapPartitions { rows =>
      rows.map { r =>
        require(Media.sniff(r.payload) == "audio/flac", "m10: fixture failed the sniff")
        val st = graft.formats.Flac.decode(r.payload)
        val s = st.samples
        var sum = 0L; var chk = 0L
        var i = 0
        while (i < s.length / 2) {
          val left = s(2 * i); val right = s(2 * i + 1)
          sum += left + right
          chk += (i + 1).toLong * (left + 2L * right)
          i += 1
        }
        FlacSamples(r.doc_id, s.length / 2, sum, chk)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** left = (c%256)*199 - 25000; right = left - (c%64 - 32); the oracle
    * replays both channels from the text because FLAC is lossless.
    */
  val m10Oracle: String =
    """WITH cp AS (
      |  SELECT doc_id,
      |    [unicode(ch) % 256 for ch in regexp_split_to_array(text, '')] AS cs
      |  FROM documents)
      |SELECT doc_id, CAST(len(cs) AS INT) AS n_samples,
      |  CAST(COALESCE(list_sum(
      |    [2 * (x * 199 - 25000) - (x % 64 - 32) for x in cs]), 0) AS BIGINT)
      |    AS sum_samples,
      |  CAST(COALESCE(list_sum(
      |    [i * (3 * (cs[i] * 199 - 25000) - 2 * (cs[i] % 64 - 32))
      |     for i in range(1, len(cs) + 1)]), 0) AS BIGINT) AS pos_checksum
      |FROM cp ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m11

  /** Special ids for the interleaved image legs — laid out immediately
    * past [[graft.functions.BpeVocab.EosId]], so the text-id and
    * image-marker ranges can never collide (EosId is already one past
    * every assignable text id).
    */
  private[operators] lazy val ImgStartId: Long = graft.functions.BpeVocab.EosId + 1L
  private[operators] lazy val ImgPatchId: Long = graft.functions.BpeVocab.EosId + 2L
  private[operators] lazy val ImgEndId: Long   = graft.functions.BpeVocab.EosId + 3L

  /** m11: INTERLEAVED image+text sequence packing — the vision-language
    * training-data step (LLaVA/Flamingo-style): each document is an
    * (image, caption) pair; its token stream is IMG_START, one
    * IMG_PATCH marker per 8×8 patch of the DECODED image geometry,
    * IMG_END, then the caption's merge-rule BPE ids and the EOS — and
    * streams pack into fixed 128-token sequences exactly as p06 (the
    * concat-and-chunk tail is [[TextAnalysis.packIdStream]], shared, so
    * the two gates cannot drift). The image is a REAL BMP (the m01
    * fabrication) and the patch count comes from DECODING it in the
    * mapPartitions batch (the m-series shape — one codec context per
    * partition), never from the text; the ORACLE replays the geometry
    * through the container arithmetic the m01 gate already pins
    * (width 25, height ⌊n/25⌋), the ids through the p06 fragments, so a
    * single misplaced patch marker or caption token fails the gate.
    * Scale: fabricate+decode+tokenize are one per-row pass; then
    * p06's cost model (per-shard window, one bounded-state exchange).
    */
  def m11MultimodalPacking(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val patched = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val (bmp, _) = textToBmp(text)
          val img = Media.Bmp.decode(bmp)
          val patches = ((img.width + 7) / 8) * ((img.height + 7) / 8)
          (id, text, patches)
        }
      }.toDF("doc_id", "text", "n_patches")
    TextAnalysis.packIdStream(patched.select(col("doc_id"),
      concat(
        array(lit(ImgStartId)),
        array_repeat(lit(ImgPatchId), col("n_patches")),
        array(lit(ImgEndId)),
        graft.functions.F.bpeTokenIds(col("text")),
        array(lit(graft.functions.BpeVocab.EosId))).as("ids")))
  }

  /** The p06 replay with one extra `dtok` branch: per doc, IMG_START +
    * patch markers + IMG_END at widx −1 (before every word token),
    * patch count from the m01 container arithmetic.
    */
  lazy val m11Oracle: String = {
    val extra = s"""
       |  UNION ALL
       |  SELECT i.doc_id, CAST(-1 AS BIGINT) AS widx, t.t AS tidx,
       |    CASE WHEN t.t = 1 THEN $ImgStartId
       |         WHEN t.t = i.patches + 2 THEN $ImgEndId
       |         ELSE $ImgPatchId END AS id
       |  FROM (SELECT doc_id,
       |          CAST(4 * ((strlen(text) // 25 + 7) // 8) AS BIGINT) AS patches
       |        FROM documents) i,
       |    LATERAL (SELECT UNNEST(generate_series(1, i.patches + 2)) AS t) t""".stripMargin
    TextAnalysis.packedOracleSql(extra)
  }

  // ---------------------------------------------------------------- m12

  /** Special ids for the audio leg — past the m11 image markers, so
    * text, image and audio id ranges can never collide. Four level
    * markers: a frame's id is [[AudLevelBase]] + its quantized energy
    * level (0-3).
    */
  private[operators] lazy val AudStartId: Long = graft.functions.BpeVocab.EosId + 4L
  private[operators] lazy val AudEndId: Long   = graft.functions.BpeVocab.EosId + 5L
  private[operators] lazy val AudLevelBase: Long = graft.functions.BpeVocab.EosId + 6L

  /** m12: AUDIO+text sequence packing — the third modality through the
    * SHARED [[TextAnalysis.packIdStream]] tail (text = p06, image+text =
    * m11): each document becomes an (audio, transcript) pair; its token
    * stream is AUD_START, one level marker per 25-sample frame of the
    * DECODED audio (the m03 WAV fabrication, through the from-scratch
    * RIFF parser in the mapPartitions batch — never from the text), one
    * of FOUR ids by quantized frame energy, AUD_END, the transcript's
    * merge-rule BPE ids, EOS — packed into fixed 128-token sequences.
    *
    * Frame QUANTIZATION rides the integer energy kernel (m03's exact
    * arithmetic; thresholds 120000/480000/1080000 = voiced at 1×/2×/3×
    * amplitude), so the DuckDB oracle replays every marker bit-for-bit.
    * The mel/MFCC filterbank a production pipeline would attach per
    * frame ([[graft.formats.Dsp]]) is real and DspSpec-pinned against
    * closed-form fixtures, but floating-point features are NOT
    * hash-comparable across engines — the portable marker layer is the
    * integer one, the float features ride beside it (the same
    * fidelity/portability split every gate in this family makes).
    * Scale: decode+quantize+tokenize are one per-row pass; then p06's
    * cost model (per-shard window, one bounded-state exchange).
    */
  def m12AudioPacking(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val leveled = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val s = Media.Wav.decode(
            Media.Wav.encode(8000, fabricateSamples(text))).samples
          val nw = s.length / 25
          val levels = new Array[Long](nw)
          var w = 0
          while (w < nw) {
            var e = 0L
            var j = w * 25; val end = j + 25
            while (j < end) { e += s(j).toLong * s(j); j += 1 }
            levels(w) =
              if (e <= 120000L) 0L else if (e <= 480000L) 1L
              else if (e <= 1080000L) 2L else 3L
            w += 1
          }
          (id, text, levels)
        }
      }.toDF("doc_id", "text", "levels")
    TextAnalysis.packIdStream(leveled.select(col("doc_id"),
      concat(
        array(lit(AudStartId)),
        transform(col("levels"), l => l + lit(AudLevelBase)),
        array(lit(AudEndId)),
        graft.functions.F.bpeTokenIds(col("text")),
        array(lit(graft.functions.BpeVocab.EosId))).as("ids")))
  }

  /** The p06 replay with the audio `dtok` branch: per doc, AUD_START +
    * one quantized-energy level marker per 25-sample frame + AUD_END at
    * widx −1, energies from m03's exact integer arithmetic.
    */
  lazy val m12Oracle: String = {
    val extra = s"""
       |  UNION ALL
       |  SELECT a.doc_id, CAST(-1 AS BIGINT) AS widx, t.t AS tidx,
       |    CASE WHEN t.t = 1 THEN $AudStartId
       |         WHEN t.t = a.nw + 2 THEN $AudEndId
       |         ELSE $AudLevelBase + a.levels[CAST(t.t - 1 AS INT)] END AS id
       |  FROM (
       |    SELECT doc_id,
       |      [CASE WHEN e <= 120000 THEN 0 WHEN e <= 480000 THEN 1
       |            WHEN e <= 1080000 THEN 2 ELSE 3 END
       |       FOR e IN es] AS levels, len(es) AS nw
       |    FROM (
       |      SELECT doc_id,
       |        [list_sum([least(x-32,32767)*least(x-32,32767)
       |                   FOR x IN cs[w*25+1 : w*25+25]])
       |         FOR w IN range(0, len(cs) // 25)] AS es
       |      FROM (SELECT doc_id,
       |              [unicode(c) FOR c IN regexp_split_to_array(text, '')] AS cs
       |            FROM documents))) a,
       |    LATERAL (SELECT UNNEST(generate_series(1, a.nw + 2)) AS t) t""".stripMargin
    TextAnalysis.packedOracleSql(extra)
  }

  val entries: Map[String, graft.Gate.Entry] = Map(
    "m12_audio_packing"       -> graft.Gate(m12AudioPacking _, m12Oracle),
    "m11_multimodal_packing"  -> graft.Gate(m11MultimodalPacking _, m11Oracle),
    "m01_multimodal_pipeline" -> graft.Gate(m01MultimodalPipeline _, m01Oracle),
    "m02_frame_features"      -> graft.Gate(m02FrameFeatures _, m02Oracle),
    "m03_audio_segments"      -> graft.Gate(m03AudioSegments _, m03Oracle),
    "m04_jpeg_blocks"         -> graft.Gate(m04JpegBlocks _, m04Oracle),
    "m05_mulaw_audio"         -> graft.Gate(m05MulawAudio _, m05Oracle),
    "m06_video_frames"        -> graft.Gate(m06VideoFrames _, m06Oracle),
    "m07_png_pixels"          -> graft.Gate(m07PngPixels _, m07Oracle),
    "m08_gif_pixels"          -> graft.Gate(m08GifPixels _, m08Oracle),
    "m09_binary_ingest"       -> graft.Gate(m09BinaryIngest _, m09Oracle),
    // identical output contract to m09 — the gate proves pack-then-decode
    // ≡ loose-decode, so the two share one oracle
    "m13_packed_ingest"       -> graft.Gate(m13PackedIngest _, m09Oracle),
    "m10_flac_samples"        -> graft.Gate(m10FlacSamples _, m10Oracle),
  )
}
