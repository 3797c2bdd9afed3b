package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY §2.6): opaque binary payloads with a
  * typed metadata struct, processed in per-partition batches.
  *
  * The decode step is a DETERMINISTIC STUB (no image/audio codecs ship in
  * this environment): it "decodes" the payload to a 16-bin byte histogram.
  * Everything around it — binary column handling, metadata schema, typed
  * Dataset batch processing via mapPartitions, feature-vector output — is
  * the real plumbing a codec would drop into.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String, width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int, feature: Array[Double], feature_norm: Double)

  /** STUB "resize": rebin a feature vector to `n` bins (stands in for
    * image resize — same signature a real kernel would have).
    */
  private[operators] def resizeStub(feature: Array[Double], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    var i = 0
    while (i < feature.length) { out(i * n / feature.length) += feature(i); i += 1 }
    out
  }

  /** STUB "frame sampling": every `stride`-th byte of the payload (stands
    * in for video frame extraction — batch shape identical).
    */
  private[operators] def frameSample(payload: Array[Byte], stride: Int): Array[Byte] =
    payload.indices.collect { case i if i % stride == 0 => payload(i) }.toArray

  /** STUB decoder: byte-value histogram (16 bins) normalized to sum 1.
    * A real decoder (image resize, audio frame-sample, …) replaces exactly
    * this function; batch shape and schema stay.
    */
  private def decodeStub(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    var i = 0
    while (i < payload.length) { bins((payload(i) & 0xff) >> 4) += 1.0; i += 1 }
    if (payload.length > 0) { var b = 0; while (b < 16) { bins(b) /= payload.length; b += 1 } }
    bins
  }

  /** m01: binary payload + metadata → per-partition batch decode → feature
    * rows. Payloads here are the document texts cast to binary (stand-in
    * for image bytes); metadata is derived deterministically.
    */
  def m01MultimodalPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("fake/rgb8").as("format"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height"))
      .as[MediaRow]

    // Batch shape: one decoder context per partition (a real codec would
    // init native state here once, then stream rows through it).
    val feats = media.mapPartitions { rows =>
      rows.map { r =>
        val sampled = frameSample(r.payload, stride = 2)
        val f = resizeStub(decodeStub(sampled), 8)
        MediaFeatures(r.doc_id, r.format, r.payload.length, f, math.sqrt(f.map(x => x * x).sum))
      }
    }
    // feature_ok: the stub decode normalizes each histogram to sum 1 and
    // resize preserves sums, so a correctly-plumbed pipeline yields sum≈1
    // for every non-empty payload — an oracle-checkable invariant of the
    // batch path (exact feature values are asserted in MultimodalSpec)
    feats.toDF()
      .withColumn("feature_ok",
        col("n_bytes") === 0 || abs(aggregate(col("feature"), lit(0.0), _ + _) - 1.0) < 1e-9)
      .select(col("doc_id"), col("format"), col("n_bytes"), col("feature_ok"))
      .orderBy(col("doc_id"))
  }

  val m01Oracle: String =
    """SELECT doc_id, 'fake/rgb8' AS format, CAST(strlen(text) AS INT) AS n_bytes,
      |  TRUE AS feature_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  case class FrameFeatures(doc_id: Long, n_frames: Int, f0: Double, f1: Double, f2: Double, f3: Double)

  /** m02: frame-sample + resize plumbing, VALUE-checked end to end — the
    * stubs are deterministic byte arithmetic, so the oracle recomputes the
    * exact feature values (m01 only checks an invariant of them). The
    * pipeline keeps raw INTEGER histogram counts through resize and
    * normalizes once at the end, so both engines do one double division
    * per bin and the doubles match bit-for-bit. Frame-sample every 4th
    * byte → 16-bin histogram → resize to 4 bins → normalized features.
    */
  def m02FrameFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("fake/rgb8").as("format"), lit(0).as("width"), lit(0).as("height"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        val frames = frameSample(r.payload, stride = 4)
        val counts = new Array[Double](16)
        var i = 0
        while (i < frames.length) { counts((frames(i) & 0xff) >> 4) += 1.0; i += 1 }
        val binned = resizeStub(counts, 4)
        val n = frames.length
        def norm(b: Int): Double = if (n == 0) 0.0 else binned(b) / n
        FrameFeatures(r.doc_id, n, norm(0), norm(1), norm(2), norm(3))
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Every-4th-char code points (ASCII corpus: bytes == code points),
    * 4-bin histogram by code//64 (== resize of the 16-bin code//16
    * histogram), one double division per bin.
    */
  val m02Oracle: String =
    """WITH fr AS (
      |  SELECT doc_id,
      |    [unicode(c) for c in
      |      list_filter(regexp_split_to_array(text, ''), (c, i) -> (i - 1) % 4 = 0)] AS f
      |  FROM documents)
      |SELECT doc_id, CAST(len(f) AS INT) AS n_frames,
      |  len(list_filter(f, x -> x // 64 = 0)) / CAST(len(f) AS DOUBLE) AS f0,
      |  len(list_filter(f, x -> x // 64 = 1)) / CAST(len(f) AS DOUBLE) AS f1,
      |  len(list_filter(f, x -> x // 64 = 2)) / CAST(len(f) AS DOUBLE) AS f2,
      |  len(list_filter(f, x -> x // 64 = 3)) / CAST(len(f) AS DOUBLE) AS f3
      |FROM fr ORDER BY doc_id""".stripMargin

  case class AudioSegments(doc_id: Long, n_windows: Int, n_voiced: Int,
      longest_run: Int, total_energy: Long)

  /** m03: AUDIO segmentation plumbing — the voice-activity-detection
    * pipeline shape (window → per-window energy → threshold → contiguous
    * voiced segments), with the codec stubbed as byte arithmetic like
    * m01/m02 (no audio libs in env): payload bytes are the "samples",
    * window = 25 samples (full windows only), energy = Σ(sample−32)² in
    * INTEGER math — so the oracle recomputes every value exactly,
    * including the run-length logic (longest voiced segment) that real
    * segmenters hang everything on. mapPartitions batch shape matches how
    * a real decoder amortizes per-batch codec state.
    */
  def m03AudioSegments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val threshold = 120000L
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("fake/pcm8").as("format"), lit(0).as("width"), lit(0).as("height"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = r.payload
        val nw = b.length / 25
        var run = 0; var best = 0; var voiced = 0; var total = 0L
        var w = 0
        while (w < nw) {
          var e = 0L
          var i = w * 25; val end = i + 25
          while (i < end) { val d = (b(i) & 0xff) - 32; e += d.toLong * d; i += 1 }
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
      |    list_sum([ (x-32)*(x-32) for x in cs[i.i*25+1 : i.i*25+25] ]) AS energy
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

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "m01_multimodal_pipeline" -> ((m01MultimodalPipeline _, m01Oracle)),
    "m02_frame_features"      -> ((m02FrameFeatures _, m02Oracle)),
    "m03_audio_segments"      -> ((m03AudioSegments _, m03Oracle)),
  )
}
