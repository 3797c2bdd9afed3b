package graft.formats

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based fuzz for the three from-scratch binary codecs — the
  * hand-computed pins in AvroSpec/RoaringSpec/PuffinSpec are strong on
  * anticipated layouts; random schemas/values/bitmaps close the
  * unanticipated-layout corner. Referees: the Apache Avro 1.12 and
  * RoaringBitmap jars Spark ships (test classpath only), both directions
  * each; Puffin self-round-trips (no JVM referee exists) with
  * structure-level assertions.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def check(label: String, p: Prop, min: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$label: $res")
  }

  // ------------------------------------------------------------ Roaring

  private val roaringValues: Gen[Array[Long]] = {
    val small = Gen.chooseNum(0L, 70000L)
    val run = for {
      start <- Gen.chooseNum(0L, 1000000L)
      len <- Gen.chooseNum(1, 6000)
    } yield (start until start + len)
    val bucketed = for {
      bucket <- Gen.chooseNum(0L, 5L)
      v <- Gen.chooseNum(0L, 100000L)
    } yield (bucket << 32) | v
    val huge = Gen.chooseNum(0L, (1L << 62) - 1)
    for {
      singles <- Gen.listOf(Gen.oneOf(small, bucketed, huge))
      runs <- Gen.listOf(run)
    } yield (singles ++ runs.flatten).distinct.sorted.toArray
  }

  test("Roaring fuzz: graft bytes decode in the RoaringBitmap referee") {
    import org.roaringbitmap.longlong.Roaring64NavigableMap
    import java.io.{ByteArrayInputStream, DataInputStream}
    check("graft→referee", Prop.forAll(roaringValues) { vs =>
      val rb = new Roaring64NavigableMap()
      rb.deserializePortable(new DataInputStream(
        new ByteArrayInputStream(Roaring.serialize(vs))))
      val out = Array.newBuilder[Long]
      val it = rb.getLongIterator
      while (it.hasNext) out += it.next()
      out.result().toSeq == vs.toSeq
    })
  }

  test("Roaring fuzz: referee bytes decode in graft") {
    import org.roaringbitmap.longlong.Roaring64NavigableMap
    import java.io.{ByteArrayOutputStream, DataOutputStream}
    check("referee→graft", Prop.forAll(roaringValues) { vs =>
      val rb = new Roaring64NavigableMap()
      vs.foreach(rb.addLong)
      val bos = new ByteArrayOutputStream()
      rb.serializePortable(new DataOutputStream(bos))
      Roaring.deserialize(bos.toByteArray).toSeq == vs.toSeq
    })
  }

  // --------------------------------------------------------------- Avro

  /** A random flat-ish Avro schema (prims, nullable unions, arrays,
    * maps, one nested record level) with a matching value generator.
    */
  private case class FieldGen(name: String, schemaJson: String, value: Gen[Any])

  private val asciiName: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val utfString: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.choose(32, 126),
      2 -> Gen.choose(0xA1, 0x2FA0))).map(_.map(_.toChar).mkString)

  private val primGens: Seq[(String, Gen[Any])] = Seq(
    "\"int\"" -> Gen.chooseNum(Int.MinValue, Int.MaxValue).map(x => x: Any),
    "\"long\"" -> Gen.chooseNum(Long.MinValue, Long.MaxValue).map(x => x: Any),
    "\"boolean\"" -> Gen.oneOf(true, false).map(x => x: Any),
    "\"string\"" -> utfString.map(x => x: Any),
    "\"double\"" -> Gen.chooseNum(-1e18, 1e18).map(x => x: Any),
    "\"float\"" -> Gen.chooseNum(-1e9f, 1e9f).map(x => x: Any),
    "\"bytes\"" -> Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(bs => bs.toArray: Any))

  private def fieldGen(idx: Int, allowNested: Boolean): Gen[FieldGen] = {
    val prim = Gen.oneOf(primGens).map { case (s, g) =>
      FieldGen(s"f$idx", s, g) }
    val nullable = Gen.oneOf(primGens).flatMap { case (s, g) =>
      Gen.const(FieldGen(s"f$idx", s"""["null", $s]""",
        Gen.frequency(1 -> Gen.const(null: Any), 3 -> g)))
    }
    val arr = Gen.oneOf(primGens).map { case (s, g) =>
      FieldGen(s"f$idx", s"""{"type": "array", "items": $s}""",
        Gen.listOf(g).map(xs => xs: Any))
    }
    val mp = Gen.oneOf(primGens).map { case (s, g) =>
      FieldGen(s"f$idx", s"""{"type": "map", "values": $s}""",
        Gen.mapOf(Gen.zip(asciiName, g)).map(m => m: Any))
    }
    val nested =
      if (!allowNested) prim
      else Gen.choose(1, 3).flatMap { n =>
        Gen.sequence[Seq[FieldGen], FieldGen](
          (0 until n).map(i => fieldGen(idx * 10 + i, allowNested = false)))
          .map { fs =>
            val schema = s"""{"type": "record", "name": "n$idx", "fields": [
              ${fs.map(f => s"""{"name": "${f.name}", "type": ${f.schemaJson}}""").mkString(",")}]}"""
            val vg = Gen.sequence[Seq[Any], Any](fs.map(_.value))
              .map(vs => fs.map(_.name).zip(vs).toMap: Any)
            FieldGen(s"f$idx", schema, vg)
          }
      }
    Gen.frequency(4 -> prim, 2 -> nullable, 1 -> arr, 1 -> mp, 1 -> nested)
  }

  private case class AvroCase(schemaJson: String, records: Seq[Map[String, Any]])

  private val avroCase: Gen[AvroCase] = for {
    nFields <- Gen.choose(1, 6)
    fields <- Gen.sequence[Seq[FieldGen], FieldGen](
      (0 until nFields).map(i => fieldGen(i, allowNested = true)))
    nRecords <- Gen.choose(0, 40)
    records <- Gen.listOfN(nRecords,
      Gen.sequence[Seq[Any], Any](fields.map(_.value))
        .map(vs => fields.map(_.name).zip(vs).toMap))
  } yield AvroCase(
    s"""{"type": "record", "name": "fz", "fields": [
      ${fields.map(f => s"""{"name": "${f.name}", "type": ${f.schemaJson}}""").mkString(",")}]}""",
    records)

  /** Canonical form for cross-library comparison: Utf8→String,
    * ByteBuffer/Array[Byte]→Seq[Byte], GenericRecord/Map→sorted pairs,
    * lists→Seq, floats/doubles→raw bits.
    */
  private def canon(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a.toSeq
    case b: Array[Byte] => b.toSeq
    case r: org.apache.avro.generic.GenericRecord =>
      r.getSchema.getFields.toArray.toSeq
        .map(_.asInstanceOf[org.apache.avro.Schema.Field].name())
        .sorted.map(n => n -> canon(r.get(n)))
    case m: Map[_, _] =>
      m.toSeq.map { case (k, x) => String.valueOf(k) -> canon(x) }.sortBy(_._1)
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      m.asScala.toSeq.map { case (k, x) => String.valueOf(k) -> canon(x) }.sortBy(_._1)
    case l: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      l.asScala.toSeq.map(canon)
    case s: Seq[_] => s.map(canon)
    case f: Float => java.lang.Float.floatToIntBits(f)
    case d: Double => java.lang.Double.doubleToLongBits(d)
    case f: java.lang.Float => java.lang.Float.floatToIntBits(f)
    case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
    case other => other
  }

  private def toApache(schema: org.apache.avro.Schema, v: Any): Any = {
    import org.apache.avro.Schema.Type
    schema.getType match {
      case Type.UNION =>
        if (v == null) null
        else toApache(schema.getTypes.get(1), v)
      case Type.BYTES => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Type.RECORD =>
        val r = new org.apache.avro.generic.GenericData.Record(schema)
        val m = v.asInstanceOf[Map[String, Any]]
        schema.getFields.forEach(f => r.put(f.name(), toApache(f.schema(), m(f.name()))))
        r
      case Type.ARRAY =>
        import scala.jdk.CollectionConverters._
        v.asInstanceOf[Seq[Any]].map(toApache(schema.getElementType, _)).asJava
      case Type.MAP =>
        import scala.jdk.CollectionConverters._
        v.asInstanceOf[Map[String, Any]]
          .map { case (k, x) => k -> toApache(schema.getValueType, x) }.asJava
      case _ => v
    }
  }

  test("Avro fuzz: graft containers decode in Apache Avro (referee)") {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    check("graft→apache", Prop.forAll(avroCase) { c =>
      val bytes = Avro.writeContainer(c.schemaJson, c.records)
      val rd = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
      val got = Seq.newBuilder[GenericRecord]
      while (rd.hasNext) got += rd.next()
      rd.close()
      val a = got.result().map(canon)
      val b = c.records.map(canon)
      a == b
    }, min = 40)
  }

  test("Avro fuzz: Apache containers decode in graft") {
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericDatumWriter, GenericRecord}
    check("apache→graft", Prop.forAll(avroCase) { c =>
      val schema = new org.apache.avro.Schema.Parser().parse(c.schemaJson)
      val bos = new java.io.ByteArrayOutputStream()
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, bos)
      c.records.foreach(r => w.append(toApache(schema, r).asInstanceOf[GenericRecord]))
      w.close()
      val got = Avro.readContainer(bos.toByteArray)
      got.records.map(canon) == c.records.map(canon)
    }, min = 40)
  }

  test("Avro fuzz: graft round trip is the identity") {
    check("graft→graft", Prop.forAll(avroCase) { c =>
      val back = Avro.readContainer(Avro.writeContainer(c.schemaJson, c.records))
      back.records.map(canon) == c.records.map(canon)
    }, min = 40)
  }

  // -------------------------------------------------------------- Media

  test("BMP fuzz: random rasters round-trip graft↔ImageIO in both directions") {
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      px <- Gen.listOfN(w * h * 3, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, px.toArray)
    check("bmp", Prop.forAll(gen) { case (w, h, rgb) =>
      // graft encode → ImageIO referee decode, pixel-exact
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Media.Bmp.encode(w, h, rgb)))
      val refereeOk = (0 until h).forall(y => (0 until w).forall { x =>
        val p = img.getRGB(x, y); val b = (y * w + x) * 3
        ((p >> 16) & 0xff) == (rgb(b) & 0xff) &&
          ((p >> 8) & 0xff) == (rgb(b + 1) & 0xff) &&
          (p & 0xff) == (rgb(b + 2) & 0xff)
      })
      // ImageIO encode → graft decode, pixel-exact
      val src = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y * w + x) * 3
        src.setRGB(x, y, ((rgb(b) & 0xff) << 16) |
          ((rgb(b + 1) & 0xff) << 8) | (rgb(b + 2) & 0xff))
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(src, "bmp", bos)
      val dec = Media.Bmp.decode(bos.toByteArray)
      refereeOk && dec.width == w && dec.height == h && dec.pixels.sameElements(rgb)
    }, min = 40)
  }

  test("WAV fuzz: random PCM round-trips graft↔javax.sound in both directions") {
    import javax.sound.sampled._
    val gen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      n <- Gen.choose(0, 500)
      samples <- Gen.listOfN(n,
        Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (rate, samples.toArray)
    check("wav", Prop.forAll(gen) { case (rate, samples) =>
      // graft encode → javax.sound referee decode
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Media.Wav.encode(rate, samples)))
      val bytes = ais.readAllBytes()
      val refereeOk = bytes.length == samples.length * 2 &&
        samples.indices.forall { i =>
          (((bytes(i * 2) & 0xff) | ((bytes(i * 2 + 1) & 0xff) << 8)).toShort.toInt
            == samples(i))
        }
      // javax.sound encode → graft decode
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(i * 2) = s.toByte; pcm(i * 2 + 1) = (s >> 8).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
        AudioFileFormat.Type.WAVE, bos)
      val dec = Media.Wav.decode(bos.toByteArray)
      refereeOk && dec.sampleRate == rate && dec.samples.sameElements(samples)
    }, min = 40)
  }

  // ------------------------------------------------------------- Puffin

  private val puffinBlob: Gen[Puffin.Blob] = for {
    typ <- Gen.oneOf("deletion-vector-v1", "apache-datasketches-theta-v1", "graft-kmv-v1")
    fields <- Gen.listOf(Gen.chooseNum(1, 500))
    snap <- Gen.chooseNum(0L, 1L << 40)
    seq <- Gen.chooseNum(0L, 1L << 20)
    payload <- Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    props <- Gen.mapOf(Gen.zip(asciiName, asciiName))
  } yield Puffin.Blob(typ, fields, snap, seq, payload, props)

  test("Puffin fuzz: random blob sets round-trip with exact payload slicing") {
    val gen = for {
      blobs <- Gen.listOf(puffinBlob)
      props <- Gen.mapOf(Gen.zip(asciiName, asciiName))
    } yield (blobs, props)
    check("puffin", Prop.forAll(gen) { case (blobs, props) =>
      val bytes = Puffin.write(blobs, props)
      val back = Puffin.read(bytes)
      back.properties == props &&
        back.blobs.size == blobs.size &&
        back.blobs.zip(blobs).forall { case (g, w) =>
          g.blobType == w.blobType && g.fields == w.fields &&
            g.snapshotId == w.snapshotId && g.sequenceNumber == w.sequenceNumber &&
            g.payload.toSeq == w.payload.toSeq && g.properties == w.properties
        }
    })
  }

  // --------------------------------------------------------------- FLAC

  private val flacPcm: Gen[(Int, Int, Array[Int])] = for {
    channels <- Gen.oneOf(1, 2)
    bps <- Gen.oneOf(8, 16)
    frames <- Gen.chooseNum(0, 9000)
    shape <- Gen.oneOf("noise", "tone", "ramp", "steps", "sparse")
    seed <- Gen.chooseNum(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    val lim = 1 << (bps - 1)
    val s = new Array[Int](frames * channels)
    var i = 0
    while (i < s.length) {
      s(i) = shape match {
        case "noise" => rnd.nextInt(2 * lim) - lim
        case "tone" => ((lim - 1) * 0.7 * math.sin(0.001 + (i / channels) * (0.1 + seed % 29 * 0.1))).toInt
        case "ramp" => ((i / channels) % (2 * lim)) - lim
        case "steps" => (((i / channels) / 64) * 977 % (2 * lim)) - lim
        case _ => if (rnd.nextInt(50) == 0) rnd.nextInt(2 * lim) - lim else 0
      }
      i += 1
    }
    (channels, bps, s)
  }

  test("FLAC fuzz: every signal shape round-trips the identity (MD5-verified inside decode)") {
    check("flac", Prop.forAll(flacPcm) { case (ch, bps, s) =>
      val st = Flac.decode(Flac.encode(16000, ch, bps, s))
      st.channels == ch && st.bitsPerSample == bps && st.samples.toSeq == s.toSeq
    })
  }

  test("PNG fuzz: any single-byte corruption refuses (every byte rides a CRC)") {
    // a minimal graft PNG is signature + IHDR/IDAT/IEND, and every chunk's
    // type+data is CRC-32-covered; length/CRC field corruption breaks
    // framing or the check itself — so ANY byte change must refuse
    // (a random reframing passing CRC is ~2^-32; seeds are fixed)
    val rgb = Array.tabulate(48 * 32 * 3)(i => ((i * 31 + i / 7) % 251).toByte)
    val good = Png.encode(48, 32, rgb)
    val gen = for {
      at <- Gen.chooseNum(0, good.length - 1)
      xor <- Gen.chooseNum(1, 255)
    } yield (at, xor)
    check("png-hostile", Prop.forAll(gen) { case (at, xor) =>
      val mut = good.clone
      mut(at) = (mut(at) ^ xor).toByte
      try { Png.decode(mut); false }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }, min = 200)
  }

  test("GIF/JPEG fuzz: corruption refuses loudly or decodes bounded — never an undeclared error") {
    // unlike PNG/FLAC these formats carry no integrity check, so a flip
    // may legally decode to a DIFFERENT image; the pinned contract is the
    // failure-mode envelope: only the declared refusal type ever escapes,
    // and any surviving decode is self-consistent (pixels match its own
    // claimed dimensions — the hostile-dimension budget guards allocation)
    val rgb = Array.tabulate(48 * 32 * 3)(i => ((i * 37 + i / 5) % 247).toByte)
    val goodJpeg = Jpeg.encode(48, 32, rgb)
    val goodGif = Gif.encodeGray(40, 24,
      Array.tabulate(40 * 24)(i => (i % 251).toByte))
    def battery(label: String, good: Array[Byte],
        decode: Array[Byte] => Media.Image): Unit =
      check(label, Prop.forAll(for {
        at <- Gen.chooseNum(0, good.length - 1)
        xor <- Gen.chooseNum(1, 255)
      } yield (at, xor)) { case (at, xor) =>
        val mut = good.clone
        mut(at) = (mut(at) ^ xor).toByte
        try {
          val img = decode(mut)
          img.width > 0 && img.height > 0 &&
            img.pixels.length == img.width * img.height * 3
        } catch {
          case _: IllegalArgumentException => true
          case _: Throwable => false
        }
      }, min = 200)
    battery("jpeg-hostile", goodJpeg, Jpeg.decode)
    battery("gif-hostile", goodGif, Gif.decode)
    // PROGRESSIVE stream via ImageIO — the multi-scan decode path (spectral
    // selection + successive approximation) has its own header state the
    // baseline battery never reaches
    val img = new java.awt.image.BufferedImage(48, 40,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 40; x <- 0 until 48)
      img.setRGB(x, y, ((x * 53 + y * 17) % 255 << 16) |
        ((x * 7 + y * 31) % 255 << 8) | ((x + y * 3) % 255))
    val wtr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val prm = wtr.getDefaultWriteParam
    prm.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wtr.setOutput(ios)
    wtr.write(null, new javax.imageio.IIOImage(img, null, null), prm)
    ios.close(); wtr.dispose()
    battery("jpeg-progressive-hostile", bos.toByteArray, Jpeg.decode)
    // regression pin, kept from a live battery counterexample: a corrupted
    // SOS entropy-table selector (4-bit nibble, only 0..3 valid) escaped
    // as ArrayIndexOutOfBounds before the decoder validated it; byte 615
    // of this fixed encode sits in the scan header's Td/Ta byte
    for (xor <- Seq(169, 255)) {
      val mut = goodJpeg.clone
      mut(615) = (mut(615) ^ xor).toByte
      val e = intercept[IllegalArgumentException](Jpeg.decode(mut))
      assert(e.getMessage.contains("entropy-table ids"), e.getMessage)
    }
  }

  test("BMP/WAV/AVI fuzz: corruption refuses loudly or decodes bounded — never an undeclared error") {
    // same contract as the JPEG/GIF battery (no integrity check in these
    // containers, so a flip may legally decode DIFFERENT media): only the
    // declared refusal type escapes, and any surviving decode is
    // self-consistent against its own claimed geometry/length
    val goodBmp = Media.Bmp.encode(31, 17,
      Array.tabulate(31 * 17 * 3)(i => ((i * 29 + i / 3) % 253).toByte))
    val goodWav = Media.Wav.encode(8000,
      Array.tabulate(500)(i => (600 * math.sin(i / 7.0)).toInt))
    val frame = Jpeg.encode(16, 16,
      Array.tabulate(16 * 16 * 3)(i => ((i * 11) % 200).toByte))
    val goodAvi = Media.Avi.encode(16, 16, 40000, Seq(frame, frame, frame))
    def battery[A](label: String, good: Array[Byte],
        decode: Array[Byte] => A, bounded: A => Boolean): Unit =
      check(label, Prop.forAll(for {
        at <- Gen.chooseNum(0, good.length - 1)
        xor <- Gen.chooseNum(1, 255)
      } yield (at, xor)) { case (at, xor) =>
        val mut = good.clone
        mut(at) = (mut(at) ^ xor).toByte
        try bounded(decode(mut))
        catch {
          case _: IllegalArgumentException => true
          case _: Throwable => false
        }
      }, min = 200)
    battery[Media.Image]("bmp-hostile", goodBmp, Media.Bmp.decode,
      img => img.width > 0 && img.height > 0 &&
        img.pixels.length == img.width * img.height * 3)
    battery[Media.Audio]("wav-hostile", goodWav, Media.Wav.decode,
      a => a.channels > 0 && a.sampleRate > 0 &&
        a.samples.length % a.channels == 0)
    // regression pin from a live battery counterexample: byte 23 is the
    // channel-count high byte of this fixed encode — a flip made decode
    // return 257-channel audio whose 500 samples were not frame-aligned
    for (xor <- Seq(1, 168)) {
      val mut = goodWav.clone
      mut(23) = (mut(23) ^ xor).toByte
      val e = intercept[IllegalArgumentException](Media.Wav.decode(mut))
      assert(e.getMessage.contains("channel-channel frames") ||
        e.getMessage.contains("whole number"), e.getMessage)
    }
    // second live counterexample (64k-case sweep): byte 27 is the sample
    // rate's top byte — a sign-bit flip decoded to NEGATIVE Hz
    for (xor <- Seq(172, 139)) {
      val mut = goodWav.clone
      mut(27) = (mut(27) ^ xor).toByte
      val e = intercept[IllegalArgumentException](Media.Wav.decode(mut))
      assert(e.getMessage.contains("bad sample rate"), e.getMessage)
    }
    battery[Media.Video]("avi-hostile", goodAvi, { b: Array[Byte] =>
      val v = Media.Avi.decode(b)
      // the lazy frame path must hold the same contract: decode every
      // frame inside the battery so a corrupt payload can't hide
      v.frames.indices.foreach { i =>
        val img = v.frame(i)
        assert(img.pixels.length == img.width * img.height * 3)
      }
      v
    }, v => v.width > 0 && v.height > 0)
  }

  test("Roaring/Puffin fuzz: hostile mutations refuse loudly, never an undeclared error") {
    // both are FOREIGN-file surfaces (Iceberg DV + stats exchange); before
    // their untrusted-input hardening a 40k sweep leaked BufferUnderflow/
    // NegativeArraySize and an UNCATCHABLE OutOfMemoryError from a corrupt
    // container count (roaring), and the Jackson family + NPE + a multi-GB
    // copyOfRange from a hostile blob length (puffin)
    val positions = (0L until 3000L).filter(i => (i * 2654435761L) % 7 < 3).toArray
    val rb = Roaring.serialize(positions)
    val blob = Puffin.Blob("apache-datasketches-theta-v1", Seq(1), 42L, 7L,
      Array.tabulate(500)(i => (i * 37 % 251).toByte), Map("ndv" -> "123"))
    val pf = Puffin.write(Seq(blob), Map("created-by" -> "graft-fuzz"))
    def battery(label: String, good: Array[Byte], decode: Array[Byte] => Any): Unit =
      check(label, Prop.forAll(for {
        at <- Gen.chooseNum(0, good.length - 1)
        xor <- Gen.chooseNum(1, 255)
      } yield (at, xor)) { case (at, xor) =>
        val mut = good.clone
        mut(at) = (mut(at) ^ xor).toByte
        try { decode(mut); true }
        catch {
          case _: IllegalArgumentException => true
          case _: Throwable => false
        }
      }, min = 200)
    battery("roaring-hostile", rb, Roaring.deserialize)
    battery("puffin-hostile", pf, Puffin.read)
    // live counterexamples: roaring container count driven huge/negative
    // (bytes 19/23 of this fixed serialization), puffin blob length made
    // hostile (705) and footer JSON corrupted (515)
    for ((at, xor) <- Seq((19, 158), (19, 108), (23, 201)))  {
      val mut = rb.clone
      mut(at) = (mut(at) ^ xor).toByte
      intercept[IllegalArgumentException](Roaring.deserialize(mut))
      ()
    }
    for ((at, xor) <- Seq((705, 157), (515, 42), (619, 174))) {
      val mut = pf.clone
      mut(at) = (mut(at) ^ xor).toByte
      intercept[IllegalArgumentException](Puffin.read(mut))
      ()
    }
  }

  test("Avro fuzz: hostile container mutations refuse loudly, never an undeclared error") {
    // the container interleaves THREE parse layers a flip can land in —
    // varint framing, a deflate stream, and schema JSON — and before the
    // refusing() boundary each leaked its own exception family
    // (DataFormatException ×15945, Jackson parse ×1756, NPE ×714,
    // ArrayIndexOutOfBounds ×169 in a 40k sweep); the declared contract
    // is one refusal type at the entry points
    val schema = """{"type":"record","name":"r","fields":[
      {"name":"id","type":"long"},{"name":"s","type":"string"}]}"""
    val recs = (0 until 200).map(i =>
      Map[String, Any]("id" -> i.toLong, "s" -> s"value-$i-${"x" * (i % 17)}"))
    val good = Avro.writeContainer(schema, recs, codec = "deflate", syncSalt = "sweep")
    check("avro-hostile", Prop.forAll(for {
      at <- Gen.chooseNum(0, good.length - 1)
      xor <- Gen.chooseNum(1, 255)
    } yield (at, xor)) { case (at, xor) =>
      val mut = good.clone
      mut(at) = (mut(at) ^ xor).toByte
      try { Avro.readContainer(mut).records.foreach(r => assert(r != null)); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }, min = 200)
    // live counterexamples from the sweep, one per leaked family: deflate
    // body (745^212), schema JSON made non-JSON (63^237), valid JSON of
    // the wrong shape -> NPE (51^143), framing over-read (1044^204)
    for ((at, xor) <- Seq((745, 212), (63, 237), (51, 143), (1044, 204), (118, 184))) {
      val mut = good.clone
      mut(at) = (mut(at) ^ xor).toByte
      intercept[IllegalArgumentException](Avro.readContainer(mut))
      ()
    }
    // the header-only probe holds the same boundary
    for ((at, xor) <- Seq((63, 237), (51, 143))) {
      val mut = good.clone
      mut(at) = (mut(at) ^ xor).toByte
      try { Avro.readSchemaJson(mut); () }
      catch {
        case _: IllegalArgumentException => ()
      }
    }
  }

  test("FLAC fuzz: hostile mutations of a valid stream refuse, never mis-decode") {
    val rnd = new scala.util.Random(97)
    val s = Array.tabulate(3000)(i => (900 * math.sin(i / 9.0)).toInt + rnd.nextInt(40) - 20)
    val good = Flac.encode(8000, 1, 16, s)
    val gen = for {
      at <- Gen.chooseNum(0, good.length - 1)
      xor <- Gen.chooseNum(1, 255)
    } yield (at, xor)
    check("flac-hostile", Prop.forAll(gen) { case (at, xor) =>
      val mut = good.clone
      mut(at) = (mut(at) ^ xor).toByte
      try {
        val st = Flac.decode(mut)
        // CRCs/MD5 make a silent mis-decode essentially impossible; a
        // surviving decode must return the exact original samples (the
        // flip landed in skipped padding or a dead header bit we verify)
        st.samples.toSeq == s.toSeq
      } catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }, min = 200)
  }
}
