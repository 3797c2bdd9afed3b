package graft.formats

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Byte-layout pins for the from-scratch Avro codec — hand-computed
  * against the PUBLIC Avro spec (zigzag varints, container magic,
  * RFC 1951 stored blocks), not just self round-trips: a symmetric
  * encode/decode bug would round-trip fine and still be unreadable by
  * every real Avro implementation.
  */
class AvroSpec extends AnyFunSuite {

  private def zz(v: Long): Seq[Int] = {
    val out = new ByteArrayOutputStream()
    Avro.writeLong(out, v)
    out.toByteArray.toSeq.map(_ & 0xFF)
  }

  test("zigzag varint bytes match the spec's worked examples") {
    // Avro spec: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
    assert(zz(0) == Seq(0x00))
    assert(zz(-1) == Seq(0x01))
    assert(zz(1) == Seq(0x02))
    assert(zz(-2) == Seq(0x03))
    assert(zz(2) == Seq(0x04))
    assert(zz(-64) == Seq(0x7f))
    assert(zz(64) == Seq(0x80, 0x01))
    assert(zz(-65) == Seq(0x81, 0x01))
    // boundary: Long.MinValue zigzags to 0xFFFFFFFFFFFFFFFF = ten bytes
    assert(zz(Long.MinValue) == Seq(0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
      0xff, 0xff, 0xff, 0x01))
    // decode inverts every case incl. multi-byte
    for (v <- Seq(0L, -1L, 1L, 63L, -64L, 64L, 8191L, 1234567890123L,
        Long.MaxValue, Long.MinValue)) {
      val out = new ByteArrayOutputStream()
      Avro.writeLong(out, v)
      assert(new Avro.Reader(out.toByteArray, 0).readLong() == v)
    }
  }

  test("primitive encodings: string length-prefix, float/double LE") {
    val out = new ByteArrayOutputStream()
    Avro.writeLong(out, 3L) // "foo".length zigzagged = 0x06
    out.write('f'); out.write('o'); out.write('o')
    val bytes = out.toByteArray
    assert((bytes(0) & 0xFF) == 0x06)
    val r = new Avro.Reader(bytes, 0)
    assert(Avro.readValue(r, Avro.AString) == "foo")
    // double 1.0 = IEEE754 0x3FF0000000000000, little-endian on the wire
    val schema = Avro.parseSchema(
      """{"type":"record","name":"t","fields":[{"name":"d","type":"double"}]}""")
    val enc = {
      val o = new ByteArrayOutputStream()
      val m = Map[String, Any]("d" -> 1.0)
      // writeContainer is the public surface; encode via a 1-record
      // null-codec container and strip down to the block payload below
      Avro.writeContainer(
        """{"type":"record","name":"t","fields":[{"name":"d","type":"double"}]}""",
        Seq(m), codec = "null")
    }
    val c = Avro.readContainer(enc)
    assert(c.records == Seq(Map("d" -> 1.0)))
    assert(schema.isInstanceOf[Avro.ARecord])
  }

  test("hand-built container decodes (reader is spec-faithful, not mirror)") {
    // Constructed byte-for-byte per the container spec, WITHOUT the
    // writer: magic Obj\x01; metadata map {avro.schema: <record with one
    // long field>, avro.codec: null}; 16-byte sync; one block: count=1,
    // size=2, payload = zigzag(-3) = 0x05 … wait: record {n: long} with
    // n = -3 encodes as the single byte 0x05.
    val schemaJson =
      """{"type":"record","name":"t","fields":[{"name":"n","type":"long"}]}"""
    val out = new ByteArrayOutputStream()
    out.write('O'); out.write('b'); out.write('j'); out.write(1)
    val meta = Seq("avro.schema" -> schemaJson, "avro.codec" -> "null")
    Avro.writeLong(out, meta.size.toLong)
    meta.foreach { case (k, v) =>
      val kb = k.getBytes(StandardCharsets.UTF_8)
      Avro.writeLong(out, kb.length.toLong); out.write(kb, 0, kb.length)
      val vb = v.getBytes(StandardCharsets.UTF_8)
      Avro.writeLong(out, vb.length.toLong); out.write(vb, 0, vb.length)
    }
    Avro.writeLong(out, 0L)
    val sync = Array.tabulate[Byte](16)(i => (i * 7).toByte)
    out.write(sync, 0, 16)
    Avro.writeLong(out, 1L) // block record count
    Avro.writeLong(out, 1L) // block byte size
    out.write(0x05)         // zigzag(-3)
    out.write(sync, 0, 16)
    val c = Avro.readContainer(out.toByteArray)
    assert(c.records == Seq(Map("n" -> -3L)))
    assert(new String(c.meta("avro.codec"), StandardCharsets.UTF_8) == "null")
  }

  test("writer layout: magic, metadata, sync repetition") {
    val schemaJson =
      """{"type":"record","name":"t","fields":[{"name":"s","type":"string"}]}"""
    val bytes = Avro.writeContainer(schemaJson,
      Seq(Map("s" -> "x"), Map("s" -> "y")), codec = "null")
    assert(bytes.take(4).sameElements(Array[Byte]('O', 'b', 'j', 1)))
    // the sync marker after the metadata section must terminate the file
    val c = Avro.readContainer(bytes)
    assert(c.records.map(_("s")) == Seq("x", "y"))
    // deterministic: same inputs, same bytes (exports are reproducible)
    assert(bytes.sameElements(Avro.writeContainer(schemaJson,
      Seq(Map("s" -> "x"), Map("s" -> "y")), codec = "null")))
  }

  test("raw-deflate codec: RFC 1951 stored block inflates; zlib stream refuses") {
    // stored (uncompressed) deflate block, hand-built per RFC 1951:
    // final-bit set + type 00 → byte 0x01, then LEN, NLEN little-endian,
    // then the raw bytes
    val payload = "abc".getBytes(StandardCharsets.UTF_8)
    val stored = Array[Byte](0x01, 3, 0, (~3).toByte, (~0).toByte) ++ payload
    assert(Avro.inflate(stored).sameElements(payload))
    // our deflate must be raw (no zlib 0x78 header) or real readers choke
    val d = Avro.deflate("the quick brown fox".getBytes(StandardCharsets.UTF_8))
    assert((d(0) & 0xFF) != 0x78, "deflate output looks zlib-wrapped")
    assert(Avro.inflate(d).sameElements("the quick brown fox".getBytes(StandardCharsets.UTF_8)))
    // deflate-codec container round-trips
    val schemaJson =
      """{"type":"record","name":"t","fields":[{"name":"n","type":"long"}]}"""
    val recs = (1L to 500L).map(i => Map[String, Any]("n" -> i))
    val c = Avro.readContainer(Avro.writeContainer(schemaJson, recs))
    assert(c.records.map(_("n")) == (1L to 500L))
  }

  test("unions, arrays, maps, nested records, enum, fixed round-trip") {
    val schemaJson =
      """{"type":"record","name":"outer","fields":[
        |  {"name":"opt","type":["null","long"],"default":null},
        |  {"name":"tags","type":{"type":"array","items":"string"}},
        |  {"name":"props","type":{"type":"map","values":"int"}},
        |  {"name":"inner","type":{"type":"record","name":"in","fields":[
        |    {"name":"b","type":"boolean"},{"name":"bs","type":"bytes"}]}},
        |  {"name":"e","type":{"type":"enum","name":"col","symbols":["red","green"]}},
        |  {"name":"fx","type":{"type":"fixed","name":"f4","size":4}},
        |  {"name":"again","type":"in"}
        |]}""".stripMargin
    val rec = Map[String, Any](
      "opt" -> null,
      "tags" -> Seq("a", "bb"),
      "props" -> Map("k" -> 7),
      "inner" -> Map[String, Any]("b" -> true, "bs" -> Array[Byte](1, 2)),
      "e" -> "green",
      "fx" -> Array[Byte](9, 8, 7, 6),
      "again" -> Map[String, Any]("b" -> false, "bs" -> Array[Byte]()))
    val rec2 = Map[String, Any](
      "opt" -> 42L,
      "tags" -> Seq.empty[String],
      "props" -> Map.empty[String, Any],
      "inner" -> Map[String, Any]("b" -> false, "bs" -> Array[Byte](5)),
      "e" -> "red",
      "fx" -> Array[Byte](0, 0, 0, 0),
      "again" -> Map[String, Any]("b" -> true, "bs" -> Array[Byte](9)))
    val got = Avro.readContainer(
      Avro.writeContainer(schemaJson, Seq(rec, rec2))).records
    assert(got.size == 2)
    assert(got(0)("opt") == null && got(1)("opt") == 42L)
    assert(got(0)("tags") == Seq("a", "bb") && got(1)("tags") == Nil)
    assert(got(0)("props") == Map("k" -> 7) && got(1)("props") == Map())
    assert(got(0)("e") == "green" && got(1)("e") == "red")
    assert(got(0)("fx").asInstanceOf[Array[Byte]].toSeq == Seq[Byte](9, 8, 7, 6))
    assert(got(0)("inner").asInstanceOf[Map[String, Any]]("b") == true)
    assert(got(1)("again").asInstanceOf[Map[String, Any]]("bs")
      .asInstanceOf[Array[Byte]].toSeq == Seq[Byte](9))
    // array block form with negative count (count, byteSize, items…) —
    // spec-legal writer variant our reader must accept
    val arrSchema =
      """{"type":"record","name":"t","fields":[
        |  {"name":"xs","type":{"type":"array","items":"long"}}]}""".stripMargin
    val out = new ByteArrayOutputStream()
    Avro.writeLong(out, -2L) // negative count: byte size follows
    Avro.writeLong(out, 2L)  // two bytes of items
    Avro.writeLong(out, 1L); Avro.writeLong(out, 2L)
    Avro.writeLong(out, 0L)  // terminator
    val r = new Avro.Reader(out.toByteArray, 0)
    val xs = Avro.readValue(r, Avro.parseSchema(arrSchema)
      .asInstanceOf[Avro.ARecord].fields.head.schema)
    assert(xs == Seq(1L, 2L))
  }
}
