package graft.formats

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Byte-layout pins for the from-scratch Puffin codec — hand-computed
  * against the public spec (magic placement, footer payload size int32
  * LE, flag bytes), including a file BUILT without the writer so the
  * reader is proven spec-faithful rather than mirror-symmetric.
  */
class PuffinSpec extends AnyFunSuite {

  test("writer layout: magics, footer size field, flags") {
    val blob = Puffin.Blob("graft-kmv-sketch-v1", Seq(1), 7L, 7L,
      "payload".getBytes(StandardCharsets.UTF_8), Map("k" -> "4"))
    val bytes = Puffin.write(Seq(blob), Map("created-by" -> "graft"))
    // head magic; blob payload starts immediately after (offset 4)
    assert(new String(bytes, 0, 4, StandardCharsets.UTF_8) == "PFA1")
    assert(new String(bytes, 4, 7, StandardCharsets.UTF_8) == "payload")
    // trailing magic; footer payload size sits 12 bytes from the end (LE)
    val n = bytes.length
    assert(new String(bytes, n - 4, 4, StandardCharsets.UTF_8) == "PFA1")
    val size = ByteBuffer.wrap(bytes, n - 12, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    // footer magic directly precedes the payload
    assert(new String(bytes, n - 12 - size - 4, 4, StandardCharsets.UTF_8) == "PFA1")
    // flags all zero (uncompressed footer)
    assert(bytes.slice(n - 8, n - 4).forall(_ == 0))
    val f = Puffin.read(bytes)
    assert(f.blobs.size == 1)
    assert(f.blobs.head.blobType == "graft-kmv-sketch-v1")
    assert(f.blobs.head.fields == Seq(1))
    assert(new String(f.blobs.head.payload, StandardCharsets.UTF_8) == "payload")
    assert(f.blobs.head.properties("k") == "4")
    assert(f.properties("created-by") == "graft")
    assert(f.footerSize == 12 + size + 4)
  }

  test("hand-built file decodes (reader is spec-faithful, not mirror)") {
    val payload1 = Array[Byte](1, 2, 3)
    val payload2 = "xyz".getBytes(StandardCharsets.UTF_8)
    val footerJson =
      """{"blobs":[
        |{"type":"t1","fields":[5],"snapshot-id":9,"sequence-number":9,"offset":4,"length":3},
        |{"type":"t2","fields":[6],"snapshot-id":9,"sequence-number":9,"offset":7,"length":3}
        |],"properties":{"who":"external"}}""".stripMargin
        .getBytes(StandardCharsets.UTF_8)
    val out = new ByteArrayOutputStream()
    out.write("PFA1".getBytes(StandardCharsets.UTF_8))
    out.write(payload1); out.write(payload2)
    out.write("PFA1".getBytes(StandardCharsets.UTF_8))
    out.write(footerJson)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(footerJson.length).array())
    out.write(Array[Byte](0, 0, 0, 0))
    out.write("PFA1".getBytes(StandardCharsets.UTF_8))
    val f = Puffin.read(out.toByteArray)
    assert(f.blobs.map(_.blobType) == Seq("t1", "t2"))
    assert(f.blobs(0).payload.toSeq == Seq[Byte](1, 2, 3))
    assert(new String(f.blobs(1).payload, StandardCharsets.UTF_8) == "xyz")
    assert(f.properties("who") == "external")
  }

  test("hostile two-field blob region: Long off+len overflow refuses") {
    // off = 0x7FFFFFFF00000004 (low int = 4, in-bounds after truncation),
    // len = 0x7FFFFFFF00000000: the Long sum wraps NEGATIVE, so a
    // sum-based guard passes and the Int truncations land on the
    // in-bounds-but-empty range [4, 4) — copyOfRange silently returns
    // zero bytes instead of refusing. The single-byte-flip battery
    // cannot reach this two-field state; pin it directly.
    val payload = Array[Byte](1, 2, 3)
    val footerJson =
      ("""{"blobs":[{"type":"t1","fields":[5],"snapshot-id":9,""" +
        """"sequence-number":9,"offset":9223372032559808516,""" +
        """"length":9223372032559808512}],"properties":{}}""")
        .getBytes(StandardCharsets.UTF_8)
    val out = new ByteArrayOutputStream()
    out.write("PFA1".getBytes(StandardCharsets.UTF_8))
    out.write(payload)
    out.write("PFA1".getBytes(StandardCharsets.UTF_8))
    out.write(footerJson)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(footerJson.length).array())
    out.write(Array[Byte](0, 0, 0, 0))
    out.write("PFA1".getBytes(StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException](Puffin.read(out.toByteArray))
    assert(e.getMessage.contains("blob region"))
  }

  test("refusals: bad magic, compressed footer") {
    val good = Puffin.write(Seq(Puffin.Blob("t", Seq(1), 1L, 1L, Array[Byte](0))))
    assert(!Puffin.isPuffin("nope".getBytes(StandardCharsets.UTF_8)))
    intercept[IllegalArgumentException](
      Puffin.read("not a puffin at all".getBytes(StandardCharsets.UTF_8)))
    // flip the compressed-footer flag bit → loud refusal, not garbage
    val flagged = good.clone()
    flagged(flagged.length - 8) = 1
    val e = intercept[IllegalArgumentException](Puffin.read(flagged))
    assert(e.getMessage.contains("compressed"))
  }
}
