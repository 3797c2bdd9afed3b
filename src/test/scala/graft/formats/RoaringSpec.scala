package graft.formats

import org.scalatest.funsuite.AnyFunSuite
import org.roaringbitmap.longlong.Roaring64NavigableMap
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Cross-validation + byte-layout pins for the from-scratch portable
  * Roaring codec. The referee is the RoaringBitmap jar Spark carries
  * (`Roaring64NavigableMap.serializePortable/deserializePortable` — the
  * same wire format Iceberg v3 deletion vectors mandate); graft-written
  * bytes must decode in the referee and referee-written bytes in graft,
  * across container kinds (array, bitmap, multi-bucket). Hand-computed
  * layout pins catch symmetric encode/decode bugs a round trip hides.
  */
class RoaringSpec extends AnyFunSuite {

  private def refereeSerialize(values: Array[Long]): Array[Byte] = {
    val rb = new Roaring64NavigableMap()
    values.foreach(rb.addLong)
    val out = new ByteArrayOutputStream()
    rb.serializePortable(new DataOutputStream(out))
    out.toByteArray
  }

  private def refereeDeserialize(bytes: Array[Byte]): Array[Long] = {
    val rb = new Roaring64NavigableMap()
    rb.deserializePortable(new DataInputStream(new ByteArrayInputStream(bytes)))
    val out = Array.newBuilder[Long]
    val it = rb.getLongIterator
    while (it.hasNext) out += it.next()
    out.result()
  }

  // the container-kind gamut: sparse array, dense bitmap (5000 evens in
  // one 64k chunk), a full chunk boundary straddle, multiple 16-bit
  // containers, multiple 32-bit buckets, and u64 positions past 2^32
  private val cases: Seq[(String, Array[Long])] = Seq(
    "empty" -> Array.empty[Long],
    "single zero" -> Array(0L),
    "single max u16" -> Array(65535L),
    "chunk boundary" -> Array(65535L, 65536L, 65537L),
    "sparse array" -> Array(1L, 2L, 3L, 1000L, 4095L),
    "dense bitmap container" -> Array.tabulate(5000)(i => 2L * i),
    "full container straddle" -> ((60000L to 70000L).toArray),
    "multi bucket" -> Array(5L, (1L << 32) + 7L, (1L << 32) + 8L, (5L << 32) + 123456L),
    "high positions" -> Array((1L << 40) + 3L, (1L << 50) + 9L),
    "mixed kinds" -> (Array.tabulate(4200)(i => i.toLong) ++
      Array(200000L, 200001L, (3L << 32) + 17L)))

  for ((name, values) <- cases) {
    test(s"graft bytes decode in the referee: $name") {
      assert(refereeDeserialize(Roaring.serialize(values)).toSeq == values.toSeq)
    }
    test(s"referee bytes decode in graft: $name") {
      assert(Roaring.deserialize(refereeSerialize(values)).toSeq == values.toSeq)
    }
    test(s"round trip through graft alone: $name") {
      assert(Roaring.deserialize(Roaring.serialize(values)).toSeq == values.toSeq)
    }
  }

  test("byte layout pin: [1,2,3] (hand-computed against the format spec)") {
    val bytes = Roaring.serialize(Array(1L, 2L, 3L))
    val expected = Array[Int](
      1, 0, 0, 0, 0, 0, 0, 0,    // u64 LE: one 32-bit bucket
      0, 0, 0, 0,                // u32 LE: bucket key 0 (high 32 bits)
      0x3a, 0x30, 0, 0,          // u32 LE: cookie 12346 (no runs)
      1, 0, 0, 0,                // u32 LE: one container
      0, 0,                      // u16 LE: container key 0
      2, 0,                      // u16 LE: cardinality - 1 = 2
      16, 0, 0, 0,               // u32 LE: payload offset from cookie
      1, 0, 2, 0, 3, 0)          // u16 LE values 1,2,3
    assert(bytes.map(_ & 0xff).toSeq == expected.toSeq)
  }

  test("run containers decode (hand-built cookie-12346 stream)") {
    // graft never writes runs; foreign DVs may. One bucket, one run
    // container holding [5..9]: cookie 12347|(1-1)<<16, 1 run-flag byte
    // (container 0 is a run), desc header key=0 card-1=4, NO offset
    // header (n < 4 with runs), payload: 1 run, start 5, length-1 4.
    val buf = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 1 + 4 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(1L).putInt(0)
    buf.putInt(12347).put(0x01.toByte)
    buf.putShort(0).putShort(4)
    buf.putShort(1).putShort(5).putShort(4)
    assert(Roaring.deserialize(buf.array()).toSeq == Seq(5L, 6L, 7L, 8L, 9L))
  }

  test("refuses garbage cookies loudly") {
    val buf = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(1L).putInt(0).putInt(99999)
    val e = intercept[IllegalArgumentException](Roaring.deserialize(buf.array()))
    assert(e.getMessage.contains("cookie"))
  }

  test("input contract enforced: unsorted and negative positions refuse") {
    intercept[IllegalArgumentException](Roaring.serialize(Array(3L, 1L)))
    intercept[IllegalArgumentException](Roaring.serialize(Array(-1L)))
  }

  test("foreign empty bucket decodes (cookie 12346, container count 0)") {
    // The portable format permits an empty 32-bit bitmap; this
    // serializer never emits one, but a conforming foreign writer (the
    // Iceberg-interop surface this reader exists for) may — hand-build
    // one bucket with zero containers and one with data.
    val buf = java.nio.ByteBuffer.allocate(8 + (4 + 8) + (4 + 8 + 4 + 4 + 2))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(2L)
    buf.putInt(0).putInt(12346).putInt(0)              // bucket 0: empty
    buf.putInt(1).putInt(12346).putInt(1)              // bucket 1: one container
      .putShort(0).putShort(0)                          //   key 0, card 1
      .putInt(16)                                       //   offset header
      .putShort(7)                                      //   value 7
    assert(Roaring.deserialize(buf.array()).toSeq == Seq((1L << 32) | 7L))
    // and a wholly empty bitmap (bucket count 0)
    val empty = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(0L)
    assert(Roaring.deserialize(empty.array()).isEmpty)
  }
}
