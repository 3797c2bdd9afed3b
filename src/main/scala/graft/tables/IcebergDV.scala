package graft.tables

import graft.formats.{Puffin, Roaring}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

/** Iceberg v3 deletion-vector blob framing + the DV Puffin file shape —
  * PUBLIC v3 spec only: a `deletion-vector-v1` Puffin blob is
  * `u32 BE length(magic + vector) | magic D1 D3 39 64 | vector | u32 BE
  * CRC-32(magic + vector)`, where the vector is a 64-bit PORTABLE
  * Roaring bitmap ([[graft.formats.Roaring]]) of deleted row positions,
  * and the blob's footer metadata MUST carry `referenced-data-file` and
  * `cardinality` properties. The delete-manifest entry then points INTO
  * the Puffin file via `content_offset` / `content_size_in_bytes`
  * (fields 144/145) next to `referenced_data_file` (143).
  *
  * This is the v3 half of the binary interop (t49): unlike v2 — where
  * graft's DV state explodes into row-per-position parquet delete files
  * — a v3 export ships the bitmaps THEMSELVES, and a v3 import registers
  * them back as graft DV files, so the O(files-with-deletes) read plan
  * survives the foreign round trip.
  */
object IcebergDV {

  val BlobType = "deletion-vector-v1"
  private val Magic = Array(0xD1, 0xD3, 0x39, 0x64).map(_.toByte)

  /** Frame sorted positions as one v3 DV blob payload. */
  def frame(sorted: Array[Long]): Array[Byte] = {
    val vec = Roaring.serialize(sorted)
    val out = ByteBuffer.allocate(4 + 4 + vec.length + 4).order(ByteOrder.BIG_ENDIAN)
    out.putInt(4 + vec.length)
    out.put(Magic)
    out.put(vec)
    val crc = new CRC32()
    crc.update(Magic)
    crc.update(vec)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Decode one framed DV blob; validates length, magic, and CRC. */
  def unframe(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length >= 12, "truncated deletion-vector blob")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val len = buf.getInt
    require(len == bytes.length - 8,
      s"deletion-vector length field $len != payload ${bytes.length - 8}")
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(magic.sameElements(Magic), "bad deletion-vector magic")
    val vec = new Array[Byte](len - 4)
    buf.get(vec)
    val stored = buf.getInt
    val crc = new CRC32()
    crc.update(Magic)
    crc.update(vec)
    require(crc.getValue.toInt == stored, "deletion-vector CRC mismatch")
    Roaring.deserialize(vec)
  }

  /** One DV blob's location inside the written Puffin file. */
  final case class DvBlobRef(dataFile: String, offset: Long, size: Long,
      cardinality: Long)

  /** Build one Puffin file holding a DV blob per data file. Input rows
    * are (data-file path, graft-encoded bitmap); rows are sorted by path
    * for a deterministic artifact. Returns the file bytes plus each
    * blob's manifest-entry coordinates.
    */
  def buildPuffin(rows: Seq[(String, Array[Byte])],
      snapshotId: Long): (Array[Byte], Seq[DvBlobRef]) = {
    val blobs = rows.sortBy(_._1).map { case (path, bm) =>
      val positions = graft.functions.Bitmaps.positionsArray(bm)
      (path, frame(positions), positions.length.toLong)
    }
    val bytes = Puffin.write(blobs.map { case (path, payload, card) =>
      Puffin.Blob(BlobType, fields = Nil, snapshotId = snapshotId,
        sequenceNumber = snapshotId, payload = payload,
        properties = Map("referenced-data-file" -> path,
          "cardinality" -> card.toString))
    })
    // offsets as Puffin.write lays payloads out: 4-byte magic, then
    // payloads in order — verified by comparing the BYTES at each
    // computed offset against the framed payload (a length-only check
    // could not catch padding/alignment drift in the writer)
    var off = 4L
    val refs = blobs.map { case (path, payload, card) =>
      val r = DvBlobRef(path, off, payload.length.toLong, card)
      require(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + payload.length),
        payload), s"puffin layout drift: blob for $path not at offset $off")
      off += payload.length
      r
    }
    (bytes, refs)
  }

  /** Slice + decode one DV blob out of a Puffin file's bytes by its
    * manifest-entry coordinates (the import side never needs the whole
    * footer — `content_offset`/`content_size_in_bytes` are the contract).
    */
  def readBlobAt(puffin: Array[Byte], offset: Long, size: Long): Array[Long] = {
    require(offset >= 0 && size > 0 && offset + size <= puffin.length,
      s"DV blob [$offset, +$size) outside puffin file of ${puffin.length} bytes")
    unframe(java.util.Arrays.copyOfRange(puffin, offset.toInt, (offset + size).toInt))
  }
}
