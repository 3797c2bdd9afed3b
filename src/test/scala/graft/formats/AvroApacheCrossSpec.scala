package graft.formats

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.{Schema => ApacheSchema}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Cross-validation of the from-scratch [[Avro]] codec against Apache
  * Avro 1.12 (on the classpath as a Spark dependency — used here as a
  * test-side REFEREE only; the shipping codec stays dependency-free).
  * This is the strongest interop evidence available without a real
  * Iceberg engine in the container: every byte graft writes must parse
  * in the reference implementation, and every byte the reference
  * implementation writes must parse in graft — both codecs (`null`,
  * `deflate`), across the full type subset Iceberg manifests use
  * (records, unions, arrays, maps, fixed, enum, all primitives).
  */
class AvroApacheCrossSpec extends AnyFunSuite {

  // the manifest-shaped schema: every Avro type the Iceberg v1/v2
  // manifest schemas exercise, in one record
  private val schemaJson =
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int"},
      |  {"name":"snapshot_id","type":["null","long"],"default":null},
      |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |    {"name":"file_path","type":"string"},
      |    {"name":"file_format","type":{"type":"enum","name":"fmt","symbols":["AVRO","PARQUET","ORC"]}},
      |    {"name":"record_count","type":"long"},
      |    {"name":"key_digest","type":{"type":"fixed","name":"md5","size":16}},
      |    {"name":"bounds","type":["null",{"type":"map","values":"bytes"}],"default":null},
      |    {"name":"split_offsets","type":{"type":"array","items":"long"}},
      |    {"name":"metrics","type":{"type":"array","items":{"type":"record","name":"kv","fields":[
      |      {"name":"key","type":"int"},
      |      {"name":"value","type":["null","bytes"],"default":null}]}}},
      |    {"name":"ratio","type":"double"},
      |    {"name":"speed","type":"float"},
      |    {"name":"ok","type":"boolean"}
      |  ]}}
      |]}""".stripMargin

  private def sampleRecords: Seq[Map[String, Any]] = (0 until 137).map { i =>
    Map[String, Any](
      "status" -> i,
      "snapshot_id" -> (if (i % 3 == 0) null else java.lang.Long.valueOf(1000000000L + i)),
      "data_file" -> Map[String, Any](
        "file_path" -> s"s3://bucket/data/part-$i.parquet",
        "file_format" -> (if (i % 2 == 0) "PARQUET" else "AVRO"),
        "record_count" -> java.lang.Long.valueOf(i * 7919L),
        "key_digest" -> Array.tabulate[Byte](16)(j => ((i + j) & 0xff).toByte),
        "bounds" -> (if (i % 5 == 0) null
          else Map[String, Any]("lo" -> Array[Byte](1, 2, (i & 0x7f).toByte),
            "hi" -> Array[Byte](0x7f, (i & 0x3f).toByte))),
        "split_offsets" -> Seq[Any](0L, 4L * i, 1L << 33),
        "metrics" -> Seq[Any](
          Map[String, Any]("key" -> 1, "value" -> Array[Byte](i.toByte)),
          Map[String, Any]("key" -> 2, "value" -> null)),
        "ratio" -> (i * 0.125),
        "speed" -> (i * 0.5f),
        "ok" -> (i % 2 == 0)))
  }

  // ---- converters between graft's Map representation and GenericRecord

  private def toGeneric(schema: ApacheSchema, v: Any): Any = schema.getType match {
    case ApacheSchema.Type.RECORD =>
      val m = v.asInstanceOf[Map[String, Any]]
      val r = new GenericData.Record(schema)
      schema.getFields.forEach(f => r.put(f.name(), toGeneric(f.schema(), m(f.name()))))
      r
    case ApacheSchema.Type.UNION =>
      if (v == null) null
      else {
        val branch = schema.getTypes.stream()
          .filter(t => t.getType != ApacheSchema.Type.NULL).findFirst().get()
        toGeneric(branch, v)
      }
    case ApacheSchema.Type.ARRAY =>
      val items = schema.getElementType
      val l = new java.util.ArrayList[Any]()
      v.asInstanceOf[Seq[Any]].foreach(x => l.add(toGeneric(items, x)))
      l
    case ApacheSchema.Type.MAP =>
      val values = schema.getValueType
      val m = new java.util.HashMap[Utf8, Any]()
      v.asInstanceOf[Map[String, Any]].foreach { case (k, x) =>
        m.put(new Utf8(k), toGeneric(values, x))
      }
      m
    case ApacheSchema.Type.FIXED =>
      new GenericData.Fixed(schema, v.asInstanceOf[Array[Byte]])
    case ApacheSchema.Type.ENUM =>
      new GenericData.EnumSymbol(schema, v.asInstanceOf[String])
    case ApacheSchema.Type.BYTES => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case ApacheSchema.Type.STRING => new Utf8(v.asInstanceOf[String])
    case _ => v
  }

  /** Canonical comparable form for BOTH sides: bytes → hex string,
    * Utf8/EnumSymbol/Fixed → String/hex, java collections → Scala.
    */
  private def canon(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case bb: ByteBuffer =>
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
      arr.map("%02x".format(_)).mkString
    case f: GenericData.Fixed => f.bytes().map("%02x".format(_)).mkString
    case u: Utf8 => u.toString
    case e: GenericData.EnumSymbol => e.toString
    case r: GenericRecord =>
      val m = Map.newBuilder[String, Any]
      r.getSchema.getFields.forEach(f => m += f.name() -> canon(r.get(f.name())))
      m.result()
    case m: java.util.Map[_, _] =>
      val b = Map.newBuilder[String, Any]
      m.forEach((k, x) => b += k.toString -> canon(x))
      b.result()
    case l: java.util.List[_] =>
      val b = Seq.newBuilder[Any]
      l.forEach(x => b += canon(x))
      b.result()
    case m: Map[_, _] => m.map { case (k, x) => k.toString -> canon(x) }
    case s: Seq[_] => s.map(canon)
    case f: java.lang.Float => f.floatValue()
    case d: java.lang.Double => d.doubleValue()
    case other => other
  }

  private def apacheWrite(codec: Option[CodecFactory]): Array[Byte] = {
    val parsed = new ApacheSchema.Parser().parse(schemaJson)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](parsed))
    codec.foreach(w.setCodec)
    val out = new ByteArrayOutputStream()
    w.create(parsed, out)
    sampleRecords.foreach(r => w.append(toGeneric(parsed, r).asInstanceOf[GenericRecord]))
    w.close()
    out.toByteArray
  }

  private def apacheRead(bytes: Array[Byte]): Seq[Any] = {
    val rd = new DataFileReader[GenericRecord](new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    val out = Seq.newBuilder[Any]
    while (rd.hasNext) out += canon(rd.next())
    rd.close()
    out.result()
  }

  private val expected = sampleRecords.map(canon)

  test("graft-written container (deflate) parses in Apache Avro, value-identical") {
    val bytes = Avro.writeContainer(schemaJson, sampleRecords, codec = "deflate")
    assert(apacheRead(bytes) == expected)
  }

  test("graft-written container (null codec) parses in Apache Avro, value-identical") {
    val bytes = Avro.writeContainer(schemaJson, sampleRecords, codec = "null")
    assert(apacheRead(bytes) == expected)
  }

  test("Apache-Avro-written container (deflate) parses in graft, value-identical") {
    val c = Avro.readContainer(apacheWrite(Some(CodecFactory.deflateCodec(6))))
    assert(c.records.map(canon) == expected)
  }

  test("Apache-Avro-written container (null codec) parses in graft, value-identical") {
    val c = Avro.readContainer(apacheWrite(None))
    assert(c.records.map(canon) == expected)
  }

  test("graft extra file metadata survives an Apache read") {
    val bytes = Avro.writeContainer(schemaJson, sampleRecords.take(3),
      extraMeta = Seq("format-version" -> "1", "content" -> "data"))
    val rd = new DataFileReader[GenericRecord](new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    assert(new String(rd.getMeta("format-version"), StandardCharsets.UTF_8) == "1")
    assert(new String(rd.getMeta("content"), StandardCharsets.UTF_8) == "data")
    rd.close()
  }
}
