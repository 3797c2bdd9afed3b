package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DataFrame-level Avro source/sink ([[GraftAvro]]) over the
  * from-scratch codec — cross-validated against Apache Avro 1.12 (test
  * classpath referee, the AvroApacheCrossSpec pattern lifted from the
  * container level to the DataFrame level), plus envelope refusals and
  * the t54 ORC pushdown plan pin.
  */
class GraftAvroSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_avrospec").toString

  private val wideSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("ratio", FloatType, nullable = true),
    StructField("n", IntegerType, nullable = true),
    StructField("ok", BooleanType, nullable = true),
    StructField("blob", BinaryType, nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = true), nullable = true),
    StructField("nested", StructType(Seq(
      StructField("a", LongType, nullable = true),
      StructField("b", StringType, nullable = true))), nullable = true)))

  private def wideRows: Seq[Row] = (0 until 500).map { i =>
    Row(
      i.toLong,
      if (i % 7 == 0) null else s"name-$i",
      if (i % 11 == 0) null else i * 1.5,
      i / 3.0f,
      i * 3,
      i % 2 == 0,
      if (i % 5 == 0) null else Array.tabulate[Byte](i % 9)(j => (i + j).toByte),
      if (i % 13 == 0) null else Seq(s"t$i", null, "x"),
      if (i % 17 == 0) null else Row(i * 10L, s"b$i"))
  }

  test("full-envelope DataFrame round trip (nulls, arrays, nested structs, binary)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(wideRows, 4), wideSchema)
    val dir = tmp()
    val files = GraftAvro.write(df, dir, recordsPerFile = 64)
    assert(files >= 8, s"expected chunked multi-file output, got $files")
    val back = GraftAvro.read(spark, dir)
    // nullability round-trips exactly: only nullable fields became unions
    assert(back.schema == wideSchema)
    // canonicalize before comparing: Row.toString prints byte arrays by
    // identity, never by content
    def canon(v: Any): Any = v match {
      case b: Array[Byte] => b.toSeq
      case r: Row => r.toSeq.map(canon)
      case s: scala.collection.Seq[_] => s.map(canon).toSeq
      case x => x
    }
    def key(r: Row) = r.getLong(0)
    val a = df.collect().sortBy(key).map(canon).toSeq
    val b = back.collect().sortBy(key).map(canon).toSeq
    assert(a == b)
  }

  test("graft-written files parse in Apache Avro with identical values (referee)") {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val df = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      .orderBy($"o_orderkey").limit(200)
    val dir = tmp()
    GraftAvro.write(df.coalesce(1), dir)
    val file = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(file.length == 1)
    val bytes = java.nio.file.Files.readAllBytes(file(0).toPath)
    val rd = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
    val got = scala.collection.mutable.ArrayBuffer[(Long, String, Double)]()
    while (rd.hasNext) {
      val r = rd.next()
      got += ((r.get("o_orderkey").asInstanceOf[Long],
        r.get("o_orderpriority").toString,
        r.get("o_totalprice").asInstanceOf[Double]))
    }
    rd.close()
    val want = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got.sortBy(_._1).toSeq == want.sortBy(_._1))
  }

  test("Apache-written container reads through GraftAvro (referee, reverse direction)") {
    import org.apache.avro.{Schema => ApacheSchema}
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schemaJson =
      """{"type":"record","name":"row","fields":[
        |  {"name":"k","type":"long"},
        |  {"name":"v","type":["null","string"],"default":null},
        |  {"name":"xs","type":{"type":"array","items":"int"}}
        |]}""".stripMargin
    val sch = new ApacheSchema.Parser().parse(schemaJson)
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(sch, out)
    for (i <- 0 until 300) {
      val r = new GenericData.Record(sch)
      r.put("k", i.toLong)
      r.put("v", if (i % 4 == 0) null else s"v$i")
      val arr = new java.util.ArrayList[Integer]()
      (0 until i % 5).foreach(j => arr.add(i + j))
      r.put("xs", arr)
      w.append(r)
    }
    w.close()
    val dir = tmp()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "apache.avro"), out.toByteArray)
    val back = GraftAvro.read(spark, dir)
    assert(back.schema == StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true),
      StructField("xs", ArrayType(IntegerType, containsNull = false), nullable = false))))
    val rows = back.collect().sortBy(_.getLong(0))
    assert(rows.length == 300)
    assert(rows(8).getLong(0) == 8 && rows(8).isNullAt(1))
    assert(rows(7).getString(1) == "v7")
    assert(rows(7).getSeq[Int](2) == Seq(7, 8))
  }

  test("envelope refusals: decimal/timestamp columns, mixed-schema dir, empty dir") {
    val dec = spark.sql("SELECT CAST(1.5 AS DECIMAL(10,2)) AS d")
    val e1 = intercept[IllegalArgumentException](GraftAvro.write(dec, tmp()))
    assert(e1.getMessage.contains("unsupported type") && e1.getMessage.contains("$.d"))
    val ts = spark.sql("SELECT TIMESTAMP '2026-01-01 00:00:00' AS t")
    intercept[IllegalArgumentException](GraftAvro.write(ts, tmp()))
    intercept[IllegalArgumentException](GraftAvro.read(spark, tmp()))
    val dir = tmp()
    GraftAvro.write(Seq(1L).toDF("a"), dir)
    // drop a second container with a DIFFERENT schema beside the first
    val clash = graft.formats.Avro.writeContainer(
      """{"type":"record","name":"row","fields":[{"name":"a","type":"string"}]}""",
      Seq(Map[String, Any]("a" -> "x")))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "zz-clash.avro"), clash)
    val e2 = intercept[Throwable](GraftAvro.read(spark, dir).count())
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    assert(chain(e2).contains("differs from the directory schema"), chain(e2).take(400))
  }

  test("t54 plan pin: the ORC read pushes the filter and prunes columns") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = graft.operators.TableOps.t54OrcExternal(spark, sf)
    // sparkPlan, not executedPlan: AQE wraps the tree in an adaptive root
    val scans = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec if f.relation.fileFormat.toString.toLowerCase.contains("orc") => f
    }
    assert(scans.nonEmpty, "no ORC scan in the t54 plan")
    val s = scans.head
    assert(s.metadata.get("PushedFilters").exists(_.contains("l_returnflag")),
      s.metadata.get("PushedFilters").toString)
    val readCols = s.requiredSchema.fieldNames.toSet
    assert(!readCols.contains("l_partkey"), s"unpruned read schema: $readCols")
  }
}
