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

  test("logical types round-trip: date / timestamp / decimal / map (r14)") {
    val df = spark.sql(
      """SELECT id,
        |  DATE '1992-01-01' + CAST(id % 4000 AS INT) AS d,
        |  TIMESTAMP '2024-03-01 06:30:15.123456' + make_interval(0,0,0,0,0,0, id) AS ts,
        |  CAST(CAST(id AS STRING) || '.25' AS DECIMAL(18,2)) AS dec,
        |  IF(id % 5 = 0, NULL, DATE '2000-06-01' + CAST(id AS INT)) AS d_null,
        |  map('a', id, 'b', id * 2) AS m
        |FROM range(0, 500) """.stripMargin)
    val dir = tmp()
    GraftAvro.write(df.repartition(3), dir, recordsPerFile = 100)
    val back = GraftAvro.read(spark, dir)
    assert(back.schema("d").dataType == DateType)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("dec").dataType == DecimalType(18, 2))
    assert(back.schema("d_null").nullable)
    assert(back.schema("m").dataType ==
      MapType(StringType, LongType, valueContainsNull = false))
    val a = df.collect().map(_.toString).sorted.toSeq
    val b = back.collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("logical types referee: Apache Avro reads graft's annotations and values") {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import org.apache.avro.LogicalTypes
    val df = spark.sql(
      """SELECT DATE '2020-02-29' AS d,
        |  TIMESTAMP '2024-03-01 06:30:15.123456' AS ts,
        |  CAST('12345.67' AS DECIMAL(12,2)) AS dec""".stripMargin)
    val dir = tmp()
    GraftAvro.write(df, dir)
    val file = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head
    val rd = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(java.nio.file.Files.readAllBytes(file.toPath)),
      new GenericDatumReader[GenericRecord]())
    val sch = rd.getSchema
    // a nullable Spark column rides a [null, T] union: annotations live on T
    def nn(s: org.apache.avro.Schema): org.apache.avro.Schema =
      if (s.getType == org.apache.avro.Schema.Type.UNION)
        s.getTypes.stream.filter(_.getType != org.apache.avro.Schema.Type.NULL)
          .findFirst.get
      else s
    assert(LogicalTypes.fromSchema(nn(sch.getField("d").schema())).getName == "date")
    assert(LogicalTypes.fromSchema(nn(sch.getField("ts").schema())).getName == "timestamp-micros")
    val decLt = LogicalTypes.fromSchema(nn(sch.getField("dec").schema()))
      .asInstanceOf[LogicalTypes.Decimal]
    assert(decLt.getPrecision == 12 && decLt.getScale == 2)
    val r = rd.next(); rd.close()
    // underlying wire values, exactly per spec
    assert(r.get("d") == java.time.LocalDate.of(2020, 2, 29).toEpochDay.toInt)
    val wantUs = java.time.LocalDateTime.of(2024, 3, 1, 6, 30, 15, 123456000)
      .toInstant(java.time.ZoneOffset.UTC)
    assert(r.get("ts") == wantUs.getEpochSecond * 1000000L + wantUs.getNano / 1000L)
    val decBytes = r.get("dec").asInstanceOf[java.nio.ByteBuffer]
    val arr = new Array[Byte](decBytes.remaining()); decBytes.get(arr)
    assert(new java.math.BigInteger(arr) == java.math.BigInteger.valueOf(1234567L))
  }

  test("logical types referee: an Apache-written container maps to Spark types") {
    import org.apache.avro.{Schema => ApacheSchema}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schemaJson =
      """{"type":"record","name":"row","fields":[
        |  {"name":"d","type":{"type":"int","logicalType":"date"}},
        |  {"name":"tsm","type":{"type":"long","logicalType":"timestamp-millis"}},
        |  {"name":"dec","type":{"type":"bytes","logicalType":"decimal","precision":10,"scale":3}}
        |]}""".stripMargin
    val sch = new ApacheSchema.Parser().parse(schemaJson)
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
    w.create(sch, out)
    val r = new GenericData.Record(sch)
    r.put("d", 19000) // 2022-01-08
    r.put("tsm", 1700000000123L)
    r.put("dec", java.nio.ByteBuffer.wrap(
      java.math.BigInteger.valueOf(9876543L).toByteArray)) // 9876.543
    w.append(r); w.close()
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "apache.avro"), out.toByteArray)
    val back = GraftAvro.read(spark, dir)
    assert(back.schema == StructType(Seq(
      StructField("d", DateType, nullable = false),
      StructField("tsm", TimestampType, nullable = false),
      StructField("dec", DecimalType(10, 3), nullable = false))))
    val row = back.collect().head
    assert(row.getDate(0) == java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000L)))
    assert(row.getTimestamp(1) == new java.sql.Timestamp(1700000000123L))
    assert(row.getDecimal(2) == new java.math.BigDecimal("9876.543"))
  }

  test("logical-type boundary fuzz: decimals at every byte-length edge, " +
      "pre-epoch/extreme dates + timestamps, referee'd on the wire") {
    import java.math.{BigDecimal => JBD, BigInteger => JBI}
    import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

    // --- decimals: unscaled magnitudes at the two's-complement
    // byte-length boundaries (a hand-rolled minimal encoding gets
    // exactly these wrong), both signs, per (precision, scale) class
    val rnd = new scala.util.Random(20260815L)
    val mags = Seq(BigInt(0), BigInt(1), BigInt(127), BigInt(128), BigInt(129),
      BigInt(255), BigInt(256), BigInt(32767), BigInt(32768),
      BigInt(Int.MaxValue), BigInt(Int.MaxValue) + 1,
      BigInt(Long.MaxValue), BigInt(Long.MaxValue) + 1)
    val psPairs = Seq((1, 0), (3, 1), (5, 2), (9, 9), (18, 0), (18, 6),
      (20, 5), (38, 0), (38, 37))
    val decCols = psPairs.map { case (p, s) =>
      val cap = BigInt(10).pow(p)
      val fixed = mags.filter(_ < cap).flatMap(m => Seq(m, -m))
      val randoms = (0 until 8).map(_ => BigInt(p * 4, rnd) % cap)
      (s"dec_${p}_$s", p, s,
        (fixed ++ randoms).distinct.map(u => new JBD(new JBI(u.toString), s)))
    }
    val nDecRows = decCols.map(_._4.size).max
    val decSchema = StructType(
      StructField("id", IntegerType, nullable = false) +:
        decCols.map { case (n, p, s, _) =>
          StructField(n, DecimalType(p, s), nullable = true) })
    val decRows = (0 until nDecRows).map { i =>
      Row.fromSeq(i +: decCols.map { case (_, _, _, vs) => vs.lift(i).orNull })
    }
    val decDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(decRows).asJava), decSchema)
    val decDir = tmp()
    GraftAvro.write(decDf.coalesce(1), decDir)
    val decBack = GraftAvro.read(spark, decDir)
    assert(decBack.schema == decSchema)
    val sortBoth = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().sortBy(_.getInt(0)).map(_.toSeq).toSeq
    assert(sortBoth(decBack) == sortBoth(decDf))

    // referee: Apache Avro must see the EXACT minimal two's-complement
    // unscaled bytes for every value
    locally {
      import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
      import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
      val file = new java.io.File(decDir).listFiles()
        .filter(_.getName.endsWith(".avro")).head
      val rd = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(java.nio.file.Files.readAllBytes(file.toPath)),
        new GenericDatumReader[GenericRecord]())
      val got = scala.collection.mutable.Map[Int, GenericRecord]()
      while (rd.hasNext) { val r = rd.next(); got(r.get("id").asInstanceOf[Int]) = r }
      rd.close()
      decRows.foreach { row =>
        val r = got(row.getInt(0))
        decCols.zipWithIndex.foreach { case ((name, _, _, _), ci) =>
          val want = row.get(ci + 1)
          val gotV = r.get(name)
          if (want == null) assert(gotV == null, s"$name null")
          else {
            val bb = gotV.asInstanceOf[java.nio.ByteBuffer]
            val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
            val wantUnscaled = want.asInstanceOf[JBD].unscaledValue()
            assert(new JBI(arr) == wantUnscaled, s"$name value")
            assert(arr.toSeq == wantUnscaled.toByteArray.toSeq, s"$name minimal bytes")
          }
        }
      }
    }

    // --- dates and timestamps: year 1 to 9999, both sides of the epoch,
    // Gregorian-cutover week, sub-millisecond micros on negative seconds
    val dates = Seq(LocalDate.of(1, 1, 1), LocalDate.of(1582, 10, 4),
      LocalDate.of(1582, 10, 15), LocalDate.of(1899, 12, 31),
      LocalDate.of(1969, 12, 31), LocalDate.of(1970, 1, 1),
      LocalDate.of(2400, 2, 29), LocalDate.of(9999, 12, 31)) ++
      (0 until 12).map(_ => LocalDate.ofEpochDay(
        rnd.nextLong(LocalDate.of(9999, 12, 31).toEpochDay + 719162L) - 719162L))
    val microsList = Seq(0L, 1L, -1L, 999999L, -999999L, 1000000L, -1000000L,
      -876544L, // 1969-12-31T23:59:59.123456 — fractional micros before epoch
      -62135596800000000L, // 0001-01-01T00:00
      253402300799999999L) ++ // 9999-12-31T23:59:59.999999
      (0 until 12).map(_ => rnd.nextLong(2L * 253402300799999999L) - 253402300799999999L)
    val nTsRows = math.max(dates.size, microsList.size)
    val tsSchema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("d", DateType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("tntz", TimestampNTZType, nullable = true)))
    def instOf(us: Long): Instant =
      Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L)
    val tsRows = (0 until nTsRows).map { i =>
      Row(i,
        dates.lift(i).map(java.sql.Date.valueOf).orNull,
        microsList.lift(i).map(us => java.sql.Timestamp.from(instOf(us))).orNull,
        microsList.lift(i).map(us =>
          LocalDateTime.ofInstant(instOf(us), ZoneOffset.UTC)).orNull)
    }
    val tsDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(tsRows).asJava), tsSchema)
    val tsDir = tmp()
    GraftAvro.write(tsDf.coalesce(1), tsDir)
    val tsBack = GraftAvro.read(spark, tsDir)
    assert(sortBoth(tsBack) == sortBoth(tsDf))

    // referee the wire values: date = proleptic epoch days (int),
    // timestamps = UTC micros (long)
    locally {
      import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
      import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
      val file = new java.io.File(tsDir).listFiles()
        .filter(_.getName.endsWith(".avro")).head
      val rd = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(java.nio.file.Files.readAllBytes(file.toPath)),
        new GenericDatumReader[GenericRecord]())
      val got = scala.collection.mutable.Map[Int, GenericRecord]()
      while (rd.hasNext) { val r = rd.next(); got(r.get("id").asInstanceOf[Int]) = r }
      rd.close()
      (0 until nTsRows).foreach { i =>
        val r = got(i)
        dates.lift(i).foreach(ld =>
          assert(r.get("d") == ld.toEpochDay.toInt, s"row $i date days"))
        microsList.lift(i).foreach { us =>
          assert(r.get("ts") == us, s"row $i timestamp micros")
          assert(r.get("tntz") == us, s"row $i ntz micros")
        }
      }
    }
  }

  test("sink resolves dir through the Hadoop FileSystem (explicit file: URI)") {
    val dir = "file://" + tmp()
    val rows = (0 until 100).map(i => (i.toLong, s"v$i"))
    val files = GraftAvro.write(rows.toDF("k", "v").repartition(2), dir)
    assert(files == 2)
    val back = GraftAvro.read(spark, dir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq == rows)
  }

  test("rewrite of an existing dir replaces the dataset; rename loser drops its temp") {
    val dir = tmp()
    GraftAvro.write(Seq((1L, "old")).toDF("k", "v"), dir)
    // plant a stray temp (a crashed attempt's leftover) and rewrite with
    // different data: the driver pre-clean must clear both, and a
    // duplicate attempt's failed rename must leave no temp behind
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, ".part-00000-0000.avro.99.tmp"), Array[Byte](1, 2, 3))
    GraftAvro.write(Seq((2L, "new"), (3L, "newer")).toDF("k", "v").coalesce(1), dir)
    val back = GraftAvro.read(spark, dir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      == Seq((2L, "new"), (3L, "newer")))
    val names = new java.io.File(dir).listFiles().map(_.getName).filterNot(_.endsWith(".crc"))
    assert(names.forall(n => n.endsWith(".avro")), names.mkString(","))
    // simulate the rename loser directly: dst already committed by the
    // "winner"; the loser's temp must be deleted, dst untouched
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(dir, names.min)
    val before = fs.getFileStatus(dst).getLen
    val tmp2 = new org.apache.hadoop.fs.Path(dir, s".${names.min}.7.tmp")
    val out = fs.create(tmp2, true); out.write(Array[Byte](9, 9)); out.close()
    if (!fs.rename(tmp2, dst)) fs.delete(tmp2, false) // the sink's loser path
    assert(fs.getFileStatus(dst).getLen == before, "committed container was clobbered")
    assert(!fs.exists(tmp2), "loser temp not cleaned up")
  }

  test("schema probe is header-only: a corrupt BODY doesn't stop it (O(header) pin)") {
    val dir = tmp()
    GraftAvro.write(Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderpriority").coalesce(1), dir)
    val file = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head
    val bytes = java.nio.file.Files.readAllBytes(file.toPath)
    assert(bytes.length > 4096, "fixture too small to distinguish header from body")
    // trash everything past the first KB: the header (magic + meta map)
    // survives, every data block is garbage — a probe that touched the
    // body could not succeed, and a full read must now fail
    java.util.Arrays.fill(bytes, 1024, bytes.length, 0x5A.toByte)
    java.nio.file.Files.write(file.toPath, bytes)
    // drop the local FS's client-side checksum shadow (we edited the file
    // behind Hadoop's back; the corrupt BODY is the point of the test)
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val json = GraftAvro.probeSchemaJson(spark.sparkContext.hadoopConfiguration, dir)
    assert(json.contains("o_orderkey"))
    intercept[Throwable](graft.formats.Avro.readContainer(bytes))
  }

  test("schema probe grows past a header larger than the first guess") {
    // 6000 long fields ≈ a 200 KB schema JSON — the 64 KB first guess
    // must fail loudly (bounds-checked reader) and retry with more bytes
    val fields = (0 until 6000).map(i =>
      s"""{"name":"really_quite_a_long_field_name_$i","type":"long"}""").mkString(",")
    val json = s"""{"type":"record","name":"wide","fields":[$fields]}"""
    val rec = (0 until 6000).map(i => s"really_quite_a_long_field_name_$i" -> (i.toLong: Any)).toMap
    val bytes = graft.formats.Avro.writeContainer(json, Seq(rec))
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "wide.avro"), bytes)
    val got = GraftAvro.probeSchemaJson(spark.sparkContext.hadoopConfiguration, dir)
    assert(got.contains("really_quite_a_long_field_name_5999"))
  }

  test("envelope refusals: interval / non-string map keys, mixed-schema dir, empty dir") {
    val iv = spark.sql("SELECT INTERVAL '3' DAY AS i")
    val e1 = intercept[IllegalArgumentException](GraftAvro.write(iv, tmp()))
    assert(e1.getMessage.contains("unsupported type") && e1.getMessage.contains("$.i"))
    val badMap = spark.sql("SELECT map(1, 'x') AS m")
    intercept[IllegalArgumentException](GraftAvro.write(badMap, tmp()))
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
