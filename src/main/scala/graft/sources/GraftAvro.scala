package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.formats.Avro

/** DataFrame-level Avro source/sink over the from-scratch
  * [[graft.formats.Avro]] codec. Spark's own `avro` format is an external
  * module this environment doesn't ship, so this is the path by which an
  * Avro corpus enters the engine at all — and it follows the engine's
  * scale shapes rather than a driver loop:
  *
  *  - write: one container file per (partition, chunk), written BY THE
  *    EXECUTORS in `mapPartitions` (the embarrassingly-parallel fixture
  *    shape m09 uses; a real deployment points `dir` at shared storage).
  *  - read: the directory is listed through Spark's `binaryFile` source
  *    with ONE root path + `pathGlobFilter` (the m09 listing lesson: a
  *    per-file glob turns planning into one stat task per file), files
  *    decode in parallel on executors, and the driver pays only a
  *    HEADER-ONLY schema probe of one file ([[Avro.readSchemaJson]]).
  *
  * Type envelope (refuses loudly outside it): boolean / int / long /
  * float / double / string / binary / array / nested struct, each
  * nullable via the Avro `[null, T]` union. Decimal, date, timestamp and
  * map stay out — their Avro logical-type encodings have divergent
  * reader conventions; cast upstream (the gate stores money as integer
  * cents for exactly this reason).
  */
object GraftAvro {

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Spark schema → Avro record schema JSON (nullable fields become
    * `[null, T]` unions, matching what every Avro writer emits).
    */
  def avroSchemaJson(schema: StructType, recordName: String = "row"): String = {
    def typ(dt: DataType, path: String, nameHint: String): String = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case ArrayType(et, containsNull) =>
        val inner = typ(et, s"$path[]", nameHint + "_item")
        val items = if (containsNull) s"""["null",$inner]""" else inner
        s"""{"type":"array","items":$items}"""
      case st: StructType =>
        record(st, nameHint, path)
      case other => throw new IllegalArgumentException(
        s"GraftAvro: unsupported type $other at $path — " +
          "cast decimals/dates/timestamps upstream (envelope: boolean/int/long/float/double/string/binary/array/struct)")
    }
    def record(st: StructType, name: String, path: String): String = {
      val fields = st.fields.map { f =>
        val t = typ(f.dataType, s"$path.${f.name}", s"${name}_${f.name}")
        val full = if (f.nullable) s"""["null",$t]""" else t
        s"""{"name":${jsonStr(f.name)},"type":$full}"""
      }
      s"""{"type":"record","name":${jsonStr(name)},"fields":[${fields.mkString(",")}]}"""
    }
    record(schema, recordName, "$")
  }

  /** Avro schema AST → Spark schema (the read-side inverse). */
  def sparkSchema(schemaJson: String): StructType = {
    def unwrap(s: Avro.Schema): (Avro.Schema, Boolean) = s match {
      case Avro.AUnion(bs) =>
        val nonNull = bs.filterNot(_ == Avro.ANull)
        require(nonNull.size == 1,
          s"GraftAvro: only [null, T] unions are readable, got $bs")
        (nonNull.head, nonNull.size != bs.size)
      case other => (other, false)
    }
    def dataType(s: Avro.Schema): DataType = s match {
      case Avro.ABoolean => BooleanType
      case Avro.AInt => IntegerType
      case Avro.ALong => LongType
      case Avro.AFloat => FloatType
      case Avro.ADouble => DoubleType
      case Avro.AString => StringType
      case Avro.ABytes => BinaryType
      case Avro.AFixed(_, _) => BinaryType
      case Avro.AEnum(_, _) => StringType
      case Avro.AArray(items) =>
        val (it, nullable) = unwrap(items)
        ArrayType(dataType(it), containsNull = nullable)
      case r: Avro.ARecord => struct(r)
      case other => throw new IllegalArgumentException(
        s"GraftAvro: unsupported Avro type $other")
    }
    def struct(r: Avro.ARecord): StructType =
      StructType(r.fields.map { f =>
        val (t, nullable) = unwrap(f.schema)
        StructField(f.name, dataType(t), nullable = nullable)
      })
    Avro.parseSchema(schemaJson) match {
      case r: Avro.ARecord => struct(r)
      case other => throw new IllegalArgumentException(
        s"GraftAvro: top-level schema must be a record, got $other")
    }
  }

  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: Row, st: StructType) => rowToMap(r, st)
    case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
      s.map(toAvroValue(_, et)).toSeq
    case (x, _) => x
  }

  private def rowToMap(r: Row, schema: StructType): Map[String, Any] = {
    val b = Map.newBuilder[String, Any]
    var i = 0
    while (i < schema.length) {
      b += schema(i).name -> toAvroValue(r.get(i), schema(i).dataType)
      i += 1
    }
    b.result()
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (m: Map[_, _], st: StructType) => mapToRow(m.asInstanceOf[Map[String, Any]], st)
    case (s: Seq[_], ArrayType(et, _)) => s.map(fromAvroValue(_, et))
    case (x, _) => x
  }

  private def mapToRow(m: Map[String, Any], schema: StructType): Row =
    Row.fromSeq(schema.fields.toSeq.map(f => fromAvroValue(m.getOrElse(f.name, null), f.dataType)))

  /** Write `df` as Avro object-container files under `dir`, one file per
    * (partition, chunk of `recordsPerFile`). Returns the file count.
    */
  def write(df: DataFrame, dir: String, recordsPerFile: Int = 65536,
      codec: String = "deflate"): Long = {
    require(recordsPerFile > 0, "recordsPerFile must be positive")
    val schema = df.schema
    val schemaJson = avroSchemaJson(schema) // validates the envelope up front
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var chunk = 0
      var written = 0L
      rows.grouped(recordsPerFile).foreach { group =>
        val records = group.map(rowToMap(_, schema))
        val bytes = Avro.writeContainer(schemaJson, records,
          codec = codec, syncSalt = s"$pid-$chunk")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, f"part-$pid%05d-$chunk%04d.avro"), bytes)
        chunk += 1
        written += 1
      }
      Iterator.single(written)
    }.sum().toLong
  }

  /** Read every `*.avro` container under `dir` as one DataFrame. All
    * files must carry the same schema (a mixed directory refuses with
    * the offending path).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .load(dir)
      .select("path", "content")
    val first = bin.select("content").limit(1).collect()
    require(first.nonEmpty, s"GraftAvro: no .avro files under $dir")
    val schemaJson = Avro.readSchemaJson(first(0).getAs[Array[Byte]](0))
    val schema = sparkSchema(schemaJson)
    val rdd = bin.rdd.flatMap { r =>
      val path = r.getString(0)
      val c = Avro.readContainer(r.getAs[Array[Byte]](1))
      val st = sparkSchema(c.schemaJson)
      require(st == schema,
        s"GraftAvro: $path schema $st differs from the directory schema $schema")
      c.records.map(mapToRow(_, schema))
    }
    spark.createDataFrame(rdd, schema)
  }
}
