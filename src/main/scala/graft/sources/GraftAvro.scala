package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
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
  *    EXECUTORS through the Hadoop `FileSystem` resolved from `dir`
  *    (the same [[graft.tables.MetaIO]] discipline every metadata write
  *    uses) — so `dir` can be any shared-storage URI and a 1000-executor
  *    write lands ONE dataset, not per-machine fragments on local disks.
  *  - read: the directory is listed through Spark's `binaryFile` source
  *    with ONE root path + `pathGlobFilter` (the m09 listing lesson: a
  *    per-file glob turns planning into one stat task per file), files
  *    decode in parallel on executors, and the driver pays only a
  *    HEADER-ONLY schema probe — an FS `open` of the first container's
  *    LEADING BYTES (retried with a longer prefix if the header overruns
  *    it), never the file body.
  *
  * Type envelope (refuses loudly outside it): boolean / int / long /
  * float / double / string / binary / date / timestamp / decimal /
  * array / map (string keys) / nested struct, each nullable via the
  * Avro `[null, T]` union. Date / timestamp / decimal ride the PUBLIC
  * Avro logical-type annotations (`date` over int days, `timestamp-
  * micros` over long — `timestamp-millis` accepted on read — and
  * `decimal` over bytes/fixed two's-complement big-endian unscaled
  * values), so containers from any stock Avro writer map to the same
  * Spark types they'd get from `spark-avro`.
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
      case DateType => """{"type":"int","logicalType":"date"}"""
      case TimestampType => """{"type":"long","logicalType":"timestamp-micros"}"""
      case TimestampNTZType => """{"type":"long","logicalType":"local-timestamp-micros"}"""
      case dec: DecimalType =>
        s"""{"type":"bytes","logicalType":"decimal","precision":${dec.precision},"scale":${dec.scale}}"""
      case ArrayType(et, containsNull) =>
        val inner = typ(et, s"$path[]", nameHint + "_item")
        val items = if (containsNull) s"""["null",$inner]""" else inner
        s"""{"type":"array","items":$items}"""
      case MapType(StringType, vt, valueContainsNull) =>
        val inner = typ(vt, s"$path{}", nameHint + "_value")
        val values = if (valueContainsNull) s"""["null",$inner]""" else inner
        s"""{"type":"map","values":$values}"""
      case st: StructType =>
        record(st, nameHint, path)
      case other => throw new IllegalArgumentException(
        s"GraftAvro: unsupported type $other at $path — " +
          "envelope: boolean/int/long/float/double/string/binary/date/timestamp/" +
          "decimal/array/map(string keys)/struct")
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

  private def unwrapUnion(s: Avro.Schema): (Avro.Schema, Boolean) = s match {
    case Avro.AUnion(bs) =>
      val nonNull = bs.filterNot(_ == Avro.ANull)
      require(nonNull.size == 1,
        s"GraftAvro: only [null, T] unions are readable, got $bs")
      (nonNull.head, nonNull.size != bs.size)
    case other => (other, false)
  }

  /** Avro schema AST → Spark schema (the read-side inverse). */
  def sparkSchema(schemaJson: String): StructType =
    Avro.parseSchema(schemaJson) match {
      case r: Avro.ARecord => sparkSchemaOf(r)
      case other => throw new IllegalArgumentException(
        s"GraftAvro: top-level schema must be a record, got $other")
    }

  def sparkSchemaOf(rec: Avro.ARecord): StructType = {
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
      case Avro.ALogical("date", _, _, _) => DateType
      case Avro.ALogical("timestamp-micros" | "timestamp-millis", _, _, _) => TimestampType
      case Avro.ALogical("local-timestamp-micros" | "local-timestamp-millis", _, _, _) =>
        TimestampNTZType
      case Avro.ALogical("decimal", p, sc, _) => DecimalType(p, sc)
      case Avro.AArray(items) =>
        val (it, nullable) = unwrapUnion(items)
        ArrayType(dataType(it), containsNull = nullable)
      case Avro.AMap(values) =>
        val (vt, nullable) = unwrapUnion(values)
        MapType(StringType, dataType(vt), valueContainsNull = nullable)
      case r: Avro.ARecord => struct(r)
      case other => throw new IllegalArgumentException(
        s"GraftAvro: unsupported Avro type $other")
    }
    def struct(r: Avro.ARecord): StructType =
      StructType(r.fields.map { f =>
        val (t, nullable) = unwrapUnion(f.schema)
        StructField(f.name, dataType(t), nullable = nullable)
      })
    struct(rec)
  }

  // ------------------------------------------------- value conversions

  /** Spark external value → the Avro underlying representation (logical
    * types encode per spec: date = epoch days, timestamp = UTC micros,
    * decimal = exact-scale unscaled value as the codec's bytes).
    */
  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: Row, st: StructType) => rowToMap(r, st)
    case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
      s.map(toAvroValue(_, et)).toSeq
    case (m: scala.collection.Map[_, _], MapType(StringType, vt, _)) =>
      m.map { case (k, x) => k.asInstanceOf[String] -> toAvroValue(x, vt) }.toMap
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
    case (t: java.sql.Timestamp, TimestampType) =>
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    case (t: java.time.Instant, TimestampType) =>
      Math.addExact(Math.multiplyExact(t.getEpochSecond, 1000000L), t.getNano / 1000L)
    case (t: java.time.LocalDateTime, TimestampNTZType) =>
      Math.addExact(Math.multiplyExact(
        t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L), t.getNano / 1000L)
    case (d: java.math.BigDecimal, dec: DecimalType) =>
      // setScale with no rounding mode: a value that doesn't FIT the
      // declared scale refuses instead of silently rounding
      d.setScale(dec.scale).unscaledValue().toByteArray
    case (d: BigDecimal, dec: DecimalType) =>
      d.underlying().setScale(dec.scale).unscaledValue().toByteArray
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

  /** Decoded Avro value → Spark external value, driven by the AVRO
    * schema (the millis/micros distinction lives there, not in the
    * Spark type).
    */
  private def fromAvroValue(v: Any, s: Avro.Schema): Any = {
    if (v == null) return null
    s match {
      case Avro.AUnion(_) =>
        val (inner, _) = unwrapUnion(s)
        fromAvroValue(v, inner)
      case Avro.ALogical("date", _, _, _) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay((v.asInstanceOf[Int]).toLong))
      case Avro.ALogical("timestamp-micros", _, _, _) =>
        val us = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case Avro.ALogical("timestamp-millis", _, _, _) =>
        new java.sql.Timestamp(v.asInstanceOf[Long])
      case Avro.ALogical("local-timestamp-micros", _, _, _) =>
        val us = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case Avro.ALogical("local-timestamp-millis", _, _, _) =>
        val ms = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(ms, 1000L),
          (Math.floorMod(ms, 1000L) * 1000000L).toInt, java.time.ZoneOffset.UTC)
      case Avro.ALogical("decimal", _, scale, _) =>
        new java.math.BigDecimal(
          new java.math.BigInteger(v.asInstanceOf[Array[Byte]]), scale)
      case r: Avro.ARecord => mapToRow(v.asInstanceOf[Map[String, Any]], r)
      case Avro.AArray(items) => v.asInstanceOf[Seq[Any]].map(fromAvroValue(_, items))
      case Avro.AMap(values) =>
        v.asInstanceOf[Map[String, Any]].map { case (k, x) => k -> fromAvroValue(x, values) }
      case _ => v
    }
  }

  private def mapToRow(m: Map[String, Any], rec: Avro.ARecord): Row =
    Row.fromSeq(rec.fields.toSeq.map(f => fromAvroValue(m.getOrElse(f.name, null), f.schema)))

  // ------------------------------------------------------------- sink

  /** Write `df` as Avro object-container files under `dir`, one file per
    * (partition, chunk of `recordsPerFile`). Returns the file count.
    * Container bytes go through the Hadoop `FileSystem` RESOLVED FROM
    * `dir` on each executor (not `java.nio` local paths), so the sink
    * writes one shared dataset on a real cluster — any Hadoop-resolvable
    * URI works. OVERWRITE semantics: the driver clears any previous
    * `*.avro` dataset (and stray temps) once before tasks run; each task
    * then writes a dot-prefixed temp and renames, so a racing duplicate
    * attempt can only ever lose to a same-job twin carrying IDENTICAL
    * bytes (the writer is deterministic) — the loser deletes its temp
    * and a committed container is never truncated in place, even where
    * rename isn't atomic (object stores): both candidates are the same
    * bytes.
    */
  def write(df: DataFrame, dir: String, recordsPerFile: Int = 65536,
      codec: String = "deflate"): Long = {
    require(recordsPerFile > 0, "recordsPerFile must be positive")
    val schema = df.schema
    val schemaJson = avroSchemaJson(schema) // validates the envelope up front
    val sc = df.sparkSession.sparkContext
    Avro.parseSchema(schemaJson) // fail on the driver, not per-task
    val fs0 = new Path(dir).getFileSystem(sc.hadoopConfiguration)
    fs0.mkdirs(new Path(dir))
    // overwrite semantics live on the DRIVER: clear any previous
    // dataset (and stray temps) once, before tasks run — task-level
    // rename then only ever loses to a same-job duplicate attempt
    // carrying identical bytes, never to a stale file
    Option(fs0.globStatus(new Path(dir, "*.avro")))
      .foreach(_.foreach(f => fs0.delete(f.getPath, false)))
    Option(fs0.globStatus(new Path(dir, ".*.avro.*.tmp")))
      .foreach(_.foreach(f => fs0.delete(f.getPath, false)))
    val confB = sc.broadcast(new SerializableHadoopConf(sc.hadoopConfiguration))
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val fs = new Path(dir).getFileSystem(confB.value.value)
      // write-then-rename commit: speculative or zombie duplicate attempts
      // must never truncate a committed container in place, so each
      // attempt writes a dot-prefixed temp (invisible to the `*.avro`
      // glob AND to Spark's source, which skips dot-files) and renames;
      // the rename loser — same deterministic bytes — deletes its temp
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      var chunk = 0
      var written = 0L
      rows.grouped(recordsPerFile).foreach { group =>
        val records = group.map(rowToMap(_, schema))
        val bytes = Avro.writeContainer(schemaJson, records,
          codec = codec, syncSalt = s"$pid-$chunk")
        val dst = new Path(dir, f"part-$pid%05d-$chunk%04d.avro")
        val tmp = new Path(dir, f".part-$pid%05d-$chunk%04d.avro.$attempt%d.tmp")
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        if (!fs.rename(tmp, dst)) fs.delete(tmp, false)
        chunk += 1
        written += 1
      }
      Iterator.single(written)
    }.sum().toLong
  }

  // ----------------------------------------------------------- source

  /** Header-only schema probe: open the lexicographically-first `*.avro`
    * container under `dir` and read its LEADING bytes — retrying with a
    * 4× longer prefix when the header overruns the guess (the codec's
    * bounds-checked reader refuses truncated data loudly, so a short
    * read can never mis-parse). The driver pays O(header), not the file.
    */
  def probeSchemaJson(conf: Configuration, dir: String): String = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.globStatus(new Path(root, "*.avro"))
    require(files != null && files.nonEmpty, s"GraftAvro: no .avro files under $dir")
    val first = files.minBy(_.getPath.getName)
    val fileLen = first.getLen
    var guess = 64L * 1024
    while (true) {
      val n = math.min(fileLen, guess).toInt
      val buf = new Array[Byte](n)
      val in = fs.open(first.getPath)
      try in.readFully(0L, buf) finally in.close()
      try return Avro.readSchemaJson(buf)
      catch {
        case e: Exception =>
          if (n.toLong >= fileLen) throw new IllegalArgumentException(
            s"GraftAvro: ${first.getPath} is not a readable Avro container", e)
          guess *= 4
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Read an EXPLICIT path list under a required schema — the table-scan
    * entry point ([[graft.tables.ColumnMapping.readFiles]]), where the
    * MANIFEST owns the file set, not a directory glob. Every file's
    * spark-mapped field (name, type) sequence must equal `schema` (the
    * table's physical schema): `add_files` checked that contract at
    * registration; this re-checks per read so a swapped file fails loud.
    */
  def readPaths(spark: SparkSession, schema: StructType,
      paths: Seq[String], rowMeta: Boolean = false): DataFrame = {
    val bin = spark.read.format("binaryFile").load(paths: _*)
      .select("path", "content")
    val want = schema.fields.toSeq.map(f => (f.name, f.dataType))
    val rdd = bin.rdd.flatMap { r =>
      val path = r.getString(0)
      val c = Avro.readContainer(r.getAs[Array[Byte]](1))
      val rec = Avro.parseSchema(c.schemaJson) match {
        case rec: Avro.ARecord => rec
        case other => throw new IllegalArgumentException(
          s"GraftAvro: $path top-level schema must be a record, got $other")
      }
      val st = sparkSchemaOf(rec)
      require(st.fields.toSeq.map(f => (f.name, f.dataType)) == want,
        s"GraftAvro: $path schema $st differs from the table schema $schema")
      if (!rowMeta) c.records.iterator.map(mapToRow(_, rec))
      else c.records.iterator.zipWithIndex.map { case (m, i) =>
        // the parquet scan's (_metadata.file_path, row_index) equivalent:
        // container path + record position within it
        Row.fromSeq(mapToRow(m, rec).toSeq :+ path :+ i.toLong)
      }
    }
    val outSchema =
      if (!rowMeta) schema
      else StructType(schema.fields :+
        StructField(graft.tables.ScanPlanner.RowMetaFile, StringType) :+
        StructField(graft.tables.ScanPlanner.RowMetaPos, LongType))
    spark.createDataFrame(rdd, outSchema)
  }

  /** Read every `*.avro` container under `dir` as one DataFrame. All
    * files must carry the same schema (a mixed directory refuses with
    * the offending path).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val schemaJson = probeSchemaJson(spark.sparkContext.hadoopConfiguration, dir)
    val schema = sparkSchema(schemaJson)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .load(dir)
      .select("path", "content")
    val rdd = bin.rdd.flatMap { r =>
      val path = r.getString(0)
      val c = Avro.readContainer(r.getAs[Array[Byte]](1))
      // parse the file's schema ONCE; Spark-schema equality is the
      // compatibility contract (a millis- and a micros-stamped file may
      // legally mix: each decodes with its OWN Avro schema below)
      val rec = Avro.parseSchema(c.schemaJson) match {
        case rec: Avro.ARecord => rec
        case other => throw new IllegalArgumentException(
          s"GraftAvro: $path top-level schema must be a record, got $other")
      }
      val st = sparkSchemaOf(rec)
      require(st == schema,
        s"GraftAvro: $path schema $st differs from the directory schema $schema")
      c.records.map(mapToRow(_, rec))
    }
    spark.createDataFrame(rdd, schema)
  }
}
