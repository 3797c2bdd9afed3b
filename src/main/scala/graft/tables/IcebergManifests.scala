package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._

import graft.formats.Avro

/** Translator between graft's JSON manifests and REAL Iceberg v1 binary
  * Avro manifests (written/read with the from-scratch [[graft.formats
  * .Avro]] codec — no Iceberg/Avro jars). This is the piece that closes
  * the r10 interop boundary (reference pyspark-iceberg/
  * interoperability.md:55-113: external engines exchange tables whose
  * manifests are Avro, not JSON): export emits manifest lists +
  * manifests an actual Iceberg reader scans; import consumes tables an
  * actual Iceberg writer produced.
  *
  * Structure maps 1:1: graft's immutable child manifests become Avro
  * manifest files (entry status `added`, `snapshot_id` = the file's data
  * sequence number, so per-file add-history survives the round trip) and
  * each snapshot's manifest list becomes a `snap-*.avro` manifest list
  * referencing every live child — the same O(changed-files) commit shape
  * Iceberg itself uses.
  *
  * Semantics, DECLARED loudly rather than silently drifted:
  *  - graft `years`/`months` transform values are calendar-absolute
  *    (2024, 24292); Iceberg's are epoch-relative (54, 652). Values are
  *    SHIFTED to Iceberg semantics on export and shifted back on import
  *    — pure arithmetic, keyed by the spec's transform name.
  *  - graft `bucket[N]` uses xxhash64; Iceberg mandates murmur3_x86_32.
  *    The numbers are NOT convertible, and exporting graft bucket values
  *    under an Iceberg `bucket[N]` spec would make a real reader prune
  *    WRONG files. Bucket fields export as the spec-legal `void`
  *    transform (never prunes, always correct) with the true transform
  *    riding a `graft-transform` key for graft's own round trip; their
  *    per-file values are dropped (graft never prunes bucket literals —
  *    ScanPlanner.bucketValue — so nothing is lost on re-import).
  *  - merge-on-read payloads (predicate/position/equality deletes,
  *    deletion vectors) have no v1 representation. Snapshots carrying
  *    them are EXCLUDED from a binary export (declared via
  *    `graft.omitted-snapshots`); a current snapshot carrying them
  *    refuses with "materializeDeletes() first".
  *  - v1 has no per-entry sequence numbers; `snapshot_id` carries
  *    graft's data sequence number instead (Iceberg readers treat it as
  *    the adding snapshot — the same meaning).
  */
object IcebergManifests {
  private val mapper = new ObjectMapper()

  // ------------------------------------------------------- Avro schemas

  /** Iceberg v1 `manifest_file` schema (manifest-list rows), field-ids
    * per the public table spec.
    */
  val manifestListSchemaJson: String = {
    val root = mapper.createObjectNode()
    root.put("type", "record"); root.put("name", "manifest_file")
    val fs = root.putArray("fields")
    def f(name: String, fieldId: Int, opt: Boolean, tpe: String): Unit = {
      val o = fs.addObject()
      o.put("name", name); o.put("field-id", fieldId)
      if (opt) { o.putArray("type").add("null").add(tpe); o.putNull("default"); () }
      else { o.put("type", tpe); () }
    }
    f("manifest_path", 500, opt = false, "string")
    f("manifest_length", 501, opt = false, "long")
    f("partition_spec_id", 502, opt = false, "int")
    f("added_snapshot_id", 503, opt = true, "long")
    f("added_data_files_count", 504, opt = true, "int")
    f("existing_data_files_count", 505, opt = true, "int")
    f("deleted_data_files_count", 506, opt = true, "int")
    f("added_rows_count", 512, opt = true, "long")
    f("existing_rows_count", 513, opt = true, "long")
    f("deleted_rows_count", 514, opt = true, "long")
    mapper.writeValueAsString(root)
  }

  /** Avro type node for one partition field under a spec (the r102
    * member types): date-ish transforms and bucket are int, identity/
    * truncate follow the source type. Unsupported combinations refuse
    * loudly — a silently-wrong typed value would poison foreign pruning.
    */
  private def partitionAvroType(transform: String, source: DataType): Any =
    transform match {
      case "years" | "months" | "days" | "hours" => "int"
      case t if t.startsWith("bucket[") => "int" // exported as void; value null
      case _ => source match { // identity / truncate[W]
        case StringType              => "string"
        case LongType                => "long"
        case IntegerType | ShortType => "int"
        case DoubleType              => "double"
        case FloatType               => "float"
        case BooleanType             => "boolean"
        case DateType =>
          val o = mapper.createObjectNode()
          o.put("type", "int"); o.put("logicalType", "date"); o
        case other => throw new IllegalArgumentException(
          s"binary export: no Iceberg partition mapping for $transform($other) — " +
            "use the JSON export for this table")
      }
    }

  /** Iceberg v1 `manifest_entry` schema for one partition spec. */
  def manifestEntrySchemaJson(spec: PartitionSpec, schema: StructType): String = {
    val root = mapper.createObjectNode()
    root.put("type", "record"); root.put("name", "manifest_entry")
    val fs = root.putArray("fields")
    val status = fs.addObject()
    status.put("name", "status"); status.put("type", "int"); status.put("field-id", 0)
    val snapId = fs.addObject()
    snapId.put("name", "snapshot_id"); snapId.put("field-id", 1)
    snapId.putArray("type").add("null").add("long"); snapId.putNull("default")
    val df = fs.addObject()
    df.put("name", "data_file"); df.put("field-id", 2)
    val r2 = df.putObject("type")
    r2.put("type", "record"); r2.put("name", "r2")
    val dfs = r2.putArray("fields")
    def prim(name: String, fieldId: Int, tpe: String): Unit = {
      val o = dfs.addObject()
      o.put("name", name); o.put("type", tpe); o.put("field-id", fieldId); ()
    }
    prim("file_path", 100, "string")
    prim("file_format", 101, "string")
    val part = dfs.addObject()
    part.put("name", "partition"); part.put("field-id", 102)
    val r102 = part.putObject("type")
    r102.put("type", "record"); r102.put("name", "r102")
    val pfs = r102.putArray("fields")
    val physSchema = ColumnMapping.physicalSchema(schema)
    // historical specs may reference since-dropped source columns (the
    // drop guard only protects the CURRENT spec) — such fields are
    // OMITTED here exactly as metadataJson omits them from the document
    // (graft-omitted-fields); field-ids keep their positional numbering
    // so the surviving fields agree with the document's spec JSON
    resolvableFields(spec, physSchema).foreach { case (f, i) =>
      val o = pfs.addObject()
      o.put("name", f.name)
      o.put("field-id", 1000 + i)
      val u = o.putArray("type")
      u.add("null")
      partitionAvroType(f.transform, physSchema(f.source).dataType) match {
        case s: String     => u.add(s); ()
        case n: ObjectNode => u.add(n); ()
      }
      o.putNull("default")
      ()
    }
    prim("record_count", 103, "long")
    prim("file_size_in_bytes", 104, "long")
    prim("block_size_in_bytes", 105, "long") // v1 required; historical field
    // optional stat maps (Iceberg's int-keyed maps are arrays of
    // key_value records with logicalType "map")
    def intKeyedMap(name: String, fieldId: Int, kId: Int, vId: Int,
        valueType: String): Unit = {
      val o = dfs.addObject()
      o.put("name", name); o.put("field-id", fieldId)
      val u = o.putArray("type")
      u.add("null")
      val arr = mapper.createObjectNode()
      arr.put("type", "array"); arr.put("logicalType", "map")
      val kv = arr.putObject("items")
      kv.put("type", "record"); kv.put("name", s"k${kId}_v$vId")
      val kvf = kv.putArray("fields")
      val ko = kvf.addObject()
      ko.put("name", "key"); ko.put("type", "int"); ko.put("field-id", kId)
      val vo = kvf.addObject()
      vo.put("name", "value"); vo.put("type", valueType); vo.put("field-id", vId)
      u.add(arr)
      o.putNull("default")
      ()
    }
    intKeyedMap("null_value_counts", 110, 121, 122, "long")
    intKeyedMap("lower_bounds", 125, 126, 127, "bytes")
    intKeyedMap("upper_bounds", 128, 129, 130, "bytes")
    mapper.writeValueAsString(root)
  }

  /** Spec fields whose source column still exists in the schema, with
    * their ORIGINAL positional index (field-id stability across
    * omissions). A historical spec that references a dropped column
    * exports without that field — declared, never a crash or a bogus id
    * (the r11 review finding mirroring ADVICE r10's metadataJson fix).
    */
  private def resolvableFields(spec: PartitionSpec,
      physSchema: StructType): Seq[(PartitionField, Int)] =
    spec.fields.zipWithIndex.filter { case (f, _) =>
      physSchema.fieldNames.contains(f.source)
    }

  // ------------------------------------- partition value conversion

  private val HiveNull = "__HIVE_DEFAULT_PARTITION__"
  private val MonthsEpochShift = 1970 * 12

  /** graft partition string → typed Iceberg avro value (export). */
  private[tables] def partitionValueOut(transform: String, source: DataType,
      v: String): Any = {
    if (v == null || v == HiveNull) return null
    transform match {
      case "years"  => v.toInt - 1970
      case "months" => v.toInt - MonthsEpochShift
      case "days" | "hours" => v.toInt
      case t if t.startsWith("bucket[") => null // void: never prunes
      case _ => source match {
        case StringType              => v
        case LongType                => v.toLong
        case IntegerType | ShortType => v.toInt
        case DoubleType              => v.toDouble
        case FloatType               => v.toFloat
        case BooleanType             => v.toBoolean
        case DateType => java.time.LocalDate.parse(v).toEpochDay.toInt
        case other => throw new IllegalArgumentException(
          s"binary export: unsupported partition value type $other")
      }
    }
  }

  /** typed Iceberg avro value → graft partition string (import). */
  private[tables] def partitionValueIn(transform: String, source: DataType,
      v: Any): Option[String] = {
    if (v == null) return None
    Some(transform match {
      case "years"  => (v.asInstanceOf[Int] + 1970).toString
      case "months" => (v.asInstanceOf[Int] + MonthsEpochShift).toString
      case "days" | "hours" => v.toString
      case _ => source match {
        case DateType =>
          java.time.LocalDate.ofEpochDay(numLong(v)).toString
        case _ => v.toString // string/long/int/double/float/boolean all
                             // render as Spark's cast-to-string does
      }
    })
  }

  private def numLong(v: Any): Long = v match {
    case i: Int => i.toLong; case l: Long => l
    case other => throw new IllegalArgumentException(s"not an integer: $other")
  }

  // ------------------------------------------- bound value serialization

  /** Iceberg single-value binary serialization of a graft stat value
    * (Long/Double/String/Boolean, dates as epoch days, timestamps as
    * epoch micros) for a column of Spark type `dt`. None = this type
    * doesn't serialize (skip the bound, pruning stays conservative).
    */
  private[tables] def boundOut(dt: DataType, v: Any): Option[Array[Byte]] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    (dt, v) match {
      case (LongType, l: Long)    => Some(le(8).putLong(l).array())
      case (IntegerType | ShortType, l: Long) => Some(le(4).putInt(l.toInt).array())
      case (DateType, l: Long)    => Some(le(4).putInt(l.toInt).array())
      case (TimestampType | TimestampNTZType, l: Long) => Some(le(8).putLong(l).array())
      case (DoubleType, d: Double) => Some(le(8).putDouble(d).array())
      case (FloatType, d: Double) => Some(le(4).putFloat(d.toFloat).array())
      case (StringType, s: String) => Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (BooleanType, b: Boolean) => Some(Array[Byte](if (b) 1 else 0))
      case _ => None
    }
  }

  /** Inverse of [[boundOut]] (import). */
  private[tables] def boundIn(dt: DataType, b: Array[Byte]): Option[Any] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    dt match {
      case LongType if b.length == 8 => Some(le.getLong)
      case IntegerType | ShortType if b.length == 4 => Some(le.getInt.toLong)
      case DateType if b.length == 4 => Some(le.getInt.toLong)
      case TimestampType | TimestampNTZType if b.length == 8 => Some(le.getLong)
      case DoubleType if b.length == 8 => Some(le.getDouble)
      case FloatType if b.length == 4 => Some(le.getFloat.toDouble)
      case StringType =>
        Some(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      case BooleanType if b.length == 1 => Some(b(0) != 0)
      case _ => None
    }
  }

  // ------------------------------------------------------------- export

  /** Result of a binary manifest export: per-snapshot absolute
    * manifest-list paths, and the snapshot ids that could NOT be
    * represented (merge-on-read payloads pending at that snapshot).
    */
  case class ExportedManifests(listPathBySnapshot: Map[Long, String],
      omittedSnapshots: Seq[Long], dir: String)

  /** Write real Iceberg v1 Avro manifests + manifest lists for every
    * representable snapshot of `t` into `outDir`. `topFieldIds` is the
    * exporting document's logical-name → field-id map (bounds are keyed
    * by field id).
    */
  def exportManifests(t: GraftTable, outDir: String,
      topFieldIds: Map[String, Int]): ExportedManifests = {
    val m = t.meta
    val conf = t.spark.sparkContext.hadoopConfiguration
    val physSchema = ColumnMapping.physicalSchema(m.schema)
    val physToLogical = m.schema.fields.map(f =>
      ColumnMapping.physicalOf(m.schema, f.name) -> f.name).toMap
    val specById = m.specs.map(s => s.specId -> s).toMap
    // child manifest (name, specId) → (avro path, length, fileCount, rowCount)
    val translated = scala.collection.mutable.Map.empty[(String, Int), (String, Long, Int, Long)]

    def translateChild(name: String, specId: Int, files: Seq[DataFile]): (String, Long, Int, Long) =
      translated.getOrElseUpdate((name, specId), {
        val spec = specById.getOrElse(specId,
          throw new IllegalStateException(s"data file references unknown spec $specId"))
        val schemaJson = manifestEntrySchemaJson(spec, m.schema)
        val liveFields = resolvableFields(spec, physSchema).map(_._1)
        val records = files.map { f =>
          val partition: Map[String, Any] = liveFields.map { pf =>
            pf.name -> partitionValueOut(pf.transform,
              physSchema(pf.source).dataType,
              f.partitionValues.getOrElse(pf.name, null))
          }.toMap
          val boundsFor = (pick: ColStats => Option[Any]) =>
            if (!f.trustedBounds) null
            else {
              val kvs = f.stats.toSeq.flatMap { case (phys, st) =>
                for {
                  logical <- physToLogical.get(phys)
                  id <- topFieldIds.get(logical)
                  v <- pick(st)
                  b <- boundOut(physSchema(phys).dataType, v)
                } yield Map("key" -> id, "value" -> b)
              }.sortBy(_("key").asInstanceOf[Int])
              if (kvs.isEmpty) null else kvs
            }
          val nullCounts = {
            val kvs = f.stats.toSeq.flatMap { case (phys, st) =>
              for {
                logical <- physToLogical.get(phys)
                id <- topFieldIds.get(logical)
              } yield Map("key" -> id, "value" -> st.nullCount)
            }.sortBy(_("key").asInstanceOf[Int])
            if (kvs.isEmpty) null else kvs
          }
          Map[String, Any](
            "status" -> 1, // added (at its data sequence number)
            "snapshot_id" -> (if (f.seq != 0) f.seq else null),
            "data_file" -> Map[String, Any](
              "file_path" -> f.path,
              "file_format" -> "PARQUET",
              "partition" -> partition,
              "record_count" -> f.recordCount,
              "file_size_in_bytes" -> f.sizeBytes,
              "block_size_in_bytes" -> (64L * 1024 * 1024),
              "null_value_counts" -> nullCounts,
              "lower_bounds" -> boundsFor(_.min),
              "upper_bounds" -> boundsFor(_.max)))
        }
        val base = name.stripSuffix(".json")
        val avroName = s"$base-s$specId-m0.avro"
        val specFieldsJson = {
          val arr = mapper.createArrayNode()
          resolvableFields(spec, physSchema).foreach { case (pf, i) =>
            val o = arr.addObject()
            o.put("name", pf.name)
            o.put("transform",
              if (pf.transform.startsWith("bucket[")) "void" else pf.transform)
            o.put("source-id",
              physToLogical.get(pf.source).flatMap(topFieldIds.get).getOrElse(0))
            o.put("field-id", 1000 + i)
            ()
          }
          mapper.writeValueAsString(arr)
        }
        val bytes = Avro.writeContainer(schemaJson, records,
          syncSalt = avroName, extraMeta = Seq(
            "schema" -> icebergSchemaJson(m.schema, topFieldIds),
            "partition-spec" -> specFieldsJson,
            "partition-spec-id" -> specId.toString,
            "format-version" -> "1",
            "content" -> "data"))
        val path = s"$outDir/$avroName"
        writeBytes(conf, path, bytes)
        (path, bytes.length.toLong, files.size, files.map(_.recordCount).sum)
      })

    val listPaths = Map.newBuilder[Long, String]
    val omitted = Seq.newBuilder[Long]
    m.snapshots.foreach { snap =>
      val (entries, dp, pdf, eq) =
        MetaIO.loadManifestListData(conf, m.location, snap)
      if (dp.nonEmpty || pdf.nonEmpty || eq.nonEmpty) omitted += snap.id
      else {
        val rows = entries.flatMap { e =>
          val files = MetaIO.loadChildFiles(conf, m.location, e.name)
          files.groupBy(_.specId).toSeq.sortBy(_._1).map { case (specId, group) =>
            val (path, len, fileCount, rowCount) = translateChild(e.name, specId, group)
            // added_snapshot_id = the commit that WROTE this child (its
            // files' data sequence number), not the list's snapshot — a
            // carried-over manifest must not re-claim its files as added
            // by every later snapshot (incremental consumers select
            // manifests by this field). seq 0 (legacy metadata) → null.
            val addedSnap: Any = {
              val s = group.map(_.seq).max
              if (s > 0L) s else null
            }
            Map[String, Any](
              "manifest_path" -> path,
              "manifest_length" -> len,
              "partition_spec_id" -> specId,
              "added_snapshot_id" -> addedSnap,
              "added_data_files_count" -> fileCount,
              "existing_data_files_count" -> 0,
              "deleted_data_files_count" -> 0,
              "added_rows_count" -> rowCount,
              "existing_rows_count" -> 0L,
              "deleted_rows_count" -> 0L)
          }
        }
        val listName = s"snap-${snap.id}-1-graft.avro"
        val bytes = Avro.writeContainer(manifestListSchemaJson, rows,
          syncSalt = listName, extraMeta = Seq(
            "snapshot-id" -> snap.id.toString,
            "format-version" -> "1") ++
            snap.parentId.map(p => "parent-snapshot-id" -> p.toString))
        val path = s"$outDir/$listName"
        writeBytes(conf, path, bytes)
        listPaths += snap.id -> path
      }
    }
    ExportedManifests(listPaths.result(), omitted.result(), outDir)
  }

  /** The Iceberg schema JSON embedded in each manifest's file metadata
    * (readers require it). Field ids follow the exporting document's
    * numbering for TOP-LEVEL fields; nested ids are re-derived the same
    * depth-first way IcebergExport numbers them.
    */
  private def icebergSchemaJson(schema: StructType,
      topFieldIds: Map[String, Int]): String = {
    val root = mapper.createObjectNode()
    root.put("type", "struct"); root.put("schema-id", 0)
    val fs = root.putArray("fields")
    schema.fields.foreach { f =>
      val o = fs.addObject()
      o.put("id", topFieldIds.getOrElse(f.name, 0))
      o.put("name", f.name)
      o.put("required", !f.nullable)
      f.dataType match {
        case LongType      => o.put("type", "long")
        case IntegerType | ShortType => o.put("type", "int")
        case DoubleType    => o.put("type", "double")
        case FloatType     => o.put("type", "float")
        case StringType    => o.put("type", "string")
        case BooleanType   => o.put("type", "boolean")
        case DateType      => o.put("type", "date")
        case TimestampType => o.put("type", "timestamptz")
        case TimestampNTZType => o.put("type", "timestamp")
        case BinaryType    => o.put("type", "binary")
        case other         => o.put("type", other.simpleString)
      }
      ()
    }
    mapper.writeValueAsString(root)
  }

  private[tables] def writeBytes(conf: Configuration, path: String, bytes: Array[Byte]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  private[tables] def readBytes(conf: Configuration, path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }

  // ------------------------------------------------------------- import

  /** Translate one snapshot's Avro manifest list (+ its manifests) into
    * graft JSON manifests inside `tgtMetaDir`. Returns the graft
    * manifest-list NAME for the snapshot. `translatedChildren` caches
    * avro-manifest-path → (graft child name, its files) across snapshots
    * of one import (shared manifests translate once).
    */
  def importSnapshot(conf: Configuration, manifestListPath: String,
      specById: Map[Int, PartitionSpec], schema: StructType,
      idToPhysical: Map[Int, String], tgtMetaDir: String,
      translatedChildren: scala.collection.mutable.Map[String, (String, Seq[DataFile])]): String = {
    val physSchema = ColumnMapping.physicalSchema(schema)
    val list = Avro.readContainer(readBytes(conf, manifestListPath))
    val children = list.records.map { row =>
      val path = row("manifest_path").asInstanceOf[String]
      val specId = row("partition_spec_id").asInstanceOf[Int]
      translatedChildren.getOrElseUpdate(path, {
        val spec = specById.getOrElse(specId, throw new IllegalArgumentException(
          s"manifest $path references unknown partition spec $specId"))
        val mf = Avro.readContainer(readBytes(conf, path))
        val files = mf.records.flatMap { entry =>
          val status = entry("status").asInstanceOf[Int]
          if (status == 2) None // deleted entry: not live
          else {
            val df = entry("data_file").asInstanceOf[Map[String, Any]]
            val fmt = df.getOrElse("file_format", "PARQUET").toString
            require(fmt.equalsIgnoreCase("parquet"),
              s"cannot import non-parquet data file format '$fmt'")
            val partRec = df.getOrElse("partition", Map.empty)
              .asInstanceOf[Map[String, Any]]
            val partitionValues = spec.fields.flatMap { pf =>
              partRec.get(pf.name).flatMap(v => partitionValueIn(pf.transform,
                physSchema.fields.find(_.name == pf.source)
                  .map(_.dataType).getOrElse(StringType), v))
                .map(pf.name -> _)
            }.toMap
            val stats = importStats(df, physSchema, idToPhysical)
            Some(DataFile(
              df("file_path").asInstanceOf[String],
              specId,
              partitionValues,
              df("record_count").asInstanceOf[Long],
              df("file_size_in_bytes").asInstanceOf[Long],
              stats,
              seq = entry.get("snapshot_id") match {
                case Some(l: Long) => l
                case _             => 0L
              },
              // foreign bounds may be truncated (Iceberg increments the
              // last byte of string upper bounds): pruning-safe, never
              // aggregate-exact
              trustedBounds = false))
          }
        }
        val name = translatedName(path)
        MetaIO.writeString(conf, s"$tgtMetaDir/$name",
          MetaIO.manifestToJson(files))
        (name, files)
      })
    }
    val entries = children.distinct.map { case (name, files) =>
      ManifestStats.entryFor(name, files)
    }
    val listName = translatedName(manifestListPath)
    MetaIO.writeString(conf, s"$tgtMetaDir/$listName",
      MetaIO.manifestListToJson(entries))
    listName
  }

  /** Target-dir name for a translated Avro artifact: basename plus a
    * short hash of the FULL source path — two foreign manifests with
    * equal basenames in different directories (metadata consolidated
    * from several source dirs) must not clobber each other's
    * translation (r11 review finding).
    */
  private def translatedName(absPath: String): String = {
    val base = absPath.substring(absPath.lastIndexOf('/') + 1).stripSuffix(".avro")
    val tag = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(absPath))
    s"$base-$tag.json"
  }

  /** Column stats from a foreign manifest entry's bound/null maps. A
    * column enters the map only when its null count is PRESENT (an
    * invented 0 would let IS NULL pruning drop real rows); bounds decode
    * per the schema type or stay None.
    */
  private def importStats(df: Map[String, Any], physSchema: StructType,
      idToPhysical: Map[Int, String]): Map[String, ColStats] = {
    def kvMap(key: String): Map[Int, Any] = df.get(key) match {
      case Some(xs: Seq[_]) => xs.map { kv =>
        val m = kv.asInstanceOf[Map[String, Any]]
        m("key").asInstanceOf[Int] -> m("value")
      }.toMap
      case _ => Map.empty
    }
    val nulls = kvMap("null_value_counts")
    val lowers = kvMap("lower_bounds")
    val uppers = kvMap("upper_bounds")
    nulls.flatMap { case (id, n) =>
      for {
        phys <- idToPhysical.get(id)
        field <- physSchema.fields.find(_.name == phys)
      } yield {
        def dec(m: Map[Int, Any]): Option[Any] = m.get(id)
          .flatMap(b => boundIn(field.dataType, b.asInstanceOf[Array[Byte]]))
        phys -> ColStats(dec(lowers), dec(uppers), numLong(n))
      }
    }
  }
}
