package graft.tables

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Read-side Iceberg interop (reference pyspark-iceberg/interoperability.md
  * 1-10: "Read(-only) access from external Spark is possible by specifying
  * the full filepath to the metadata location"): register a GraftTable FROM
  * an Iceberg v1 `TableMetadata` JSON document — the inbound twin of
  * [[IcebergExport]], and the first thing a user coming from the reference
  * stack reaches for when pointing graft at an existing table.
  *
  * Both manifest formats import: documents carrying
  * `graft.manifest-format: json` stage graft's JSON manifests verbatim;
  * everything else takes the REAL-Iceberg path — binary Avro manifest
  * lists and manifests (tables written by an actual Iceberg engine, or
  * IcebergExport.exportBinary's own output) decode through the
  * from-scratch [[graft.formats.Avro]] codec and translate into graft
  * JSON manifests ([[IcebergManifests.importSnapshot]]): typed partition
  * values back to graft's string rendering (years/months shifted between
  * epoch-relative and calendar-absolute semantics), bounds decoded from
  * Iceberg's single-value binary encoding with `trustedBounds = false`
  * (foreign string bounds may be truncated — pruning-safe, never
  * aggregate-exact), per-entry `snapshot_id` back to graft's data
  * sequence number.
  *
  * The import is METADATA-ONLY, the add_files / in-place-migration posture
  * (t02/t38): manifest JSONs (and live column/partition-stats payloads)
  * are copied into the target's metadata dir — O(metadata), no data pass —
  * while data files and delete files stay where they are, referenced by
  * the absolute paths the manifests already carry. Schema (incl. graft's
  * rename-stable physical names riding the exported `graft-physical` field
  * key), partition specs across evolution, the full snapshot chain with
  * graft's precise operation kinds (`graft.operation` summary key, falling
  * back to Iceberg's coarse op), refs, and properties all survive the
  * round-trip — pinned by IcebergInteropSpec.
  */
object IcebergImport {
  private val mapper = new ObjectMapper()

  /** Inverse of IcebergExport's type mapping (Iceberg v1 JSON → Spark). */
  private val DecimalRe = """decimal\((\d+),\s*(\d+)\)""".r

  private def sparkType(node: JsonNode): DataType =
    if (node.isTextual) node.asText() match {
      case "long"        => LongType
      case "int"         => IntegerType
      case "double"      => DoubleType
      case "float"       => FloatType
      case "string"      => StringType
      case "boolean"     => BooleanType
      case "date"        => DateType
      case "timestamptz" => TimestampType
      case "timestamp"   => TimestampNTZType
      case "binary"      => BinaryType
      case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
      case other => throw new IllegalArgumentException(
        s"no Spark mapping for Iceberg type '$other'")
    } else node.get("type").asText() match {
      case "list" =>
        ArrayType(sparkType(node.get("element")),
          containsNull = !node.get("element-required").asBoolean(false))
      case "struct" => sparkStruct(node)
      case other => throw new IllegalArgumentException(
        s"no Spark mapping for Iceberg nested type '$other'")
    }

  private def sparkStruct(node: JsonNode): StructType = {
    val fields = Seq.newBuilder[StructField]
    node.get("fields").forEach { fo =>
      val f = StructField(fo.get("name").asText(), sparkType(fo.get("type")),
        nullable = !fo.get("required").asBoolean(false))
      fields += Option(fo.get("graft-physical"))
        .map(p => ColumnMapping.withPhysical(f, p.asText())).getOrElse(f)
    }
    StructType(fields.result().toArray)
  }

  /** Top-level schema with column RESOLUTION decided (how graft will match
    * schema fields to parquet columns in the table's files — the part a
    * name-based reader gets silently wrong when the foreign table ever
    * renamed a column):
    *
    *  - a `graft-physical` rider (graft's own exports) wins — files carry
    *    that exact name;
    *  - else `schema.name-mapping.default` (the migrated/`add_files`
    *    posture: id-less files under declared historical names — also what
    *    every graft export emits) maps field id → the first listed name,
    *    read name-based like graft's own renames;
    *  - else the table is pure Iceberg-written — such files ALWAYS carry
    *    parquet field ids, so each field gets `parquet.field.id` metadata
    *    and Spark's field-id resolution (enabled session-wide by
    *    GraftSession) matches by id exactly as an Iceberg reader would.
    *    Renames across any depth of file history resolve correctly, and an
    *    id-less stray file is a LOUD Spark error, never silent nulls.
    *
    * Declared limits: ids attach at the top level only (nested renames in
    * foreign structs still resolve by name within their parent), and when
    * a name-mapping is present it is assumed to cover the files (Iceberg
    * applies mappings only to id-less files; a table mixing mapped id-less
    * files with later-renamed id-ful files cannot be expressed in one
    * read schema).
    */
  private def resolvedSchema(schemaNode: JsonNode,
      nameMapping: Map[Int, String]): StructType = {
    val fields = Seq.newBuilder[StructField]
    schemaNode.get("fields").forEach { fo =>
      val id = fo.get("id").asInt()
      val f0 = StructField(fo.get("name").asText(), sparkType(fo.get("type")),
        nullable = !fo.get("required").asBoolean(false))
      fields += Option(fo.get("graft-physical")).map(_.asText())
        .orElse(nameMapping.get(id)).filter(_ != f0.name)
        .map(p => ColumnMapping.withPhysical(f0, p))
        .getOrElse(if (nameMapping.isEmpty) ColumnMapping.withFieldId(f0, id)
          else f0)
    }
    StructType(fields.result().toArray)
  }

  /** Column defaults on import. Graft riders (`graft-initial-default` +
    * `graft-default-since`) restore the exact boundary. A FOREIGN
    * `initial-default` (Iceberg v3) has no graft boundary; the equivalent
    * is derived from schema history: real readers fill files whose schema
    * predates the column, so the boundary is the smallest data sequence
    * among snapshots whose `schema-id` references a schema containing the
    * field — pre-add files sit below it. A foreign default whose boundary
    * cannot be derived (no snapshot carries `schema-id`) REFUSES loudly:
    * importing it default-inert would silently read nulls where every
    * real reader reads the default.
    */
  private def applyDefaults(schema: StructType, schemaNode: JsonNode,
      root: JsonNode): StructType = {
    def typed(node: JsonNode, t: DataType): Any = t match {
      case IntegerType => node.asInt()
      case LongType    => node.asLong()
      case FloatType   => node.asDouble().toFloat
      case DoubleType  => node.asDouble()
      case StringType  => node.asText()
      case BooleanType => node.asBoolean()
      // Iceberg single-value JSON: date "YYYY-MM-DD"; timestamp (NTZ)
      // ISO-8601 local datetime
      case DateType    => java.time.LocalDate.parse(node.asText())
      case TimestampNTZType => java.time.LocalDateTime.parse(node.asText())
      case other => throw new IllegalArgumentException(
        s"unsupported imported column default for type $other")
    }
    // schema-id → set of field ids (for the foreign boundary derivation)
    lazy val schemaFieldIds: Map[Int, Set[Int]] = {
      val b = Map.newBuilder[Int, Set[Int]]
      Option(root.get("schemas")).foreach(_.forEach { s =>
        val ids = Set.newBuilder[Int]
        Option(s.get("fields")).foreach(_.forEach(f => ids += f.get("id").asInt()))
        Option(s.get("schema-id")).foreach(sid => b += sid.asInt() -> ids.result())
      })
      b.result()
    }
    // (snapshotId, seq, schemaId?, parentId?) per surviving snapshot
    case class SnapInfo(id: Long, seq: Long, schemaId: Option[Int],
        parentId: Option[Long])
    lazy val snapInfos: Seq[SnapInfo] = {
      val b = Seq.newBuilder[SnapInfo]
      Option(root.get("snapshots")).foreach(_.forEach { s =>
        val id = s.get("snapshot-id").asLong()
        b += SnapInfo(id,
          Option(s.get("sequence-number")).map(_.asLong()).getOrElse(id),
          Option(s.get("schema-id")).map(_.asInt()),
          Option(s.get("parent-snapshot-id")).map(_.asLong()))
      })
      b.result()
    }
    /** The fill boundary for a foreign `initial-default`, derived from
      * which surviving snapshots' schemas contain the field. The derived
      * `min(seq | schema has field)` is only EXACT when nothing can hide
      * below it: the boundary snapshot has no parent (the table's first
      * commit), or its parent SURVIVES with a schema known to lack the
      * field. Anything else (dangling parent after snapshot expiry, a
      * schema-id-less snapshot below the boundary) leaves room for
      * post-add files holding genuine NULLs below the boundary — filling
      * those would silently diverge from a real reader, so refuse loudly.
      */
    def foreignBoundary(name: String, fieldId: Int): Long = {
      // no snapshots → no data files → nothing can need filling
      if (snapInfos.isEmpty) return 0L
      def hasField(sid: Int): Boolean =
        schemaFieldIds.getOrElse(sid, Set.empty).contains(fieldId)
      val withField = snapInfos.filter(_.schemaId.exists(hasField))
      if (withField.isEmpty) throw new IllegalArgumentException(
        s"column '$name' carries initial-default but no snapshot " +
          "declares a schema-id containing it — cannot derive the " +
          "fill boundary; importing it default-inert would silently " +
          "read nulls where a real reader reads the default")
      val bSnap = withField.minBy(_.seq)
      val boundary = bSnap.seq
      // a schema-id that resolves to nothing in the 'schemas' list is as
      // unclassifiable as no schema-id at all — treat both identically
      // (below the boundary AND as the parent anchor), else a trimmed or
      // malformed document slips past the refuse-loudly posture
      def unresolvable(s: SnapInfo): Boolean =
        !s.schemaId.exists(schemaFieldIds.contains)
      if (snapInfos.exists(s => unresolvable(s) && s.seq < boundary))
        throw new IllegalArgumentException(
          s"column '$name' carries initial-default but a snapshot below " +
            "the derived fill boundary declares no resolvable schema-id " +
            "— its files cannot be classified as pre- or post-add")
      val anchored = bSnap.parentId match {
        case None => true // the table's first commit: nothing predates it
        case Some(p) => snapInfos.find(_.id == p)
          .exists(s => !unresolvable(s) &&
            s.schemaId.exists(sid => !hasField(sid)))
      }
      if (!anchored) throw new IllegalArgumentException(
        s"column '$name' carries initial-default but the snapshot that " +
          "introduced it has no surviving pre-add parent (snapshot " +
          "expiry ate the add point) — files below the derived boundary " +
          "may hold genuine NULLs written after the add; refusing rather " +
          "than guessing")
      boundary
    }
    val out = schema.fields.toBuffer
    var i = 0
    schemaNode.get("fields").forEach { fo =>
      val f = out(i)
      Option(fo.get("graft-initial-default")) match {
        case Some(v) =>
          out(i) = ColumnDefaults.withDefault(f, typed(v, f.dataType),
            fo.get("graft-default-since").asLong())
        case None => Option(fo.get("initial-default")).foreach { v =>
          out(i) = ColumnDefaults.withDefault(f, typed(v, f.dataType),
            foreignBoundary(f.name, fo.get("id").asInt()))
        }
      }
      i += 1
    }
    StructType(out.toArray)
  }

  /** `schema.name-mapping.default`: field id → first listed physical name
    * (top-level entries; nested `fields` lists are not consulted — see
    * [[resolvedSchema]]).
    */
  private def parseNameMapping(props: Map[String, String]): Map[Int, String] =
    props.get("schema.name-mapping.default").map { s =>
      val b = Map.newBuilder[Int, String]
      mapper.readTree(s).forEach { o =>
        for {
          fid <- Option(o.get("field-id"))
          names <- Option(o.get("names")) if names.size() > 0
        } b += fid.asInt() -> names.get(0).asText()
      }
      b.result()
    }.getOrElse(Map.empty)

  /** Hadoop-catalog table-DIRECTORY import: resolve the current metadata
    * file through `metadata/version-hint.text` exactly as a stock
    * engine's `hadoop` catalog does (reference pyspark-iceberg/
    * interoperability.md:75-83, :108-112 — pointing a hadoop catalog at
    * a directory without the hint is the failure the reference
    * demonstrates), then delegate to [[importMetadata]].
    */
  def importTableDir(spark: SparkSession, tableDir: String,
      targetLocation: String): GraftTable = {
    val conf = spark.sparkContext.hadoopConfiguration
    val hint = s"$tableDir/metadata/version-hint.text"
    if (!MetaIO.exists(conf, hint))
      throw new IllegalArgumentException(
        s"$tableDir is not a hadoop-layout Iceberg table: no " +
          "metadata/version-hint.text (export with hadoopLayout = true, " +
          "or import by explicit metadata-file path)")
    val v = MetaIO.readString(conf, hint).trim
    importMetadata(spark, s"$tableDir/metadata/v$v.metadata.json", targetLocation)
  }

  /** Parse + register. `targetLocation` must not already hold a graft
    * table (imports never clobber); returns the loaded table.
    */
  def importMetadata(spark: SparkSession, metadataJsonPath: String,
      targetLocation: String): GraftTable = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = mapper.readTree(MetaIO.readString(conf, metadataJsonPath))

    val fv = Option(root.get("format-version")).map(_.asInt()).getOrElse(-1)
    require(fv >= 1 && fv <= 3,
      s"unsupported Iceberg format-version $fv (v1/v2/v3; v3 deletion " +
        "vectors import as graft DV bitmaps, row-lineage fields are " +
        "ignored on import — graft serves no _row_id column, though its " +
        "own v3 exports assign them)")
    val props0 = {
      val b = Map.newBuilder[String, String]
      Option(root.get("properties")).foreach(p =>
        p.fieldNames().forEachRemaining(k => b += k -> p.get(k).asText()))
      b.result()
    }
    // json → graft's own JSON manifests copy verbatim; anything else is
    // the REAL-Iceberg path: binary Avro manifest lists + manifests,
    // decoded with the from-scratch codec and translated into graft JSON
    val jsonManifests = props0.get("graft.manifest-format").contains("json")
    if (MetaIO.currentVersion(conf, targetLocation).isDefined)
      throw new IllegalArgumentException(
        s"$targetLocation already holds a graft table; refusing to clobber")

    // v2 documents may carry ONLY the `schemas` list + `current-schema-id`
    // (the inline `schema` field is v1's); resolve whichever is present
    val schemaNode = Option(root.get("schema")).getOrElse {
      val curId = Option(root.get("current-schema-id")).map(_.asInt())
        .getOrElse(throw new IllegalArgumentException(
          "document has neither 'schema' nor 'current-schema-id'"))
      val it = Option(root.get("schemas")).getOrElse(
        throw new IllegalArgumentException("document carries no schemas")).elements()
      var found: JsonNode = null
      while (it.hasNext && found == null) {
        val s = it.next()
        if (Option(s.get("schema-id")).exists(_.asInt() == curId)) found = s
      }
      if (found == null) throw new IllegalArgumentException(
        s"current-schema-id $curId not present in schemas")
      found
    }
    val schema = applyDefaults(
      resolvedSchema(schemaNode, parseNameMapping(props0)), schemaNode, root)
    // field id → PHYSICAL source name for partition-spec sources
    val idToPhysical: Map[Int, String] = {
      val b = Map.newBuilder[Int, String]
      schemaNode.get("fields").forEach { fo =>
        b += fo.get("id").asInt() ->
          ColumnMapping.physicalOf(schema, fo.get("name").asText())
      }
      b.result()
    }

    // a spec source that doesn't resolve to a schema field would
    // register a silently-wrong spec (mis-pruned reads); refuse
    // loudly instead. Cannot occur on graft exports — evolution
    // refuses to drop partition-source columns (historical-spec fields
    // the export could not resolve are omitted there, never emitted
    // with a bogus id).
    def parseFields(fieldsNode: JsonNode): Seq[PartitionField] = {
      val fields = Seq.newBuilder[PartitionField]
      fieldsNode.forEach { fo =>
        val sid = fo.get("source-id").asInt()
        val source = idToPhysical.getOrElse(sid,
          throw new IllegalArgumentException(
            s"partition field '${fo.get("name").asText()}' references " +
              s"unknown source field id $sid — cannot import the spec"))
        // binary exports declare bucket fields as `void` for foreign
        // readers (hash mismatch) and ride the true transform on
        // `graft-transform` — restore it here
        val transform = Option(fo.get("graft-transform")).map(_.asText())
          .getOrElse(fo.get("transform").asText())
        fields += PartitionField(source, transform, fo.get("name").asText())
      }
      fields.result()
    }
    val specs = {
      val out = Seq.newBuilder[PartitionSpec]
      Option(root.get("partition-specs")).foreach(_.forEach { so =>
        out += PartitionSpec(so.get("spec-id").asInt(),
          parseFields(so.get("fields")))
      })
      val specs0 = out.result()
      if (specs0.nonEmpty) specs0
      else {
        // v1's REQUIRED field is the legacy top-level `partition-spec`
        // array; `partition-specs` is optional. A foreign document
        // carrying only the legacy form must not import as silently
        // unpartitioned (ADVICE r10) — parse it as spec 0.
        Option(root.get("partition-spec")).filter(_.size() > 0) match {
          case Some(legacy) => Seq(PartitionSpec(0, parseFields(legacy)))
          case None         => Seq(PartitionSpec(0, Nil))
        }
      }
    }
    val currentSpecId = Option(root.get("default-spec-id")).map(_.asInt())
      .getOrElse(specs.head.specId)

    // snapshots: manifest-list paths give both the source metadata dir and
    // the manifest name; copy each JSON manifest (plus its child manifests
    // for r6-style lists) — or TRANSLATE each Avro manifest list — into
    // the target's metadata dir
    val tgtMetaDir = MetaIO.metadataDir(targetLocation)
    val copied = scala.collection.mutable.Set.empty[String]
    val avroCaches = new IcebergManifests.ImportCaches
    var srcMetaDir: Option[String] = None
    val specById = specs.map(s => s.specId -> s).toMap
    def stageManifestList(absPath: String): String = {
      val idx = absPath.lastIndexOf('/')
      require(idx > 0, s"manifest-list path '$absPath' is not absolute")
      val (srcDir, name) = (absPath.substring(0, idx), absPath.substring(idx + 1))
      srcMetaDir = srcMetaDir.orElse(Some(srcDir))
      if (jsonManifests) {
        if (copied.add(name)) {
          val json = MetaIO.readString(conf, absPath)
          MetaIO.writeString(conf, s"$tgtMetaDir/$name", json)
          MetaIO.manifestListParts(json).foreach { case (entries, _, _, _) =>
            entries.foreach { e =>
              if (copied.add(e.name))
                MetaIO.writeString(conf, s"$tgtMetaDir/${e.name}",
                  MetaIO.readString(conf, s"$srcDir/${e.name}"))
            }
          }
        }
        name
      } else IcebergManifests.importSnapshot(spark, absPath, specById, schema,
        idToPhysical, tgtMetaDir, targetLocation, avroCaches)
    }

    val snaps = {
      val out = Seq.newBuilder[Snapshot]
      Option(root.get("snapshots")).foreach(_.forEach { so =>
        val sm = so.get("summary")
        def sumLong(k: String): Long =
          Option(sm).flatMap(s => Option(s.get(k))).map(_.asText().toLong).getOrElse(0L)
        val op = Option(sm).flatMap(s => Option(s.get("graft.operation")))
          .map(_.asText())
          .orElse(Option(sm).flatMap(s => Option(s.get("operation"))).map(_.asText()))
          .getOrElse("append")
        out += Snapshot(
          so.get("snapshot-id").asLong(),
          Option(so.get("parent-snapshot-id")).map(_.asLong()),
          so.get("timestamp-ms").asLong(),
          op,
          stageManifestList(so.get("manifest-list").asText()),
          sumLong("added-data-files"), sumLong("total-data-files"),
          sumLong("total-records"))
      })
      // normalize foreign document order to graft's id-sorted invariant:
      // Iceberg ids are random longs and the spec attaches no meaning to
      // snapshot-list order (history is parent links + timestamps), while
      // graft's catalog diff/apply relies on id-sorted lists to round-trip
      out.result().sortBy(_.id)
    }

    val currentSnap = Option(root.get("current-snapshot-id"))
      .map(_.asLong()).filter(_ >= 0)
    val refs = {
      val b = Map.newBuilder[String, Ref]
      Option(root.get("refs")).foreach { ro =>
        ro.fieldNames().forEachRemaining { name =>
          val o = ro.get(name)
          val snapId = o.get("snapshot-id").asLong()
          // Iceberg's main branch IS graft's implicit current pointer
          // (current-snapshot-id above); materializing it as a ref would
          // shadow the pointer, which graft refuses by construction. But
          // a FOREIGN main can legitimately diverge from the current
          // pointer (WAP / staged commits) or carry retention settings —
          // silently discarding that state loses it, so: drop main only
          // when it is the trivial mirror of current-snapshot-id with no
          // retention fields; otherwise preserve the head under
          // 'main_imported' and say so.
          val retentionKeys = Seq("max-ref-age-ms", "min-snapshots-to-keep",
            "max-snapshot-age-ms").filter(o.has)
          if (name != "main")
            b += name -> Ref(o.get("type").asText().toLowerCase, snapId)
          else if (currentSnap.contains(snapId) && retentionKeys.isEmpty)
            () // trivial mirror of the current pointer: safe to drop
          else {
            if (!currentSnap.contains(snapId)) {
              System.err.println(s"[graft] iceberg import: 'main' ref " +
                s"(snapshot $snapId) diverges from current-snapshot-id " +
                s"${currentSnap.getOrElse(-1L)} — preserving it as branch " +
                "'main_imported'")
              b += "main_imported" ->
                Ref(o.get("type").asText().toLowerCase, snapId)
            }
            if (retentionKeys.nonEmpty)
              System.err.println("[graft] iceberg import: 'main' ref " +
                s"retention settings (${retentionKeys.mkString(", ")}) have " +
                "no graft equivalent and are not imported")
          }
        }
      }
      b.result()
    }

    // live stats payloads are ADVISORY: copy them when the source's
    // metadata dir still has them, drop the pointers when it doesn't —
    // degraded stats, never a dangling reference
    val statsProps = Seq(TableFormat.StatsFile, TableFormat.StatsSnapshot,
      TableFormat.PartStatsFile, TableFormat.PartStatsSnapshot)
    // a Puffin stats file (binary exports, r11) translates back into
    // graft's JSON payload under a renamed pointer; anything else copies
    // verbatim
    var statsRenames = Map.empty[String, String]
    val statsOk = Seq(TableFormat.StatsFile, TableFormat.PartStatsFile)
      .forall(p => props0.get(p) match {
        case None => true
        case Some(name) => (for (dir <- srcMetaDir) yield scala.util.Try {
          val bytes = IcebergManifests.readBytes(conf, s"$dir/$name")
          if (p == TableFormat.StatsFile && graft.formats.Puffin.isPuffin(bytes)) {
            val sp = PuffinStats.fromPuffin(bytes, idToPhysical)
            val jsonName = name.stripSuffix(".puffin") + ".json"
            MetaIO.writeString(conf, s"$tgtMetaDir/$jsonName",
              MetaIO.statsFileToJson(sp))
            statsRenames += p -> jsonName
          } else
            MetaIO.writeString(conf, s"$tgtMetaDir/$name",
              new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
        }.isSuccess).getOrElse(false)
      })
    // renames apply ONLY on a fully-successful stats copy: merging a
    // translated StatsFile pointer after the snapshot-stamp props were
    // dropped would leave a half-restored, unserveable property set
    // (r11 review finding)
    // name-mapping is consumed into the schema's physical names above;
    // keeping the foreign property would go stale on the first rename
    // (export regenerates it from live physical names anyway)
    // v3 row lineage: the foreign `next-row-id` watermark survives as a
    // property so native appends after the import take ids ABOVE every
    // imported range (the per-file ids themselves ride the translated
    // manifests as DataFile.firstRowId); the import boundary marks every
    // imported snapshot so files WITHOUT an explicit foreign id serve
    // NULL lineage rather than invented numbers
    val lineageProps = Option(root.get("next-row-id")).toSeq.flatMap(n => Seq(
      TableFormat.RowLineageNextRowId -> n.asLong().toString) ++
      snaps.map(_.id).maxOption.map(b =>
        TableFormat.RowLineageImportBoundary -> b.toString))
    // FOREIGN partition-statistics (the spec's parquet shape): when the
    // document carries no graft payload pointer, translate the latest
    // current-snapshot entry's parquet file back into graft's payload so
    // `.partitions` serves O(partitions) off the imported table too
    val foreignPartStats: Map[String, String] =
      if (props0.contains(TableFormat.PartStatsFile)) Map.empty
      else {
        val physSchema = ColumnMapping.physicalSchema(schema)
        val fieldsBySpec: Map[Int, Seq[PartitionField]] =
          specs.map(s => s.specId -> s.fields).toMap
        (for {
          arr <- Option(root.get("partition-statistics")).filterNot(_.isNull)
          if arr.size() > 0
          entry = arr.get(arr.size() - 1)
          snapId = entry.get("snapshot-id").asLong()
          if currentSnap.contains(snapId)
          path = entry.get("statistics-path").asText()
        } yield scala.util.Try {
          def render(pf: PartitionField, v: Any): String = {
            val raw = v match {
              case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
              case x => x
            }
            val srcType = physSchema.fields.find(_.name == pf.source)
              .map(_.dataType).getOrElse(org.apache.spark.sql.types.StringType)
            IcebergManifests.partitionValueIn(pf.transform, srcType, raw)
              .getOrElse("__HIVE_DEFAULT_PARTITION__")
          }
          val entries = spark.read.parquet(path).collect().toSeq.map { r =>
            val specId = r.getAs[Int]("spec_id")
            val part = r.getAs[org.apache.spark.sql.Row]("partition")
            val kvs = fieldsBySpec.getOrElse(specId, Nil).flatMap { pf =>
              scala.util.Try(part.getAs[Any](pf.name)).toOption
                .map(v => s"${pf.name}=${render(pf, v)}")
            }.sorted
            PartitionStatEntry(specId, kvs.mkString("/"),
              r.getAs[Int]("data_file_count").toLong,
              r.getAs[Long]("data_record_count"),
              r.getAs[Long]("total_data_file_size_in_bytes"))
          }.sortBy(e => (e.specId, e.partition))
          val name = s"partition-stats-$snapId.json"
          MetaIO.writeString(conf, s"$tgtMetaDir/$name",
            MetaIO.partitionStatsToJson(PartitionStatsPayload(snapId, entries)))
          Map(TableFormat.PartStatsFile -> name,
            TableFormat.PartStatsSnapshot -> snapId.toString)
        }.getOrElse(Map.empty)).getOrElse(Map.empty)
      }
    val props = (if (statsOk) props0 ++ statsRenames
      else props0 -- statsProps) -
      "graft.manifest-format" - "schema.name-mapping.default" -
      // the settlement file lives in the SOURCE's metadata dir and the
      // imported manifests carry explicit per-file ids anyway — a stale
      // pointer here would crash the first lineage read on the import
      TableFormat.RowLineageSettled ++ lineageProps ++
      foreignPartStats

    MetaIO.commitMeta(conf, TableMeta(targetLocation, 1, schema, specs,
      currentSpecId, snaps, currentSnap, props, refs))
    GraftTable.load(spark, targetLocation)
  }
}
