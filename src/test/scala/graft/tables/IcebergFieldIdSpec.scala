package graft.tables

import graft.SparkSpec
import graft.formats.Avro
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder
import java.nio.file.{Files, Paths}

/** Column RESOLUTION for imported foreign Iceberg tables (r11): a real
  * Iceberg table that renamed a column has files carrying the OLD name —
  * real readers resolve by parquet field id, so a name-based read returns
  * silent NULLs. IcebergImport now picks the resolution path the foreign
  * layout actually needs:
  *
  *  - no name-mapping → pure Iceberg-written table → `parquet.field.id`
  *    metadata + Spark's field-id read resolve renames exactly;
  *  - `schema.name-mapping.default` → the migrated/add_files posture
  *    (id-less files) → mapping names become graft physical names;
  *  - id-less stray file under an id-carrying schema → LOUD Spark error,
  *    never silent nulls.
  */
class IcebergFieldIdSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_fid").toString + "/t"
  private def outDir(): String = Files.createTempDirectory("graft_fid_exp").toString

  /** One parquet file from region with field ids 1..3 stamped (the footer
    * every real Iceberg engine writes); returns the file.
    */
  private def writeRegion(dir: String, withIds: Boolean): java.io.File = {
    val df = spark.read.parquet(s"$sf/region.parquet")
    val out =
      if (!withIds) df
      else df.select(df.schema.fields.zipWithIndex.map { case (f, i) =>
        col(f.name).as(f.name, new MetadataBuilder()
          .putLong(ColumnMapping.ParquetFieldIdKey, i + 1L).build())
      }.toSeq: _*)
    out.coalesce(1).write.mode("overwrite").parquet(dir)
    new java.io.File(dir).listFiles().find(_.getName.endsWith(".parquet")).get
  }

  /** Hand-built v1 document over one data file: avro manifest + manifest
    * list + metadata JSON whose current schema names field 2
    * `region_name` — a rename AFTER the file was written.
    */
  private def buildForeignDoc(dataFile: java.io.File, rows: Long,
      extraProps: String = ""): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = outDir()
    val entrySchema =
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"snapshot_id","type":["null","long"],"default":null},
        |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
        |    {"name":"record_count","type":"long"},
        |    {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin
    val entry = Map[String, Any]("status" -> 1, "snapshot_id" -> 7L,
      "data_file" -> Map[String, Any](
        "file_path" -> dataFile.getPath, "file_format" -> "PARQUET",
        "partition" -> Map.empty[String, Any],
        "record_count" -> rows, "file_size_in_bytes" -> dataFile.length()))
    val mBytes = Avro.writeContainer(entrySchema, Seq(entry))
    Files.write(Paths.get(s"$dir/fid-m0.avro"), mBytes)
    val listRow = Map[String, Any]("manifest_path" -> s"$dir/fid-m0.avro",
      "manifest_length" -> mBytes.length.toLong, "partition_spec_id" -> 0,
      "added_snapshot_id" -> 7L, "added_data_files_count" -> 1,
      "existing_data_files_count" -> 0, "deleted_data_files_count" -> 0,
      "added_rows_count" -> rows, "existing_rows_count" -> 0L,
      "deleted_rows_count" -> 0L)
    val lBytes = Avro.writeContainer(IcebergManifests.manifestListSchemaJson,
      Seq(listRow))
    Files.write(Paths.get(s"$dir/snap-7.avro"), lBytes)
    val metadata =
      s"""{"format-version": 1,
         |"table-uuid": "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee",
         |"location": "$dir",
         |"last-updated-ms": 1700000000000,
         |"last-column-id": 2,
         |"schema": {"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "r_regionkey", "required": false, "type": "int"},
         |  {"id": 2, "name": "region_name", "required": false, "type": "string"}]},
         |"partition-spec": [],
         |${if (extraProps.nonEmpty) s""""properties": {$extraProps},""" else ""}
         |"current-snapshot-id": 7,
         |"snapshots": [{"snapshot-id": 7, "timestamp-ms": 1700000000000,
         |  "summary": {"operation": "append"},
         |  "manifest-list": "$dir/snap-7.avro"}],
         |"snapshot-log": [{"timestamp-ms": 1700000000000, "snapshot-id": 7}]}
         |""".stripMargin
    MetaIO.writeString(conf, s"$dir/metadata.json", metadata)
    s"$dir/metadata.json"
  }

  private def regionSrc: DataFrame = spark.read.parquet(s"$sf/region.parquet")

  test("foreign renamed column resolves by parquet field id, not name") {
    val dataDir = Files.createTempDirectory("graft_fid_data").toString
    val f = writeRegion(s"$dataDir/d", withIds = true)
    val n = regionSrc.count()
    val imp = IcebergImport.importMetadata(spark,
      buildForeignDoc(f, n), tmp())
    // schema fields carry the ids; no physical-name riders
    assert(ColumnMapping.hasFieldIds(imp.meta.schema))
    assert(!ColumnMapping.hasMapping(imp.meta.schema))
    // the renamed column reads the file's r_name VALUES — name-based
    // resolution would return all NULL here
    val got = imp.toDF().select("region_name").collect().map(_.getString(0)).toSet
    val want = regionSrc.select("r_name").collect().map(_.getString(0)).toSet
    assert(got == want)
    assert(imp.toDF().filter(col("region_name").isNull).count() == 0)
    // predicate on the renamed column prunes/filters correctly too
    val one = want.head
    assert(imp.toDF().filter(col("region_name") === one).count() ==
      regionSrc.filter(col("r_name") === one).count())
  }

  test("graft appends to an id-resolved table stay id-resolvable") {
    val dataDir = Files.createTempDirectory("graft_fid_data2").toString
    val f = writeRegion(s"$dataDir/d", withIds = true)
    val n = regionSrc.count()
    val imp = IcebergImport.importMetadata(spark,
      buildForeignDoc(f, n), tmp())
    // append through graft under the CURRENT names; the write must stamp
    // the same field ids or its own file would fail the id-resolved read
    imp.append(regionSrc.toDF("r_regionkey", "region_name")
      .withColumn("r_regionkey", (col("r_regionkey") + 100).cast("int")))
    assert(imp.toDF().count() == 2 * n)
    assert(imp.toDF().filter(col("region_name").isNull).count() == 0)
    // the graft-written file itself carries ids: read it alone under a
    // DIFFERENT name for field 2 and the values must still resolve
    val newFile = MetaIO.loadManifestData(
      spark.sparkContext.hadoopConfiguration, imp.meta.location,
      imp.meta.currentSnapshot.get.manifest).files
      .map(_.path).find(p => !p.contains(dataDir)).get
    val probe = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("zz", org.apache.spark.sql.types.StringType,
        nullable = true, new MetadataBuilder()
          .putLong(ColumnMapping.ParquetFieldIdKey, 2L).build())))
    val vals = spark.read.schema(probe).parquet(newFile)
      .collect().map(_.getString(0)).toSet
    assert(vals == regionSrc.select("r_name").collect().map(_.getString(0)).toSet)
  }

  test("equality deletes on an id-resolved table write and read by field id") {
    val dataDir = Files.createTempDirectory("graft_fid_data5").toString
    val f = writeRegion(s"$dataDir/d", withIds = true)
    val n = regionSrc.count()
    val imp = IcebergImport.importMetadata(spark,
      buildForeignDoc(f, n), tmp())
    // eq-delete keyed on the RENAMED column: the key file must stamp the
    // same field id or the table's id-keyed applyEq read would fail loud
    val victim = regionSrc.select("r_name").collect().map(_.getString(0)).head
    imp.deleteMergeOnReadEquality(
      spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(victim)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("region_name",
            org.apache.spark.sql.types.StringType)))),
      Seq("region_name"))
    val left = imp.toDF().select("region_name").collect().map(_.getString(0)).toSet
    assert(!left.contains(victim) && left.size == n - 1)
    // the delete file itself resolves by id under a different name
    val delFile = MetaIO.loadManifestData(
      spark.sparkContext.hadoopConfiguration, imp.meta.location,
      imp.meta.currentSnapshot.get.manifest).equalityDeletes.head.files.head
    val probe = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("zz", org.apache.spark.sql.types.StringType,
        nullable = true, new MetadataBuilder()
          .putLong(ColumnMapping.ParquetFieldIdKey, 2L).build())))
    assert(spark.read.schema(probe).parquet(delFile)
      .collect().map(_.getString(0)).toSeq == Seq(victim))
    // materialization and the changelog read eq keys through the SAME
    // id-keyed path (review finding: they used name-based reads, which
    // fail on foreign delete files carrying pre-rename names)
    val changed = imp.changesBetween(imp.meta.snapshots.head.id,
      imp.meta.currentSnapshotId.get)
    assert(changed.filter(org.apache.spark.sql.functions.col("_change_type") === "delete")
      .count() == 1)
    imp.materializeDeletes()
    val after = imp.toDF().select("region_name").collect().map(_.getString(0)).toSet
    assert(!after.contains(victim) && after.size == n - 1)
  }

  test("name-mapping document maps to physical names (migrated id-less files)") {
    val dataDir = Files.createTempDirectory("graft_fid_data3").toString
    val f = writeRegion(s"$dataDir/d", withIds = false)
    val n = regionSrc.count()
    val nm = """[{"field-id": 1, "names": ["r_regionkey"]},
                 {"field-id": 2, "names": ["r_name"]}]"""
      .replaceAll("\\s+", " ").replace("\"", "\\\"")
    val imp = IcebergImport.importMetadata(spark,
      buildForeignDoc(f, n,
        extraProps = s""""schema.name-mapping.default": "$nm""""), tmp())
    // mapping consumed: physical rider set, NO field ids attached, and
    // the foreign property does not linger (it would go stale on rename)
    assert(!ColumnMapping.hasFieldIds(imp.meta.schema))
    assert(ColumnMapping.physicalOf(imp.meta.schema, "region_name") == "r_name")
    assert(!imp.meta.properties.contains("schema.name-mapping.default"))
    val got = imp.toDF().select("region_name").collect().map(_.getString(0)).toSet
    assert(got == regionSrc.select("r_name").collect().map(_.getString(0)).toSet)
  }

  test("id-less stray file under an id-carrying schema fails LOUD, not null") {
    val dataDir = Files.createTempDirectory("graft_fid_data4").toString
    val f = writeRegion(s"$dataDir/d", withIds = false)
    val n = regionSrc.count()
    // no mapping + id-less file: a broken foreign layout; import itself is
    // metadata-only and succeeds, the READ must throw (never silent nulls)
    val imp = IcebergImport.importMetadata(spark,
      buildForeignDoc(f, n), tmp())
    val e = intercept[org.apache.spark.SparkException](imp.toDF().collect())
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + messages(t.getCause)
    assert(messages(e).contains("field Id"))
  }
}
