package graft.tables

import graft.SparkSpec
import graft.formats.Avro
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** REAL-Iceberg binary interop (VERDICT r10 "Next round #1"): exportBinary
  * writes genuine v1 Avro manifest lists + manifests, importMetadata reads
  * them back — and reads FOREIGN hand-built v1 documents that carry none
  * of graft's rider keys. The AVRO round trip must agree with the JSON
  * round trip result-for-result.
  */
class IcebergAvroInteropSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private def tmp(): String = Files.createTempDirectory("graft_avro").toString + "/t"
  private def outDir(): String = Files.createTempDirectory("graft_avro_exp").toString

  /** Write `df` as one parquet file with field ids 1..n stamped — the
    * footer shape every real Iceberg engine produces (graft-native writes
    * are id-less; a faithful foreign fixture must not be).
    */
  private def writeWithFieldIds(df: org.apache.spark.sql.DataFrame,
      dir: String): Unit =
    df.select(df.schema.fields.zipWithIndex.map { case (f, i) =>
      col(f.name).as(f.name, new org.apache.spark.sql.types.MetadataBuilder()
        .putLong(ColumnMapping.ParquetFieldIdKey, i + 1L).build())
    }.toSeq: _*).coalesce(1).write.mode("overwrite").parquet(dir)

  test("binary export → import round-trip matches the JSON path exactly") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(200),
      partitionFields = Seq(PartitionField("o_orderdate", "months", "o_month")))
    src.append(spark.read.parquet(s"$sf/orders.parquet").limit(50)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    src.setPartitionSpec(Seq(PartitionField("o_orderstatus", "identity", "status")))
    src.append(spark.read.parquet(s"$sf/orders.parquet").limit(25)
      .withColumn("o_orderkey", col("o_orderkey") + 2000000L))
    src.createTag("audited", src.meta.currentSnapshotId.get)

    val dir = outDir()
    IcebergExport.exportBinary(src, dir)
    // the artifact is a real Iceberg layout: avro manifest lists + manifests
    val files = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(files.contains("metadata.json"))
    assert(files.exists(f => f.startsWith("snap-") && f.endsWith(".avro")))
    assert(files.exists(f => f.endsWith("-m0.avro")))

    val viaAvro = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    val viaJson = {
      val p = outDir() + "/metadata.json"
      IcebergExport.export(src, p)
      IcebergImport.importMetadata(spark, p, tmp())
    }
    // metadata agrees between the two paths
    val (am, jm) = (viaAvro.meta, viaJson.meta)
    assert(am.schema == jm.schema)
    assert(am.specs == jm.specs)
    assert(am.currentSpecId == jm.currentSpecId)
    assert(am.snapshots.map(s => (s.id, s.parentId, s.operation)) ==
      jm.snapshots.map(s => (s.id, s.parentId, s.operation)))
    assert(am.refs == jm.refs)
    // results agree hash-for-hash: same rows, same values
    val a = viaAvro.toDF().orderBy("o_orderkey").collect()
    val j = viaJson.toDF().orderBy("o_orderkey").collect()
    assert(a.sameElements(j))
    assert(a.length == 275)
    // time travel works across the avro-imported chain
    assert(viaAvro.asOf(am.snapshots.head.id).count() == 200)
    // partition pruning still plans through the imported specs
    assert(viaAvro.toDF(Some("o_orderstatus = 'F'")).count() ==
      src.toDF().filter($"o_orderstatus" === "F").count())
    // per-file data sequence numbers survive (snapshot_id in the avro entry)
    val conf = spark.sparkContext.hadoopConfiguration
    val aSeqs = MetaIO.loadManifestData(conf, am.location,
      am.currentSnapshot.get.manifest).files.map(_.seq).sorted
    val jSeqs = MetaIO.loadManifestData(conf, jm.location,
      jm.currentSnapshot.get.manifest).files.map(_.seq).sorted
    assert(aSeqs == jSeqs)
  }

  test("hadoop layout: export by directory resolves via version-hint and reads back") {
    // the exact failure mode reference interoperability.md:108-112 shows:
    // a stock `hadoop` catalog pointed at a table DIRECTORY probes
    // metadata/version-hint.text → v<N>.metadata.json. hadoopLayout=true
    // emits that layout; importTableDir registers by directory.
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(120))
    src.append(spark.read.parquet(s"$sf/orders.parquet").limit(30)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    val dir = outDir()
    IcebergExport.exportBinary(src, dir, formatVersion = 2, hadoopLayout = true)
    val metaFiles = new java.io.File(s"$dir/metadata").listFiles().map(_.getName).toSet
    assert(metaFiles.contains("version-hint.text"))
    assert(metaFiles.contains(s"v${src.meta.version}.metadata.json"))
    assert(metaFiles.exists(f => f.startsWith("snap-") && f.endsWith(".avro")))
    assert(!new java.io.File(dir, "metadata.json").exists(),
      "hadoop layout is the real directory shape, not the flat artifact")
    // register by DIRECTORY, not metadata path
    val imp = IcebergImport.importTableDir(spark, dir, tmp())
    assert(imp.toDF().orderBy("o_orderkey").collect().toSeq ==
      src.toDF().orderBy("o_orderkey").collect().toSeq)
    // a directory WITHOUT the hint refuses with the documented guidance
    val bare = outDir()
    IcebergExport.exportBinary(src, bare, formatVersion = 2)
    val e = intercept[IllegalArgumentException](
      IcebergImport.importTableDir(spark, bare, tmp()))
    assert(e.getMessage.contains("version-hint.text"))
  }

  test("avro partition values are Iceberg-semantics; graft values restore") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(100),
      partitionFields = Seq(PartitionField("o_orderdate", "months", "o_month")))
    val dir = outDir()
    IcebergExport.exportBinary(src, dir)
    val manifest = new java.io.File(dir).listFiles()
      .find(f => f.getName.endsWith("-m0.avro")).get
    val c = Avro.readContainer(java.nio.file.Files.readAllBytes(manifest.toPath))
    // manifest file metadata carries Iceberg's required keys
    assert(new String(c.meta("format-version")) == "1")
    assert(c.meta.contains("schema") && c.meta.contains("partition-spec"))
    val avroMonths = c.records.map(_.apply("data_file")
      .asInstanceOf[Map[String, Any]]("partition")
      .asInstanceOf[Map[String, Any]]("o_month").asInstanceOf[Int]).toSet
    val graftMonths = MetaIO.loadManifestData(
      spark.sparkContext.hadoopConfiguration, src.meta.location,
      src.meta.currentSnapshot.get.manifest).files
      .map(_.partitionValues("o_month").toInt).toSet
    // epoch-relative on the wire (Iceberg), calendar-absolute in graft
    assert(avroMonths == graftMonths.map(_ - 1970 * 12))
    // …and the importer shifts them back
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    val impMonths = MetaIO.loadManifestData(
      spark.sparkContext.hadoopConfiguration, imp.meta.location,
      imp.meta.currentSnapshot.get.manifest).files
      .map(_.partitionValues("o_month").toInt).toSet
    assert(impMonths == graftMonths)
    // bounds ride the avro entries (single-value binary, keyed by field id)
    val lb = c.records.head("data_file").asInstanceOf[Map[String, Any]]("lower_bounds")
    assert(lb != null && lb.asInstanceOf[Seq[_]].nonEmpty)
  }

  test("bucket specs export as void (never mis-prunes) and restore on import") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(60),
      partitionFields = Seq(PartitionField("o_custkey", "bucket[4]", "ob")))
    val dir = outDir()
    IcebergExport.exportBinary(src, dir)
    val root = mapper.readTree(MetaIO.readString(
      spark.sparkContext.hadoopConfiguration, s"$dir/metadata.json"))
    val pf = root.get("partition-spec").get(0)
    // a real Iceberg reader sees void — graft's xxhash64 bucket numbers
    // under a murmur3 `bucket[4]` spec would prune WRONG files
    assert(pf.get("transform").asText() == "void")
    assert(pf.get("graft-transform").asText() == "bucket[4]")
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    assert(imp.meta.currentSpec.fields.head.transform == "bucket[4]")
    assert(imp.toDF().count() == 60)
  }

  test("merge-on-read snapshots: historical omitted + declared, current refuses") {
    val loc = tmp()
    val t = GraftTable.createAs(spark, loc,
      spark.read.parquet(s"$sf/orders.parquet").limit(100))
    t.deleteMergeOnRead("o_orderkey % 7 = 0") // snapshot 2: MOR predicate
    // current snapshot carries the MOR payload → v1 cannot represent it
    val e = intercept[IllegalStateException](
      IcebergExport.exportBinary(t, outDir()))
    assert(e.getMessage.contains("materializeDeletes"))
    // after materializing, the CURRENT snapshot is clean; the historical
    // MOR snapshot is omitted and declared
    t.materializeDeletes()
    val dir = outDir()
    IcebergExport.exportBinary(t, dir)
    val root = mapper.readTree(MetaIO.readString(
      spark.sparkContext.hadoopConfiguration, s"$dir/metadata.json"))
    assert(root.get("properties").has("graft.omitted-snapshots"))
    val exported = {
      val it = root.get("snapshots").elements()
      val b = Seq.newBuilder[Long]
      while (it.hasNext) b += it.next().get("snapshot-id").asLong()
      b.result()
    }
    assert(!exported.contains(
      root.get("properties").get("graft.omitted-snapshots").asText().toLong))
    // the omitted snapshot's parent link re-chains: every exported parent
    // pointer resolves inside the exported set
    val it2 = root.get("snapshots").elements()
    while (it2.hasNext) {
      val s = it2.next()
      if (s.has("parent-snapshot-id"))
        assert(exported.contains(s.get("parent-snapshot-id").asLong()))
    }
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    assert(imp.toDF().count() == t.toDF().count())
  }

  test("ANALYZE sketches ship in a real Puffin container and restore") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(300))
    src.analyze(Seq("o_orderkey", "o_orderstatus"))
    val dir = outDir()
    IcebergExport.exportBinary(src, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    // a genuine .puffin artifact, indexed by the metadata statistics entry
    val puffin = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".puffin")).get
    val bytes = java.nio.file.Files.readAllBytes(puffin.toPath)
    assert(graft.formats.Puffin.isPuffin(bytes))
    val pf = graft.formats.Puffin.read(bytes)
    assert(pf.blobs.map(_.blobType).distinct == Seq(PuffinStats.KmvType))
    assert(pf.blobs.size == 2) // one KMV blob per analyzed column
    val root = mapper.readTree(MetaIO.readString(conf, s"$dir/metadata.json"))
    val st = root.get("statistics").get(0)
    assert(st.get("statistics-path").asText() == puffin.getPath)
    assert(st.get("file-size-in-bytes").asLong() == bytes.length.toLong)
    assert(st.get("file-footer-size-in-bytes").asLong() == pf.footerSize)
    // the imported table serves the SAME NDV from the translated payload
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    assert(imp.columnNdv("o_orderkey") == src.columnNdv("o_orderkey"))
    assert(imp.columnNdv("o_orderstatus") == src.columnNdv("o_orderstatus"))
    // sketch buffers survive bit-for-bit (mergeability is the point)
    val srcSp = MetaIO.loadStatsFile(conf, src.meta.location,
      src.meta.properties(TableFormat.StatsFile))
    val impSp = MetaIO.loadStatsFile(conf, imp.meta.location,
      imp.meta.properties(TableFormat.StatsFile))
    assert(impSp.k == srcSp.k)
    assert(impSp.sketches.keySet == srcSp.sketches.keySet)
    assert(impSp.sketches.forall { case (c, a) => a.sameElements(srcSp.sketches(c)) })
  }

  test("binary export survives a historical spec with a dropped source (review r11)") {
    // the ADVICE-r10 metadataJson shape, now for the manifest translator:
    // files committed under spec 0 still resolve against it at export
    // time, but spec 0's source column is gone — the field must be
    // omitted from the avro partition record, never crash the export
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(80),
      partitionFields = Seq(PartitionField("o_orderpriority", "identity", "o_prio")))
    t.setPartitionSpec(Seq(PartitionField("o_orderdate", "years", "o_year")))
    t.append(spark.read.parquet(s"$sf/orders.parquet").limit(40)
      .withColumn("o_orderkey", col("o_orderkey") + 5000000L))
    t.dropColumn("o_orderpriority")
    val dir = outDir()
    IcebergExport.exportBinary(t, dir) // used to throw on spec 0's files
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    assert(imp.toDF().count() == 120)
    // the current spec's partition values made it through intact
    val conf = spark.sparkContext.hadoopConfiguration
    val files = MetaIO.loadManifestData(conf, imp.meta.location,
      imp.meta.currentSnapshot.get.manifest).files
    assert(files.filter(_.specId == 1).forall(_.partitionValues.contains("o_year")))
    // spec-0 files import with the unresolvable field absent, not bogus
    assert(files.filter(_.specId == 0).forall(!_.partitionValues.contains("o_prio")))
  }

  test("ANALYZE + partition stats BOTH survive the binary round trip (review r11)") {
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(400),
      partitionFields = Seq(PartitionField("o_orderstatus", "identity", "status")))
    t.analyze(Seq("o_orderkey"))
    t.computePartitionStats()
    val dir = outDir()
    IcebergExport.exportBinary(t, dir)
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    // column NDV serves from the translated Puffin payload…
    assert(imp.columnNdv("o_orderkey") == t.columnNdv("o_orderkey"))
    // …AND the partition-stats payload traveled with the artifact (it
    // used to dangle, dropping every stats pointer on import)
    assert(imp.partitionStats.nonEmpty)
    assert(imp.partitionStats.get.entries.map(e =>
        (e.partition, e.dataFileCount, e.dataRecordCount)).toSet ==
      t.partitionStats.get.entries.map(e =>
        (e.partition, e.dataFileCount, e.dataRecordCount)).toSet)
  }

  test("partition statistics export in the spec's parquet shape; a stock reader consumes it") {
    // the Iceberg table spec's "Partition Statistics" file: fixed
    // field-id'd parquet schema a real engine reads without graft — the
    // `partition-statistics` metadata entry points at it (binary exports;
    // graft's JSON payload rides alongside for graft importers)
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(400)
        .withColumn("o_orderdate", col("o_orderdate").cast("date")),
      partitionFields = Seq(
        PartitionField("o_orderstatus", "identity", "status"),
        PartitionField("o_orderdate", "months", "o_month")))
    t.computePartitionStats()
    val dir = outDir()
    IcebergExport.exportBinary(t, dir, formatVersion = 2)
    val metaJson = mapper.readTree(new java.io.File(dir, "metadata.json"))
    val psArr = metaJson.get("partition-statistics")
    assert(psArr.size() == 1)
    val entry = psArr.get(0)
    assert(entry.get("snapshot-id").asLong() == t.meta.currentSnapshotId.get)
    val path = entry.get("statistics-path").asText()
    assert(path.endsWith(".parquet"), s"spec shape is parquet, got $path")
    assert(entry.get("file-size-in-bytes").asLong() ==
      new java.io.File(new java.net.URI(
        if (path.contains(":/")) path else "file:" + path).getPath).length())

    // a STOCK reader (plain spark.read.parquet — no graft code) consumes
    // the file: spec columns present, counters match `.partitions`
    val df = spark.read.parquet(path)
    assert(df.columns.toSet == Set("partition", "spec_id", "data_record_count",
      "data_file_count", "total_data_file_size_in_bytes", "last_updated_snapshot_id"))
    val got = df.selectExpr("partition.status", "partition.o_month",
        "spec_id", "data_file_count", "data_record_count").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    val want = t.partitionStats.get.entries.map { e =>
      val kv = e.partition.split("/").map { s =>
        val i = s.indexOf('='); s.substring(0, i) -> s.substring(i + 1) }.toMap
      (kv("status"), kv("o_month").toInt - 1970 * 12, e.specId,
        e.dataFileCount.toInt, e.dataRecordCount)
    }.toSet
    assert(got == want, s"parquet stats must equal .partitions:\n$got\nvs\n$want")
    // month transform values are Iceberg semantics: months SINCE EPOCH
    assert(got.forall { case (_, m, _, _, _) => m > 0 && m < 12 * 200 })

    // a FOREIGN document (graft payload pointers stripped) still serves
    // `.partitions` from the parquet translation on import
    val stripped = {
      val root = mapper.readTree(new java.io.File(dir, "metadata.json"))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val props = root.get("properties")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      props.remove("graft.partition-stats.file")
      props.remove("graft.partition-stats.snapshot-id")
      val p = s"$dir/metadata-foreign.json"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        mapper.writeValueAsString(root))
      p
    }
    val imp = IcebergImport.importMetadata(spark, stripped, tmp())
    assert(imp.partitionStats.nonEmpty,
      "foreign import must translate the spec parquet back into a payload")
    assert(imp.partitionStats.get.entries.map(e =>
        (e.partition, e.dataFileCount, e.dataRecordCount)).toSet ==
      t.partitionStats.get.entries.map(e =>
        (e.partition, e.dataFileCount, e.dataRecordCount)).toSet)
  }

  test("partition stats on an UNPARTITIONED table: binary export skips the spec shape cleanly") {
    // an empty unified partition struct cannot be a parquet group — the
    // export must omit the spec-shape entry (not crash), and the graft
    // payload still serves .partitions through the property round trip
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(100))
    t.computePartitionStats()
    val dir = outDir()
    IcebergExport.exportBinary(t, dir, formatVersion = 2)
    val metaJson = mapper.readTree(new java.io.File(dir, "metadata.json"))
    assert(metaJson.get("partition-statistics").size() == 0)
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    assert(imp.partitionStats.nonEmpty)
    assert(imp.partitionStats.get.entries == t.partitionStats.get.entries)
  }

  test("CALL system.export_iceberg → register_iceberg round-trips the facade") {
    val g = new graft.sources.GraftSql(spark,
      Files.createTempDirectory("graft_wh_avro").toString)
    graft.sources.Catalog.registerAll(spark, sf)
    g.sql("CREATE TABLE exp AS SELECT * FROM nation")
    val dir = outDir()
    g.sql(s"CALL system.export_iceberg('exp', '$dir')")
    // the artifact is binary: real Avro manifests + metadata.json
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.contains("metadata.json") && files.exists(_.endsWith(".avro")))
    g.sql(s"CALL system.register_iceberg('back', '$dir/metadata.json')")
    assert(g.sql("SELECT COUNT(*) AS n FROM back").head().getLong(0) == 25)
    assert(g.sql("SELECT COUNT(*) AS n FROM back WHERE n_regionkey = 0")
      .head().getLong(0) ==
      spark.read.parquet(s"$sf/nation.parquet")
        .filter($"n_regionkey" === 0).count())
  }

  test("v2 export round-trips merge-on-read state: pos + DV + equality deletes") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet")
        .orderBy($"o_orderkey").limit(2000).repartition(4))
    src.deleteMergeOnReadPositions("o_orderstatus = 'F'") // classic pos file
    src.deleteMergeOnReadDV("o_totalprice > 250000")      // DV bitmap file
    src.upsertMergeOnRead(
      spark.read.parquet(s"$sf/orders.parquet").orderBy($"o_orderkey").limit(100)
        .withColumn("o_totalprice", lit(9.99)), Seq("o_orderkey")) // eq + append
    // v1 cannot carry the pending payloads — still refuses, pointing at v2
    val e = intercept[IllegalStateException](
      IcebergExport.exportBinary(src, outDir()))
    assert(e.getMessage.contains("formatVersion = 2"))
    val dir = outDir()
    IcebergExport.exportBinary(src, dir, formatVersion = 2)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = mapper.readTree(MetaIO.readString(conf, s"$dir/metadata.json"))
    assert(root.get("format-version").asInt() == 2)
    assert(root.has("last-sequence-number") && root.has("sort-orders"))
    // no snapshot omitted: v2 represents the whole chain
    assert(!root.get("properties").has("graft.omitted-snapshots"))
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    // visible rows identical — all three delete kinds applied
    val a = imp.toDF().orderBy("o_orderkey").collect()
    val b = src.toDF().orderBy("o_orderkey").collect()
    assert(a.length == b.length && a.sameElements(b))
    // the sequencing pin: the upsert's OWN appended rows stay visible
    // (its equality delete only hides strictly-older data files)
    assert(imp.toDF().filter($"o_totalprice" === 9.99).count() == 100)
    // graft's predicate deletes have no v2 file form: still refuse
    val src2 = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(200))
    src2.deleteMergeOnRead("o_orderkey % 3 = 0")
    val e2 = intercept[IllegalStateException](
      IcebergExport.exportBinary(src2, outDir(), formatVersion = 2))
    assert(e2.getMessage.contains("materializeDeletes"))
  }

  test("foreign v2 document: sequence numbers + delete manifests import (r11)") {
    // hand-built v2 table, the shape most real-world Iceberg tables have
    // today: schemas-list-only metadata, a data manifest whose entry
    // INHERITS its sequence number from the manifest list, and a delete
    // manifest carrying one position-delete file (SCHEMELESS paths — the
    // importer must canonicalize or the MOR join silently deletes
    // nothing) and one equality-delete file with equality_ids.
    val conf = spark.sparkContext.hadoopConfiguration
    val stage = Files.createTempDirectory("graft_v2_data").toString
    writeWithFieldIds(spark.read.parquet(s"$sf/orders.parquet")
      .orderBy(col("o_orderkey")).limit(50), s"$stage/d")
    val dataFile = new java.io.File(s"$stage/d").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val rows = spark.read.parquet(dataFile.getPath).collect()
    val n = rows.length

    // position delete: rows 0 and 1 of the data file, schemeless path
    import spark.implicits._
    Seq((dataFile.getPath, 0L), (dataFile.getPath, 1L))
      .toDF("file_path", "pos")
      .coalesce(1).write.mode("overwrite").parquet(s"$stage/posdel")
    val posFile = new java.io.File(s"$stage/posdel").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    // equality delete: two keys NOT at positions 0/1 — real engines
    // stamp field ids on delete files too (o_orderkey = field 1), and
    // the id-resolved import reads them by id
    val eqKeys = Seq(rows(5).getLong(0), rows(6).getLong(0))
    writeWithFieldIds(eqKeys.toDF("o_orderkey"), s"$stage/eqdel")
    val eqFile = new java.io.File(s"$stage/eqdel").listFiles()
      .find(_.getName.endsWith(".parquet")).get

    val dir = outDir()
    val v2EntrySchema =
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"snapshot_id","type":["null","long"],"default":null},
        |  {"name":"sequence_number","type":["null","long"],"default":null},
        |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |    {"name":"content","type":"int"},
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
        |    {"name":"record_count","type":"long"},
        |    {"name":"file_size_in_bytes","type":"long"},
        |    {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}
        |  ]}}]}""".stripMargin
    def dataFileRec(content: Int, path: String, count: Long, size: Long,
        eqIds: Any): Map[String, Any] = Map[String, Any](
      "content" -> content, "file_path" -> path, "file_format" -> "PARQUET",
      "partition" -> Map.empty[String, Any], "record_count" -> count,
      "file_size_in_bytes" -> size, "equality_ids" -> eqIds)
    // data manifest: entry seq NULL → inherits the list row's seq (1)
    val dataEntry = Map[String, Any]("status" -> 1, "snapshot_id" -> 99L,
      "sequence_number" -> null,
      "data_file" -> dataFileRec(0, dataFile.getPath, n.toLong, dataFile.length(), null))
    val dataM = Avro.writeContainer(v2EntrySchema, Seq(dataEntry))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/v2-data-m0.avro"), dataM)
    // delete manifest at seq 2: pos delete explicit seq, eq delete inherits
    val posEntry = Map[String, Any]("status" -> 1, "snapshot_id" -> 99L,
      "sequence_number" -> 2L,
      "data_file" -> dataFileRec(1, posFile.getPath, 2L, posFile.length(), null))
    val eqEntry = Map[String, Any]("status" -> 1, "snapshot_id" -> 99L,
      "sequence_number" -> null,
      "data_file" -> dataFileRec(2, eqFile.getPath, 2L, eqFile.length(), Seq(1)))
    val delM = Avro.writeContainer(v2EntrySchema, Seq(posEntry, eqEntry))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/v2-del-m0.avro"), delM)

    val v2ListSchema =
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string"},
        |  {"name":"manifest_length","type":"long"},
        |  {"name":"partition_spec_id","type":"int"},
        |  {"name":"content","type":"int"},
        |  {"name":"sequence_number","type":"long"},
        |  {"name":"min_sequence_number","type":"long"},
        |  {"name":"added_snapshot_id","type":"long"}]}""".stripMargin
    val listRows = Seq(
      Map[String, Any]("manifest_path" -> s"$dir/v2-data-m0.avro",
        "manifest_length" -> dataM.length.toLong, "partition_spec_id" -> 0,
        "content" -> 0, "sequence_number" -> 1L, "min_sequence_number" -> 1L,
        "added_snapshot_id" -> 99L),
      Map[String, Any]("manifest_path" -> s"$dir/v2-del-m0.avro",
        "manifest_length" -> delM.length.toLong, "partition_spec_id" -> 0,
        "content" -> 1, "sequence_number" -> 2L, "min_sequence_number" -> 2L,
        "added_snapshot_id" -> 99L))
    val lBytes = Avro.writeContainer(v2ListSchema, listRows)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/snap-99-v2.avro"), lBytes)

    val fields = spark.read.parquet(dataFile.getPath).schema.fields.zipWithIndex
      .map { case (f, i) =>
        s"""{"id": ${i + 1}, "name": "${f.name}", "required": false, "type": "${
          f.dataType match {
            case org.apache.spark.sql.types.LongType => "long"
            case org.apache.spark.sql.types.IntegerType => "int"
            case org.apache.spark.sql.types.DoubleType => "double"
            case org.apache.spark.sql.types.DateType => "date"
            case _ => "string"
          }}"}"""
      }.mkString(",")
    val metadata =
      s"""{"format-version": 2,
         |"table-uuid": "22222222-3333-4444-5555-666666666666",
         |"location": "$dir",
         |"last-updated-ms": 1700000000000,
         |"last-sequence-number": 2,
         |"last-column-id": 9,
         |"schemas": [{"type": "struct", "schema-id": 0, "fields": [$fields]}],
         |"current-schema-id": 0,
         |"partition-specs": [{"spec-id": 0, "fields": []}],
         |"default-spec-id": 0,
         |"current-snapshot-id": 99,
         |"snapshots": [{"snapshot-id": 99, "sequence-number": 2,
         |  "timestamp-ms": 1700000000000,
         |  "summary": {"operation": "append"},
         |  "manifest-list": "$dir/snap-99-v2.avro"}],
         |"snapshot-log": [{"timestamp-ms": 1700000000000, "snapshot-id": 99}]}
         |""".stripMargin
    MetaIO.writeString(conf, s"$dir/metadata.json", metadata)

    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    // both delete kinds apply: 2 positions + 2 keys, no overlap
    assert(imp.toDF().count() == n - 4)
    val got = imp.toDF().select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    assert(!got.contains(rows(0).getLong(0)) && !got.contains(rows(1).getLong(0)),
      "position-deleted rows must be gone (path canonicalization)")
    eqKeys.foreach(k => assert(!got.contains(k), s"equality-deleted key $k visible"))
    // the sequence numbers landed: data file seq 1 (inherited), eq seq 2
    val md = MetaIO.loadManifestData(conf, imp.meta.location,
      imp.meta.currentSnapshot.get.manifest)
    assert(md.files.forall(_.seq == 1L))
    assert(md.equalityDeletes.map(_.seq) == Seq(2L))
    assert(md.positionDeleteFiles.nonEmpty)
  }

  test("foreign v1 document with no graft riders imports end-to-end") {
    // hand-built table: one parquet data file + one avro manifest + one
    // avro manifest list + a metadata document carrying ONLY required v1
    // fields (legacy partition-spec, no graft.* properties, no
    // null_value_counts/bounds) — the shape an external writer produces
    val conf = spark.sparkContext.hadoopConfiguration
    val dataDir = Files.createTempDirectory("graft_foreign_data").toString
    writeWithFieldIds(spark.read.parquet(s"$sf/region.parquet"), s"$dataDir/d")
    val dataFile = new java.io.File(s"$dataDir/d").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val rows = spark.read.parquet(dataFile.getPath).count()

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
        |    {"name":"file_size_in_bytes","type":"long"},
        |    {"name":"block_size_in_bytes","type":"long"}]}}]}""".stripMargin
    val entry = Map[String, Any]("status" -> 1, "snapshot_id" -> 99L,
      "data_file" -> Map[String, Any](
        "file_path" -> dataFile.getPath, "file_format" -> "PARQUET",
        "partition" -> Map.empty[String, Any],
        "record_count" -> rows, "file_size_in_bytes" -> dataFile.length(),
        "block_size_in_bytes" -> (64L * 1024 * 1024)))
    val mBytes = Avro.writeContainer(entrySchema, Seq(entry))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/foreign-m0.avro"), mBytes)
    val listRow = Map[String, Any]("manifest_path" -> s"$dir/foreign-m0.avro",
      "manifest_length" -> mBytes.length.toLong, "partition_spec_id" -> 0,
      "added_snapshot_id" -> 99L, "added_data_files_count" -> 1,
      "existing_data_files_count" -> 0, "deleted_data_files_count" -> 0,
      "added_rows_count" -> rows, "existing_rows_count" -> 0L,
      "deleted_rows_count" -> 0L)
    val lBytes = Avro.writeContainer(IcebergManifests.manifestListSchemaJson,
      Seq(listRow))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/snap-99.avro"), lBytes)
    val metadata =
      s"""{"format-version": 1,
         |"table-uuid": "11111111-2222-3333-4444-555555555555",
         |"location": "$dir",
         |"last-updated-ms": 1700000000000,
         |"last-column-id": 3,
         |"schema": {"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "r_regionkey", "required": false, "type": "long"},
         |  {"id": 2, "name": "r_name", "required": false, "type": "string"},
         |  {"id": 3, "name": "r_comment", "required": false, "type": "string"}]},
         |"partition-spec": [],
         |"current-snapshot-id": 99,
         |"snapshots": [{"snapshot-id": 99, "timestamp-ms": 1700000000000,
         |  "summary": {"operation": "append"},
         |  "manifest-list": "$dir/snap-99.avro"}],
         |"snapshot-log": [{"timestamp-ms": 1700000000000, "snapshot-id": 99}]}
         |""".stripMargin
    MetaIO.writeString(conf, s"$dir/metadata.json", metadata)

    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    assert(imp.toDF().count() == rows)
    assert(imp.toDF().columns.toSeq ==
      Seq("r_regionkey", "r_name", "r_comment"))
    assert(imp.meta.currentSnapshotId.contains(99L))
    // the foreign entry's snapshot_id landed as the data sequence number
    assert(MetaIO.loadManifestData(conf, imp.meta.location,
      imp.meta.currentSnapshot.get.manifest).files.forall(_.seq == 99L))
  }

  test("exported manifest list + manifests parse in Apache Avro itself") {
    // the reference-implementation referee (avro-1.12 ships as a Spark
    // dependency, test-side only): every binary artifact exportBinary
    // writes must be readable by the library a real Iceberg engine
    // links against — not just by graft's own reader
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    def apacheRecords(f: java.io.File): Seq[GenericRecord] = {
      val rd = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(java.nio.file.Files.readAllBytes(f.toPath)),
        new GenericDatumReader[GenericRecord]())
      val out = Seq.newBuilder[GenericRecord]
      while (rd.hasNext) out += rd.next()
      rd.close()
      out.result()
    }
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(120),
      partitionFields = Seq(PartitionField("o_orderdate", "years", "o_year")))
    src.append(spark.read.parquet(s"$sf/orders.parquet").limit(30)
      .withColumn("o_orderkey", col("o_orderkey") + 5000000L))
    val dir = outDir()
    IcebergExport.exportBinary(src, dir)
    val files = new java.io.File(dir).listFiles()
    val lists = files.filter(f => f.getName.startsWith("snap-") && f.getName.endsWith(".avro"))
    val manifests = files.filter(f => f.getName.endsWith(".avro") && !f.getName.startsWith("snap-"))
    assert(lists.nonEmpty && manifests.nonEmpty)
    // manifest lists: every entry's manifest_path resolves to a written file
    val listedPaths = lists.flatMap(apacheRecords).map(
      _.get("manifest_path").toString)
    assert(listedPaths.nonEmpty)
    listedPaths.foreach(p => assert(new java.io.File(p).isFile, p))
    // manifests: entries carry data_file records whose file_path points at
    // real parquet and whose record_count sums to the table's row count
    val current = apacheRecords(lists.maxBy(_.getName)) // names sort by snapshot
    val entries = current.map(_.get("manifest_path").toString)
      .flatMap(p => apacheRecords(new java.io.File(p)))
    val dataFiles = entries.map(_.get("data_file").asInstanceOf[GenericRecord])
    assert(dataFiles.map(_.get("record_count").asInstanceOf[Long]).sum == 150L)
    dataFiles.foreach { df =>
      assert(df.get("file_path").toString.endsWith(".parquet"))
      assert(df.get("file_format").toString == "PARQUET")
    }
    // partition tuple decodes with the declared field name
    assert(dataFiles.forall(df =>
      df.get("partition").asInstanceOf[GenericRecord].get("o_year") != null))
  }

  test("v3 export parses in Apache Avro: row lineage + DV entries (referee)") {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    def apacheRecords(f: java.io.File): Seq[GenericRecord] = {
      val rd = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(java.nio.file.Files.readAllBytes(f.toPath)),
        new GenericDatumReader[GenericRecord]())
      val out = Seq.newBuilder[GenericRecord]
      while (rd.hasNext) out += rd.next()
      rd.close()
      out.result()
    }
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(150))
    src.append(spark.read.parquet(s"$sf/orders.parquet").limit(50)
      .withColumn("o_orderkey", col("o_orderkey") + 5000000L))
    src.deleteMergeOnReadDV("o_orderkey % 6 = 0")
    val dir = outDir()
    IcebergExport.exportBinary(src, dir, formatVersion = 3)
    val files = new java.io.File(dir).listFiles()
    val lists = files.filter(f => f.getName.startsWith("snap-") &&
      f.getName.endsWith(".avro") && !f.getName.contains("-deletes-"))
    // the library a real engine links against reads the v3 list rows,
    // including the row-lineage inheritance base
    val listRows = lists.flatMap(apacheRecords)
    val dataRows = listRows.filter(_.get("content") == 0)
    assert(dataRows.nonEmpty)
    dataRows.foreach(r => assert(r.get("first_row_id") != null))
    // data manifests: explicit per-entry first_row_id; ranges cover 200
    val latest = apacheRecords(lists.maxBy(_.getName))
    val dataFiles = latest.filter(_.get("content") == 0)
      .map(_.get("manifest_path").toString)
      .flatMap(p => apacheRecords(new java.io.File(p)))
      .map(_.get("data_file").asInstanceOf[GenericRecord])
    val ranges = dataFiles.map(df => (df.get("first_row_id").asInstanceOf[Long],
      df.get("record_count").asInstanceOf[Long])).sortBy(_._1)
    assert(ranges.map(_._2).sum == 200L)
    assert(ranges.head._1 == 0L &&
      ranges.zip(ranges.tail).forall { case ((a, n), (b, _)) => a + n == b })
    // DV delete manifests: puffin pointers decode, no row ids
    val delFiles = latest.filter(_.get("content") == 1)
      .map(_.get("manifest_path").toString)
      .flatMap(p => apacheRecords(new java.io.File(p)))
      .map(_.get("data_file").asInstanceOf[GenericRecord])
    assert(delFiles.nonEmpty)
    delFiles.foreach { df =>
      assert(df.get("file_format").toString == "PUFFIN")
      assert(df.get("referenced_data_file") != null)
      assert(df.get("content_offset").asInstanceOf[Long] >= 4L)
      assert(df.get("first_row_id") == null)
    }
  }
}
