package graft.tables

import graft.SparkSpec
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Read-side Iceberg interop: IcebergImport registers a GraftTable from an
  * Iceberg v1 metadata JSON (the reference's interoperability.md read path),
  * pinned by round-tripping IcebergExport's own output — schema, partition
  * specs across evolution, the snapshot chain with graft's operation kinds,
  * refs, stats payloads and readable data must all survive.
  */
class IcebergInteropSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private def tmp(): String = Files.createTempDirectory("graft_interop").toString + "/t"

  private def exportTo(t: GraftTable): String = {
    val p = Files.createTempDirectory("graft_icemeta").toString + "/metadata.json"
    IcebergExport.export(t, p)
    p
  }

  test("export→import round-trip preserves schema, specs, snapshots, refs, data") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(200),
      partitionFields = Seq(PartitionField("o_orderdate", "months", "o_month")))
    src.append(spark.read.parquet(s"$sf/orders.parquet").limit(50)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    src.setPartitionSpec(Seq(PartitionField("o_orderstatus", "identity", "status")))
    src.append(spark.read.parquet(s"$sf/orders.parquet").limit(25)
      .withColumn("o_orderkey", col("o_orderkey") + 2000000L))
    src.createTag("audited", src.meta.currentSnapshotId.get)
    src.analyze(Seq("o_orderkey"))

    val imp = IcebergImport.importMetadata(spark, exportTo(src), tmp())
    val (sm, im) = (src.meta, imp.meta)
    assert(im.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      sm.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(im.specs.map(s => (s.specId, s.fields)) ==
      sm.specs.map(s => (s.specId, s.fields)))
    assert(im.currentSpecId == sm.currentSpecId)
    assert(im.snapshots.map(s =>
        (s.id, s.parentId, s.operation, s.totalFiles, s.totalRecords)) ==
      sm.snapshots.map(s =>
        (s.id, s.parentId, s.operation, s.totalFiles, s.totalRecords)))
    assert(im.currentSnapshotId == sm.currentSnapshotId)
    assert(im.refs == sm.refs)
    // data reads in place (metadata-only registration), values identical
    assert(imp.toDF().count() == src.toDF().count())
    assert(imp.toDF().agg(sum("o_totalprice")).head().getDouble(0) ==
      src.toDF().agg(sum("o_totalprice")).head().getDouble(0))
    // time travel works across the imported chain
    assert(imp.asOf(im.snapshots.head.id).count() == 200)
    // partition pruning survives: the months spec still plans fewer files
    assert(imp.toDF(Some("o_orderstatus = 'F'")).count() ==
      src.toDF().filter($"o_orderstatus" === "F").count())
    // the copied ANALYZE payload serves NDV on the imported table
    assert(imp.columnNdv("o_orderkey").isDefined)
  }

  test("renamed columns round-trip through the graft-physical field key") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(100)
        .select($"o_orderkey", $"o_totalprice"))
    src.renameColumn("o_totalprice", "price")
    val expect = src.toDF().agg(sum("price")).head().getDouble(0)

    val imp = IcebergImport.importMetadata(spark, exportTo(src), tmp())
    assert(imp.meta.schema.fieldNames.toSeq == Seq("o_orderkey", "price"))
    // the files carry the ORIGINAL physical column; reads must still map
    assert(imp.toDF().agg(sum("price")).head().getDouble(0) == expect)
    assert(ColumnMapping.physicalOf(imp.meta.schema, "price") == "o_totalprice")
  }

  test("legacy-only 'partition-spec' documents import the spec (ADVICE r10)") {
    // Iceberg v1's REQUIRED field is the legacy top-level `partition-spec`;
    // `partition-specs` is optional. A foreign writer emitting only the
    // legacy form must not import as silently unpartitioned.
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/orders.parquet").limit(100),
      partitionFields = Seq(PartitionField("o_orderdate", "months", "o_month")))
    val conf = spark.sparkContext.hadoopConfiguration
    val root = mapper.readTree(MetaIO.readString(conf, exportTo(src)))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    root.remove("partition-specs")
    root.remove("default-spec-id")
    val legacyPath = Files.createTempDirectory("graft_icemeta").toString + "/metadata.json"
    MetaIO.writeString(conf, legacyPath, mapper.writeValueAsString(root))
    val imp = IcebergImport.importMetadata(spark, legacyPath, tmp())
    assert(imp.meta.currentSpecId == 0)
    assert(imp.meta.specs.map(_.fields.map(f => (f.transform, f.name))) ==
      Seq(Seq(("months", "o_month"))))
    // the fallback spec is live: reads (and pruning) go through it
    assert(imp.toDF().count() == 100)
    assert(imp.toDF(Some("o_orderstatus = 'F'")).count() ==
      src.toDF().filter($"o_orderstatus" === "F").count())
  }

  test("corrupt manifests and existing targets refuse loudly") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet"))
    val metaPath = exportTo(src)

    // strip the JSON-manifest marker → the importer takes the REAL-Iceberg
    // Avro path (r11) and must refuse the JSON bytes as a corrupt
    // container, never half-import a guessed file list
    val doctored = mapper.readTree(MetaIO.readString(
      spark.sparkContext.hadoopConfiguration, metaPath))
    doctored.get("properties").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .remove("graft.manifest-format")
    val badPath = Files.createTempDirectory("graft_bad").toString + "/metadata.json"
    MetaIO.writeString(spark.sparkContext.hadoopConfiguration, badPath,
      doctored.toString)
    val e1 = intercept[IllegalArgumentException](
      IcebergImport.importMetadata(spark, badPath, tmp()))
    assert(e1.getMessage.contains("Avro"))

    // an existing graft table at the target refuses (no clobber)
    val occupied = tmp()
    GraftTable.createAs(spark, occupied,
      spark.read.parquet(s"$sf/region.parquet"))
    val e2 = intercept[IllegalArgumentException](
      IcebergImport.importMetadata(spark, metaPath, occupied))
    assert(e2.getMessage.contains("refusing to clobber"))
  }

  test("CALL system.register_iceberg registers through the facade") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/nation.parquet"))
    val metaPath = exportTo(src)
    val g = new graft.sources.GraftSql(spark,
      Files.createTempDirectory("graft_wh").toString)
    g.sql(s"CALL system.register_iceberg('imported', '$metaPath')")
    assert(g.sql("SELECT COUNT(*) AS n FROM imported").head().getLong(0) == 25)
    assert(g.sql("SELECT n_name FROM imported WHERE n_nationkey = 0")
      .head().getString(0).nonEmpty)
  }
}
