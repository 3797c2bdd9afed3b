package graft.tables

import graft.SparkSpec
import graft.formats.Avro
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.types.MetadataBuilder
import java.nio.file.Files

/** Column default values (the Iceberg v3 `initial-default` model): a
  * column added with a default reads that value for rows of files written
  * BEFORE the add, while later files carry real values (their nulls stay
  * null). Exported on v3 with the spec's keys; v1/v2 binary exports
  * refuse; graft riders round-trip the exact boundary; a foreign v3
  * default derives its boundary from snapshot schema-ids or refuses.
  */
class ColumnDefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_def").toString + "/t"
  private def outDir(): String = Files.createTempDirectory("graft_def_exp").toString

  test("initial-default fills pre-add files only; later nulls stay null") {
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet").limit(3))
    t.addColumnWithDefault("tier", StringType, "bronze")
    // pre-add rows read the default, not null
    assert(t.toDF().select("tier").collect().map(_.getString(0)).toSeq ==
      Seq.fill(3)("bronze"))
    // post-add file with a real value AND a genuine null
    t.append(Seq((100, "x", "gold"), (101, "y", null))
      .toDF("r_regionkey", "r_name", "tier"))
    val got = t.toDF().select("r_regionkey", "tier").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(100) == "gold")
    assert(got(101) == null, "a post-add null must STAY null")
    assert(got.count(_._2 == "bronze") == 3)
    // filters evaluate against the filled value on pre-add rows
    assert(t.toDF(Some("tier = 'bronze'")).count() == 3)
    assert(t.toDF(Some("tier IS NULL")).count() == 1)
  }

  test("numeric default participates in aggregates and fastMinMax stays safe") {
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet").limit(4))
    t.addColumnWithDefault("score", LongType, 7L)
    t.append(Seq((200, "z", 100L)).toDF("r_regionkey", "r_name", "score"))
    assert(t.toDF().agg(sum("score")).head.getLong(0) == 4 * 7L + 100L)
    // pre-add files carry no footer stats for the column → the manifest
    // fast path must REFUSE (its bounds would ignore the default) and
    // the scan fallback serves the defaulted values
    assert(t.fastMinMax("score").isEmpty)
    assert(t.toDF().agg(min("score"), max("score")).head ==
      org.apache.spark.sql.Row(7L, 100L))
  }

  test("DV delete spanning pre-add AND post-add files (row-meta regression)") {
    // _metadata does not resolve through the default-fill UNION, so the
    // scan captures __gp_fp/__gp_pos per branch (rowMeta) — this case
    // pins the cross-epoch MOR read that caught the original bug
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet").limit(3))
    t.addColumnWithDefault("tier", StringType, "bronze")
    t.append(Seq((500, "q", "gold"), (501, "s", "silver"))
      .toDF("r_regionkey", "r_name", "tier"))
    val victim = t.toDF().select("r_regionkey").orderBy("r_regionkey")
      .limit(1).head.getInt(0)
    t.deleteMergeOnReadDV(s"r_regionkey IN ($victim, 500)")
    val rows = t.toDF().select("r_regionkey", "tier").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(!rows.contains(500) && !rows.contains(victim))
    assert(rows(501) == "silver")
    assert(rows.values.count(_ == "bronze") == 2)
  }

  test("equality deletes and CoW deletes match FILLED values") {
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet").limit(3))
    t.addColumnWithDefault("tier", StringType, "bronze")
    t.append(Seq((600, "r", "bronze")).toDF("r_regionkey", "r_name", "tier"))
    // eq delete keyed ON the defaulted column hits pre-add rows too
    t.deleteMergeOnReadEquality(Seq("bronze").toDF("tier"), Seq("tier"))
    assert(t.toDF().count() == 0)
    // CoW delete predicate on the defaulted column: raw nulls would
    // silently skip every pre-add file
    val c = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet").limit(3))
    c.addColumnWithDefault("tier", StringType, "bronze")
    c.append(Seq((700, "u", "gold")).toDF("r_regionkey", "r_name", "tier"))
    c.delete("tier = 'bronze'")
    assert(c.toDF().select("tier").collect().map(_.getString(0)).toSeq ==
      Seq("gold"))
  }

  test("write-default: an append omitting the defaulted column fills it") {
    // required for coherence, not convenience: the appended file
    // postdates the add boundary, so a read would see a missing column
    // as raw null — the write must materialize the default
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet").limit(2))
    t.addColumnWithDefault("tier", StringType, "bronze")
    t.append(Seq((800, "v")).toDF("r_regionkey", "r_name"))
    val got = t.toDF().select("r_regionkey", "tier").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(800) == "bronze")
    assert(got.size == 3 && got.values.forall(_ == "bronze"))
  }

  test("write-default fill: case-differing column counts as PRESENT") {
    // the session resolver is case-insensitive (spark.sql.caseSensitive
    // defaults to false), so a frame carrying TIER provides tier — the
    // fill must not overwrite the user's real values (review finding)
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet").limit(2))
    t.addColumnWithDefault("tier", StringType, "bronze")
    t.append(Seq((850, "c", "gold")).toDF("r_regionkey", "r_name", "TIER"))
    val got = t.toDF().select("r_regionkey", "tier").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(850) == "gold", "case-differing real value must survive")
    assert(got.values.count(_ == "bronze") == 2)
  }

  test("v3 export carries initial-default; v1/v2 binary exports refuse") {
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet").limit(3))
    t.addColumnWithDefault("tier", StringType, "bronze")
    val e = intercept[IllegalStateException](
      IcebergExport.exportBinary(t, outDir()))
    assert(e.getMessage.contains("initial-default"))
    val dir = outDir()
    IcebergExport.exportBinary(t, dir, formatVersion = 3)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(dir, "metadata.json"))
    val tier = {
      var found: com.fasterxml.jackson.databind.JsonNode = null
      root.get("schema").get("fields").forEach(f =>
        if (f.get("name").asText() == "tier") found = f)
      found
    }
    assert(tier.get("initial-default").asText() == "bronze")
    assert(tier.get("write-default").asText() == "bronze")

    // round trip through import: defaults (and the exact boundary) survive
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    assert(imp.toDF().select("tier").collect().map(_.getString(0)).toSeq ==
      Seq.fill(3)("bronze"))
    assert(ColumnDefaults.of(imp.meta.schema("tier")) ==
      ColumnDefaults.of(t.meta.schema("tier")))

    // id-attached parity: omitting a NON-defaulted column on write is
    // accepted (absent from the file, read back as null), matching the
    // name-based path's behavior (review finding)
    imp.append(Seq((950, "gold")).toDF("r_regionkey", "tier"))
    val r950 = imp.toDF().filter(col("r_regionkey") === 950)
      .select("r_name", "tier").head
    assert(r950.isNullAt(0) && r950.getString(1) == "gold")
  }

  test("foreign v3 default derives its boundary from snapshot schema-ids") {
    // hand-built doc: snapshot 1 under schema 0 (no 'tier'), snapshot 2
    // under schema 1 (tier + initial-default). File A rides snapshot 1 →
    // filled; file B rides snapshot 2 with a real null → stays null.
    val conf = spark.sparkContext.hadoopConfiguration
    val stage = Files.createTempDirectory("graft_def_data").toString
    def withIds(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
      df.select(df.schema.fields.zipWithIndex.map { case (f, i) =>
        col(f.name).as(f.name, new MetadataBuilder()
          .putLong(ColumnMapping.ParquetFieldIdKey, i + 1L).build())
      }.toSeq: _*).coalesce(1).write.parquet(dir)
    withIds(Seq((1, "alpha")).toDF("id", "name"), s"$stage/a")
    withIds(Seq((2, "beta", null.asInstanceOf[String]), (3, "gamma", "real"))
      .toDF("id", "name", "tier"), s"$stage/b")
    def one(d: String) = new java.io.File(d).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val (fa, fb) = (one(s"$stage/a"), one(s"$stage/b"))

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
    def manifest(name: String, path: String, snap: Long, rows: Long): Long = {
      val bytes = Avro.writeContainer(entrySchema, Seq(Map[String, Any](
        "status" -> 1, "snapshot_id" -> snap,
        "data_file" -> Map[String, Any]("file_path" -> path,
          "file_format" -> "PARQUET", "partition" -> Map.empty[String, Any],
          "record_count" -> rows, "file_size_in_bytes" -> 10L))))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"), bytes)
      bytes.length.toLong
    }
    def list(name: String, rows: Seq[(String, Long)]): Unit = {
      val bytes = Avro.writeContainer(IcebergManifests.manifestListSchemaJson,
        rows.map { case (p, len) => Map[String, Any]("manifest_path" -> s"$dir/$p",
          "manifest_length" -> len, "partition_spec_id" -> 0,
          "added_snapshot_id" -> 1L) })
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"), bytes)
      ()
    }
    val la = manifest("def-m0.avro", fa.getPath, 1L, 1L)
    val lb = manifest("def-m1.avro", fb.getPath, 2L, 2L)
    list("snap-1-def.avro", Seq(("def-m0.avro", la)))
    list("snap-2-def.avro", Seq(("def-m0.avro", la), ("def-m1.avro", lb)))
    val metadata =
      s"""{"format-version": 3,
         |"table-uuid": "dddddddd-eeee-ffff-0000-111111111111",
         |"location": "$dir",
         |"last-updated-ms": 1700000000000,
         |"last-sequence-number": 2,
         |"last-column-id": 3,
         |"next-row-id": 0,
         |"schemas": [
         |  {"type": "struct", "schema-id": 0, "fields": [
         |    {"id": 1, "name": "id", "required": false, "type": "int"},
         |    {"id": 2, "name": "name", "required": false, "type": "string"}]},
         |  {"type": "struct", "schema-id": 1, "fields": [
         |    {"id": 1, "name": "id", "required": false, "type": "int"},
         |    {"id": 2, "name": "name", "required": false, "type": "string"},
         |    {"id": 3, "name": "tier", "required": false, "type": "string",
         |     "initial-default": "bronze", "write-default": "bronze"}]}],
         |"current-schema-id": 1,
         |"partition-specs": [{"spec-id": 0, "fields": []}],
         |"default-spec-id": 0,
         |"current-snapshot-id": 2,
         |"snapshots": [
         |  {"snapshot-id": 1, "sequence-number": 1, "schema-id": 0,
         |   "timestamp-ms": 1700000000000,
         |   "summary": {"operation": "append"},
         |   "manifest-list": "$dir/snap-1-def.avro"},
         |  {"snapshot-id": 2, "sequence-number": 2, "schema-id": 1,
         |   "parent-snapshot-id": 1,
         |   "timestamp-ms": 1700000000001,
         |   "summary": {"operation": "append"},
         |   "manifest-list": "$dir/snap-2-def.avro"}],
         |"snapshot-log": [{"timestamp-ms": 1700000000000, "snapshot-id": 1},
         |  {"timestamp-ms": 1700000000001, "snapshot-id": 2}]}
         |""".stripMargin
    MetaIO.writeString(conf, s"$dir/metadata.json", metadata)

    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    val got = imp.toDF().select("id", "tier").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(1) == "bronze", "pre-add file fills the default")
    assert(got(2) == null, "post-add genuine null stays null")
    assert(got(3) == "real")

    // the same doc WITHOUT snapshot schema-ids cannot derive a boundary →
    // refuse loudly rather than import default-inert
    val stripped = metadata.replace(""""schema-id": 0,
         |""".stripMargin, "").replace(""""schema-id": 1,
         |""".stripMargin, "")
    MetaIO.writeString(conf, s"$dir/metadata2.json",
      stripped.replace(s""""location": "$dir"""", s""""location": "$dir/x""""))
    val e = intercept[IllegalArgumentException](
      IcebergImport.importMetadata(spark, s"$dir/metadata2.json", tmp()))
    assert(e.getMessage.contains("boundary"))

    // snapshot expiry ate the add point (the with-field snapshot's
    // parent DANGLES): files below the boundary may hold genuine nulls
    // written after the add — refuse loudly (review finding), never fill
    val dangling = metadata
      .replace(""""snapshots": [
         |  {"snapshot-id": 1, "sequence-number": 1, "schema-id": 0,
         |   "timestamp-ms": 1700000000000,
         |   "summary": {"operation": "append"},
         |   "manifest-list": "$dir/snap-1-def.avro"},
         |""".stripMargin.replace("$dir", dir), """"snapshots": [
""")
      .replace(""""current-snapshot-id": 2""", """"current-snapshot-id": 2""")
      .replace(s""""location": "$dir"""", s""""location": "$dir/y"""")
    MetaIO.writeString(conf, s"$dir/metadata3.json", dangling)
    val e2 = intercept[IllegalArgumentException](
      IcebergImport.importMetadata(spark, s"$dir/metadata3.json", tmp()))
    assert(e2.getMessage.contains("no surviving pre-add parent"))

    // a schema-id resolving to NOTHING in the schemas list is as
    // unclassifiable as a missing one — the below-boundary guard must
    // refuse, never count it as known-to-lack-the-field (review finding)
    val unresolvable = metadata
      .replace(""""sequence-number": 1, "schema-id": 0,""",
        """"sequence-number": 1, "schema-id": 99,""")
      .replace(s""""location": "$dir"""", s""""location": "$dir/w"""")
    MetaIO.writeString(conf, s"$dir/metadata5.json", unresolvable)
    val e3 = intercept[IllegalArgumentException](
      IcebergImport.importMetadata(spark, s"$dir/metadata5.json", tmp()))
    assert(e3.getMessage.contains("resolvable"))

    // BUT a default that predates all data (the first snapshot's schema
    // already carries it, no parent) is exact and must import — the
    // earlier over-broad guard refused this (review finding)
    val firstCommit = metadata
      .replace(""""sequence-number": 1, "schema-id": 0,""",
        """"sequence-number": 1, "schema-id": 1,""")
      .replace(s""""location": "$dir"""", s""""location": "$dir/z"""")
    MetaIO.writeString(conf, s"$dir/metadata4.json", firstCommit)
    val imp4 = IcebergImport.importMetadata(spark, s"$dir/metadata4.json", tmp())
    assert(imp4.toDF().count() == 3)
  }

  test("date default fills, filters, and survives the v3 round trip") {
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet").limit(2))
    t.addColumnWithDefault("since", DateType, java.time.LocalDate.parse("2020-06-15"))
    t.append(Seq((910, "d", java.sql.Date.valueOf("2024-01-01")))
      .toDF("r_regionkey", "r_name", "since"))
    assert(t.toDF(Some("since = DATE '2020-06-15'")).count() == 2)
    assert(t.toDF(Some("since > DATE '2022-01-01'")).count() == 1)
    val dir = outDir()
    IcebergExport.exportBinary(t, dir, formatVersion = 3)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(dir, "metadata.json"))
    var found: com.fasterxml.jackson.databind.JsonNode = null
    root.get("schema").get("fields").forEach(f =>
      if (f.get("name").asText() == "since") found = f)
    assert(found.get("initial-default").asText() == "2020-06-15")
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    assert(imp.toDF(Some("since = DATE '2020-06-15'")).count() == 2)
  }

  test("timestamp-NTZ default fills and survives the v3 round trip") {
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet").limit(2))
    val ts = java.time.LocalDateTime.parse("2021-03-04T05:06:07.000008")
    t.addColumnWithDefault("seen", TimestampNTZType, ts)
    assert(t.toDF(Some("seen = TIMESTAMP_NTZ '2021-03-04 05:06:07.000008'"))
      .count() == 2)
    val dir = outDir()
    IcebergExport.exportBinary(t, dir, formatVersion = 3)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(dir, "metadata.json"))
    var found: com.fasterxml.jackson.databind.JsonNode = null
    root.get("schema").get("fields").forEach(f =>
      if (f.get("name").asText() == "seen") found = f)
    assert(found.get("initial-default").asText() == "2021-03-04T05:06:07.000008")
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    assert(ColumnDefaults.of(imp.meta.schema("seen")) ==
      ColumnDefaults.of(t.meta.schema("seen")))
    assert(imp.toDF().filter(col("seen").isNull).count() == 0)
  }

  test("time travel: pre-add snapshots have no column, later ones fill") {
    val t = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet").limit(2))
    val s1 = t.meta.currentSnapshotId.get
    t.addColumnWithDefault("tier", StringType, "bronze")
    t.append(Seq((900, "w", "gold")).toDF("r_regionkey", "r_name", "tier"))
    val s2 = t.meta.currentSnapshotId.get
    // before the add: the column does not exist in that snapshot's schema
    assert(!t.asOf(s1).columns.contains("tier"))
    // after: pre-add rows fill, the appended row keeps its real value
    val got = t.asOf(s2).select("r_regionkey", "tier").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(900) == "gold" && got.values.count(_ == "bronze") == 2)
  }

  test("replication carries the default to the replica") {
    val src = GraftTable.createAs(spark, tmp(),
      spark.read.parquet(s"$sf/region.parquet").limit(3))
    val dst = tmp()
    TableReplicator.create(spark, dst, src, Seq("r_regionkey"))
    src.addColumnWithDefault("tier", StringType, "bronze")
    src.append(Seq((300, "w", "gold")).toDF("r_regionkey", "r_name", "tier"))
    TableReplicator.sync(spark, dst)
    val replica = GraftTable.load(spark, dst)
    val got = replica.toDF().select("r_regionkey", "tier").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(300) == "gold")
    assert(got.count(_._2 == "bronze") == 3,
      "replica pre-add rows must read the default")
  }
}
