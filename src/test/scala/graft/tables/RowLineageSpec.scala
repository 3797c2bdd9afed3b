package graft.tables

import graft.SparkSpec
import graft.formats.Avro
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** v3 row lineage: the `_row_id` / `_last_updated_sequence_number` read
  * surface, its equality with the v3 binary export's assignment, id
  * stability under MOR deletes and lineage-preserving CoW rewrites /
  * compaction, the import path (explicit ids, inheritance, watermark),
  * and the graft→graft round trip.
  */
class RowLineageSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_lin").toString + "/t"
  private def out(): String = Files.createTempDirectory("graft_lin_exp").toString
  private val conf = new org.apache.hadoop.conf.Configuration()

  /** Single sorted file per append → row ids follow key rank. */
  private def sortedRegion(n: Int) = spark.read.parquet(s"$sf/region.parquet")
    .orderBy("r_regionkey").limit(n).coalesce(1)
    .sortWithinPartitions("r_regionkey")

  test("inherited ids cover [0, rows) in file order; seq = commit") {
    val t = GraftTable.createAs(spark, tmp(), sortedRegion(5))
    t.append(Seq((100, "x", "c"), (101, "y", "c"))
      .toDF("r_regionkey", "r_name", "r_comment").coalesce(1))
    val got = t.lineageDF()
      .select("r_regionkey", RowLineage.RowIdCol, RowLineage.SeqCol)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(got.map(_._2).toSeq == (0L until 7L))
    assert(got.take(5).forall(_._3 == 1L) && got.drop(5).forall(_._3 == 2L))
    // the appended rows ride the second file's range in write order
    assert(got.drop(5).map(_._1).toSeq == Seq(100, 101))
  }

  test("scan ids equal the v3 export's manifest first_row_id assignment") {
    val t = GraftTable.createAs(spark, tmp(), sortedRegion(5))
    t.append(Seq((200, "z", "c")).toDF("r_regionkey", "r_name", "r_comment"))
    val assign = RowLineage.assign(conf, t.meta)
    val dir = out()
    IcebergExport.exportBinary(t, dir, formatVersion = 3)
    // parse every exported Avro manifest: per-file first_row_id must be
    // the exact numbers the native read surface serves
    val metaJson = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(dir, "metadata.json"))
    assert(metaJson.get("next-row-id").asLong() == assign.nextRowId)
    val exported = scala.collection.mutable.Map[String, Long]()
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
      .foreach { f =>
        val c = Avro.readContainer(java.nio.file.Files.readAllBytes(f.toPath))
        c.records.foreach { r =>
          (r.get("data_file"), r.get("data_file").map(_ => r)) match {
            case (Some(df: Map[String, Any] @unchecked), _) =>
              (df.get("file_path"), df.get("first_row_id")) match {
                case (Some(p: String), Some(id: Long)) => exported(p) = id
                case _ => ()
              }
            case _ => ()
          }
        }
      }
    assert(exported.nonEmpty)
    exported.foreach { case (p, id) =>
      assert(assign.fileFirstRowId(p) == id, s"file $p")
    }
    // every live data file is covered by the export
    assert(t.currentFiles().forall(f => exported.contains(f.path)))
  }

  test("MOR DV delete: survivors keep ids with no rewrite at all") {
    val t = GraftTable.createAs(spark, tmp(), sortedRegion(5))
    val before = t.lineageDF().select("r_regionkey", RowLineage.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    t.deleteMergeOnReadDV("r_regionkey = 2")
    val after = t.lineageDF().select("r_regionkey", RowLineage.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(!after.contains(2))
    assert(after == before - 2)
  }

  test("CoW delete/update preserve ids and bump seq only on hit rows") {
    val t = GraftTable.createAs(spark, tmp(), sortedRegion(5),
      properties = Map(TableFormat.RowLineagePreserve -> "true"))
    val before = t.lineageDF()
      .select("r_regionkey", RowLineage.RowIdCol, RowLineage.SeqCol)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    t.delete("r_regionkey = 1")                 // snapshot 2: CoW rewrite
    t.update("r_regionkey = 3", Map("r_name" -> "'UPD'"))  // snapshot 3
    val after = t.lineageDF()
      .select("r_regionkey", RowLineage.RowIdCol, RowLineage.SeqCol, "r_name")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(!after.contains(1))
    after.foreach { case (k, (rid, seq, name)) =>
      assert(rid == before(k)._1, s"row id of key $k must survive the rewrites")
      if (k == 3) {
        assert(seq == 3L, "updated row carries the update commit's sequence")
        assert(name == "UPD")
      } else assert(seq == before(k)._2, s"untouched key $k keeps its seq")
    }
    // WITHOUT the property, a CoW rewrite reassigns (documented contrast)
    val u = GraftTable.createAs(spark, tmp(), sortedRegion(5))
    u.delete("r_regionkey = 0")
    val ids = u.lineageDF().select(RowLineage.RowIdCol)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids.size == 4 && ids.distinct.size == 4)
  }

  test("compaction carries each row's id through the repack") {
    val t = GraftTable.createAs(spark, tmp(), sortedRegion(3),
      properties = Map(TableFormat.RowLineagePreserve -> "true"))
    t.append(Seq((300, "a", "c")).toDF("r_regionkey", "r_name", "r_comment"))
    t.append(Seq((301, "b", "c")).toDF("r_regionkey", "r_name", "r_comment"))
    val before = t.lineageDF().select("r_regionkey", RowLineage.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val filesBefore = t.currentFiles().size
    t.compact()
    assert(t.currentFiles().size < filesBefore, "compaction must fold files")
    val after = t.lineageDF().select("r_regionkey", RowLineage.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after == before)
  }

  test("lineageAsOf: ids are stable between time-traveled and current surfaces") {
    val t = GraftTable.createAs(spark, tmp(), sortedRegion(5),
      properties = Map(TableFormat.RowLineagePreserve -> "true"))
    val s1 = t.meta.currentSnapshotId.get
    t.append(Seq((800, "t", "c")).toDF("r_regionkey", "r_name", "r_comment"))
    t.delete("r_regionkey = 2")
    val old = t.lineageAsOf(s1).select("r_regionkey", RowLineage.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val now = t.lineageDF().select("r_regionkey", RowLineage.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(old.keySet == Set(0, 1, 2, 3, 4))
    // every row alive in BOTH snapshots carries the SAME id — a consumer
    // can diff row identity across snapshots directly
    (old.keySet & now.keySet).foreach(k => assert(old(k) == now(k), s"key $k"))
    assert(!now.contains(2) && now.contains(800))
  }

  test("CDC identity diff: lineage surfaces compose into an exact row-level changelog") {
    // the payoff of stable ids: diffing two snapshots BY _row_id yields
    // the exact row-level delta — deletes = ids only in the old surface,
    // inserts = ids only in the new one, updates = same id with a newer
    // _last_updated_sequence_number — with no key columns needed at all
    val t = GraftTable.createAs(spark, tmp(), sortedRegion(5),
      properties = Map(TableFormat.RowLineagePreserve -> "true"))
    val s1 = t.meta.currentSnapshotId.get
    t.delete("r_regionkey = 1")
    t.update("r_regionkey = 3", Map("r_name" -> "'UPD'"))
    t.append(Seq((900, "new", "c")).toDF("r_regionkey", "r_name", "r_comment"))
    def surface(df: org.apache.spark.sql.DataFrame) = df
      .select("r_regionkey", RowLineage.RowIdCol, RowLineage.SeqCol)
      .collect().map(r => r.getLong(1) -> (r.getInt(0), r.getLong(2))).toMap
    val old = surface(t.lineageAsOf(s1))
    val now = surface(t.lineageDF())
    val deleted = old.keySet -- now.keySet
    val inserted = now.keySet -- old.keySet
    val updated = (old.keySet & now.keySet).filter(id => now(id)._2 > old(id)._2)
    assert(deleted.map(old(_)._1) == Set(1))
    assert(inserted.map(now(_)._1) == Set(900))
    assert(updated.map(now(_)._1) == Set(3))
    assert((old.keySet & now.keySet -- updated).forall(id => now(id) == old(id)),
      "untouched rows are identical on both surfaces")
  }

  test("cluster and MERGE preserve ids too (every rewrite path is covered)") {
    // range-cluster reorders rows across files — inheritance alone can't
    // survive it, so the preserve path must ride the materialized ids
    val t = GraftTable.createAs(spark, tmp(), sortedRegion(5),
      properties = Map(TableFormat.RowLineagePreserve -> "true"))
    t.append(Seq((600, "m", "c")).toDF("r_regionkey", "r_name", "r_comment"))
    val before = t.lineageDF()
      .select("r_regionkey", RowLineage.RowIdCol, RowLineage.SeqCol)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    t.cluster(Seq("r_regionkey"), nFiles = 2)
    val afterCluster = t.lineageDF().select("r_regionkey", RowLineage.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(afterCluster == before.view.mapValues(_._1).toMap,
      "cluster must not renumber rows")
    // CoW MERGE: update key 0, insert key 700 — survivors keep (id, seq),
    // the updated row keeps its id at the merge commit's sequence, the
    // insert inherits a fresh id above every existing one
    val mergeSeq = t.meta.snapshots.map(_.id).max + 1
    t.mergeInto(Seq((0, "UPD", "c"), (700, "NEW", "c"))
      .toDF("r_regionkey", "r_name", "r_comment"), Seq("r_regionkey"))
    val after = t.lineageDF()
      .select("r_regionkey", RowLineage.RowIdCol, RowLineage.SeqCol, "r_name")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    before.keys.foreach { k =>
      assert(after(k)._1 == before(k)._1, s"merge must not renumber key $k")
      if (k == 0) {
        assert(after(k)._2 == mergeSeq && after(k)._3 == "UPD")
      } else assert(after(k)._2 == before(k)._2, s"untouched key $k keeps its seq")
    }
    assert(after(700)._1 > before.values.map(_._1).max, "insert id is fresh")
    // all ids stay unique
    assert(after.values.map(_._1).toSeq.distinct.size == after.size)
  }

  test("graft→graft v3 round trip keeps ids; post-import appends respect the watermark") {
    val t = GraftTable.createAs(spark, tmp(), sortedRegion(5))
    t.append(Seq((400, "q", "c")).toDF("r_regionkey", "r_name", "r_comment"))
    val before = t.lineageDF().select("r_regionkey", RowLineage.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dir = out()
    IcebergExport.exportBinary(t, dir, formatVersion = 3)
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    val after = imp.lineageDF().select("r_regionkey", RowLineage.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after == before, "imported lineage must serve the exporter's ids")
    assert(imp.meta.properties(TableFormat.RowLineageNextRowId).toLong == 6L)
    // a native append AFTER the import continues above the watermark
    imp.append(Seq((500, "w", "c")).toDF("r_regionkey", "r_name", "r_comment"))
    val appended = imp.lineageDF().filter(col("r_regionkey") === 500)
      .select(RowLineage.RowIdCol).head.getLong(0)
    assert(appended == 6L)
  }

  test("v3 export refuses rider-carrying files (materialized lineage is not representable)") {
    // a preserve-mode rewrite materialized real per-row ids into
    // __gp_row_id; an inherited first_row_id range in the export would
    // hand a foreign reader DIFFERENT ids than graft serves — refuse
    val t = GraftTable.createAs(spark, tmp(), sortedRegion(5),
      properties = Map(TableFormat.RowLineagePreserve -> "true"))
    t.delete("r_regionkey = 1")
    val e = intercept[IllegalStateException](
      IcebergExport.exportBinary(t, out(), formatVersion = 3))
    assert(e.getMessage.contains("rider") || e.getMessage.contains("materialized"))
    // without preservation the same table exports fine (ids reassigned)
    val u = GraftTable.createAs(spark, tmp(), sortedRegion(5))
    u.delete("r_regionkey = 1")
    IcebergExport.exportBinary(u, out(), formatVersion = 3)
  }

  test("imported EXISTING entries with null ids serve NULL lineage, never invented ids") {
    val stage = Files.createTempDirectory("graft_lin_ex").toString
    def withIds(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
      df.select(df.schema.fields.zipWithIndex.map { case (f, i) =>
        col(f.name).as(f.name, new org.apache.spark.sql.types.MetadataBuilder()
          .putLong(ColumnMapping.ParquetFieldIdKey, i + 1L).build())
      }.toSeq: _*).coalesce(1).write.parquet(dir)
    withIds(Seq((1, "a"), (2, "b")).toDF("id", "name"), s"$stage/a")
    withIds(Seq((3, "c")).toDF("id", "name"), s"$stage/b")
    def one(d: String) = new java.io.File(d).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getPath
    val dir = out()
    val entrySchema =
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"snapshot_id","type":["null","long"],"default":null},
        |  {"name":"first_row_id","type":["null","long"],"default":null},
        |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
        |    {"name":"record_count","type":"long"},
        |    {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin
    // file A: EXISTING (status 0) with NULL id — a foreign compaction
    // shape whose real ids live in a materialized column graft can't
    // read; file B: ADDED with an explicit id
    val manifestBytes = Avro.writeContainer(entrySchema, Seq(
      Map[String, Any]("status" -> 0, "snapshot_id" -> 1L, "first_row_id" -> null,
        "data_file" -> Map[String, Any]("file_path" -> one(s"$stage/a"),
          "file_format" -> "PARQUET", "partition" -> Map.empty[String, Any],
          "record_count" -> 2L, "file_size_in_bytes" -> 10L)),
      Map[String, Any]("status" -> 1, "snapshot_id" -> 1L, "first_row_id" -> 500L,
        "data_file" -> Map[String, Any]("file_path" -> one(s"$stage/b"),
          "file_format" -> "PARQUET", "partition" -> Map.empty[String, Any],
          "record_count" -> 1L, "file_size_in_bytes" -> 10L))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/ex-m0.avro"), manifestBytes)
    val listSchema =
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string"},
        |  {"name":"manifest_length","type":"long"},
        |  {"name":"partition_spec_id","type":"int"},
        |  {"name":"added_snapshot_id","type":"long"}]}""".stripMargin
    val listBytes = Avro.writeContainer(listSchema, Seq(Map[String, Any](
      "manifest_path" -> s"$dir/ex-m0.avro",
      "manifest_length" -> manifestBytes.length.toLong,
      "partition_spec_id" -> 0, "added_snapshot_id" -> 1L)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/snap-1-ex.avro"), listBytes)
    val metadata =
      s"""{"format-version": 3,
         |"table-uuid": "abcdabcd-9999-2222-3333-444455556666",
         |"location": "$dir",
         |"last-updated-ms": 1700000000000,
         |"last-sequence-number": 1,
         |"last-column-id": 2,
         |"next-row-id": 501,
         |"schemas": [{"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "id", "required": false, "type": "int"},
         |  {"id": 2, "name": "name", "required": false, "type": "string"}]}],
         |"current-schema-id": 0,
         |"partition-specs": [{"spec-id": 0, "fields": []}],
         |"default-spec-id": 0,
         |"current-snapshot-id": 1,
         |"snapshots": [
         |  {"snapshot-id": 1, "sequence-number": 1, "schema-id": 0,
         |   "timestamp-ms": 1700000000000,
         |   "summary": {"operation": "append"},
         |   "manifest-list": "$dir/snap-1-ex.avro"}],
         |"snapshot-log": [{"timestamp-ms": 1700000000000, "snapshot-id": 1}]}
         |""".stripMargin
    MetaIO.writeString(conf, s"$dir/metadata.json", metadata)
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    val got = imp.lineageDF().select("id", RowLineage.RowIdCol).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1).isEmpty && got(2).isEmpty,
      "unrecoverable foreign ids must serve NULL, never invented numbers")
    assert(got(3).contains(500L))
    // a NATIVE append after the import assigns normally, above the watermark
    imp.append(Seq((4, "d")).toDF("id", "name"))
    val late = imp.lineageDF().filter(col("id") === 4)
      .select(RowLineage.RowIdCol).head.getLong(0)
    assert(late == 501L)
    // v3 RE-export refuses: it cannot stamp ids for the unrecoverable file
    val e = intercept[IllegalStateException](
      IcebergExport.exportBinary(imp, out(), formatVersion = 3))
    assert(e.getMessage.contains("no row-id assignment"))

    // a lineage-PRESERVING rewrite must keep the NULLs null: a null rider
    // would inherit from the rewritten file's fresh range and invent the
    // very numbers the unrecoverable marking refuses (review finding —
    // the −1 sentinel pins "no lineage" through the rewrite)
    imp.setProperties(Map(TableFormat.RowLineagePreserve -> "true"))
    imp.compact(targetBytes = 1L << 30)
    val afterCompact = imp.lineageDF().select("id", RowLineage.RowIdCol).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(afterCompact(1).isEmpty && afterCompact(2).isEmpty,
      "no-lineage rows stay NULL through a preserving rewrite")
    assert(afterCompact(3).contains(500L) && afterCompact(4).contains(501L))
  }

  test("foreign manifest inheritance: null entry ids derive from the list's first_row_id") {
    // hand-built v3 doc: one manifest whose TWO added entries leave
    // first_row_id null; the manifest-list row anchors inheritance at 100
    // → files inherit 100 and 100+rows(A)
    val stage = Files.createTempDirectory("graft_lin_inh").toString
    def withIds(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
      df.select(df.schema.fields.zipWithIndex.map { case (f, i) =>
        col(f.name).as(f.name, new org.apache.spark.sql.types.MetadataBuilder()
          .putLong(ColumnMapping.ParquetFieldIdKey, i + 1L).build())
      }.toSeq: _*).coalesce(1).write.parquet(dir)
    withIds(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "name"), s"$stage/a")
    withIds(Seq((4, "d")).toDF("id", "name"), s"$stage/b")
    def one(d: String) = new java.io.File(d).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getPath
    val dir = out()
    val entrySchema =
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"snapshot_id","type":["null","long"],"default":null},
        |  {"name":"first_row_id","type":["null","long"],"default":null},
        |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
        |    {"name":"record_count","type":"long"},
        |    {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin
    val manifestBytes = Avro.writeContainer(entrySchema, Seq(
      Map[String, Any]("status" -> 1, "snapshot_id" -> 1L, "first_row_id" -> null,
        "data_file" -> Map[String, Any]("file_path" -> one(s"$stage/a"),
          "file_format" -> "PARQUET", "partition" -> Map.empty[String, Any],
          "record_count" -> 3L, "file_size_in_bytes" -> 10L)),
      Map[String, Any]("status" -> 1, "snapshot_id" -> 1L, "first_row_id" -> null,
        "data_file" -> Map[String, Any]("file_path" -> one(s"$stage/b"),
          "file_format" -> "PARQUET", "partition" -> Map.empty[String, Any],
          "record_count" -> 1L, "file_size_in_bytes" -> 10L))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/lin-m0.avro"), manifestBytes)
    val listSchema =
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string"},
        |  {"name":"manifest_length","type":"long"},
        |  {"name":"partition_spec_id","type":"int"},
        |  {"name":"added_snapshot_id","type":"long"},
        |  {"name":"first_row_id","type":["null","long"],"default":null}]}""".stripMargin
    val listBytes = Avro.writeContainer(listSchema, Seq(Map[String, Any](
      "manifest_path" -> s"$dir/lin-m0.avro",
      "manifest_length" -> manifestBytes.length.toLong,
      "partition_spec_id" -> 0, "added_snapshot_id" -> 1L,
      "first_row_id" -> 100L)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/snap-1-lin.avro"), listBytes)
    val metadata =
      s"""{"format-version": 3,
         |"table-uuid": "abcdabcd-1111-2222-3333-444455556666",
         |"location": "$dir",
         |"last-updated-ms": 1700000000000,
         |"last-sequence-number": 1,
         |"last-column-id": 2,
         |"next-row-id": 104,
         |"schemas": [{"type": "struct", "schema-id": 0, "fields": [
         |  {"id": 1, "name": "id", "required": false, "type": "int"},
         |  {"id": 2, "name": "name", "required": false, "type": "string"}]}],
         |"current-schema-id": 0,
         |"partition-specs": [{"spec-id": 0, "fields": []}],
         |"default-spec-id": 0,
         |"current-snapshot-id": 1,
         |"snapshots": [
         |  {"snapshot-id": 1, "sequence-number": 1, "schema-id": 0,
         |   "timestamp-ms": 1700000000000,
         |   "summary": {"operation": "append"},
         |   "manifest-list": "$dir/snap-1-lin.avro"}],
         |"snapshot-log": [{"timestamp-ms": 1700000000000, "snapshot-id": 1}]}
         |""".stripMargin
    MetaIO.writeString(conf, s"$dir/metadata.json", metadata)
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    val got = imp.lineageDF().select("id", RowLineage.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 100L, 2 -> 101L, 3 -> 102L, 4 -> 103L))
    assert(imp.meta.properties(TableFormat.RowLineageNextRowId).toLong == 104L)
  }
}

class RowLineageStabilitySpec extends SparkSpec {
  import spark.implicits._
  private val conf = new org.apache.hadoop.conf.Configuration()
  private def tmp(): String = Files.createTempDirectory("graft_lin_st").toString + "/t"
  private def sortedRegion(n: Int) = spark.read.parquet(s"$sf/region.parquet")
    .orderBy("r_regionkey").limit(n)

  test("expiration settles ids: expired first-seen snapshots don't renumber rows") {
    // snap1 writes file A (ids 0-4), snap2 appends B (5-6), snap3 CoW-
    // rewrites A -> A' (fresh ids 7-10, no preserve property). Expiring
    // snap1+snap2 removes A's and B's first-seen snapshots; the old
    // walk would re-derive ids from snap3's manifest order and renumber
    // both B and A' — the settlement written at expiration pins them.
    val t = GraftTable.createAs(spark, tmp(), sortedRegion(5))
    t.append(Seq((100, "x", "c"), (101, "y", "c"))
      .toDF("r_regionkey", "r_name", "r_comment").coalesce(1))
    t.delete("r_regionkey = 1")
    val before = t.lineageDF()
      .select("r_regionkey", RowLineage.RowIdCol, RowLineage.SeqCol)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    t.expireSnapshots(Long.MaxValue)
    assert(t.meta.snapshots.size == 1, "all but the current snapshot expired")
    assert(t.meta.properties.contains(TableFormat.RowLineageSettled))
    val after = t.lineageDF()
      .select("r_regionkey", RowLineage.RowIdCol, RowLineage.SeqCol)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after == before, "expiration must not renumber any surviving row")
    // the settlement is load-bearing: the same metadata WITHOUT it walks
    // to different numbers (this is exactly the pre-fix renumbering bug)
    val unsettled = RowLineage.assign(conf, t.meta.copy(
      properties = t.meta.properties - TableFormat.RowLineageSettled))
    val settled = RowLineage.assign(conf, t.meta)
    assert(unsettled.fileFirstRowId != settled.fileFirstRowId,
      "test shape must make the raw walk renumber (otherwise this pins nothing)")
    // appends after the expiration continue above the settled watermark
    val maxBefore = before.values.map(_._1).max
    t.append(Seq((200, "z", "c")).toDF("r_regionkey", "r_name", "r_comment"))
    val newIds = t.lineageDF().filter($"r_regionkey" === 200)
      .select(RowLineage.RowIdCol).collect().map(_.getLong(0))
    assert(newIds.forall(_ > maxBefore), "post-expiration ids respect the watermark")
    // a SECOND expiration re-settles cumulatively
    t.expireSnapshots(Long.MaxValue)
    val again = t.lineageDF()
      .select("r_regionkey", RowLineage.RowIdCol, RowLineage.SeqCol)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(before.forall { case (k, v) => again(k) == v })
  }

  test("binary export+import of a SETTLED table: ids survive, stale pointer dropped") {
    // the settlement file lives in the source's metadata dir; an import
    // must not inherit the pointer (first lineage read would crash on
    // the missing file) — the exported manifests carry explicit ids
    val t = GraftTable.createAs(spark, tmp(), sortedRegion(5))
    t.append(Seq((100, "x", "c")).toDF("r_regionkey", "r_name", "r_comment"))
    val before = t.lineageDF().select("r_regionkey", RowLineage.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    t.expireSnapshots(Long.MaxValue)
    assert(t.meta.properties.contains(TableFormat.RowLineageSettled))
    val dir = Files.createTempDirectory("graft_lin_exp2").toString
    IcebergExport.exportBinary(t, dir, formatVersion = 3)
    val imp = IcebergImport.importMetadata(spark, s"$dir/metadata.json", tmp())
    assert(!imp.meta.properties.contains(TableFormat.RowLineageSettled),
      "imports must not carry the source's settlement pointer")
    val after = imp.lineageDF().select("r_regionkey", RowLineage.RowIdCol)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after == before, "settled ids ride the export's explicit manifest ids")
  }

  test("drop and recreate at the same location serves the NEW table's lineage") {
    // same (location, version) keys re-reached by a different table: the
    // assignment cache must not serve the old table's file-id map (which
    // would NULL every row of the recreated table)
    val dir = tmp()
    val t1 = GraftTable.createAs(spark, dir, sortedRegion(5))
    assert(t1.lineageDF().count() == 5)   // populates the cache
    MetaIO.delete(conf, dir)              // drop
    val t2 = GraftTable.createAs(spark, dir, sortedRegion(3))
    val got = t2.lineageDF().select("r_regionkey", RowLineage.RowIdCol)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._2)
    assert(got.length == 3)
    assert(got.map(_._2).toSeq == Seq(0L, 1L, 2L),
      "recreated table must serve its own ids, not the stale cache entry")
  }
}
