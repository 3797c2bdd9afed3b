package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Full schema evolution (t36): rename / drop / widen are metadata-only
  * commits over the logical→physical column mapping; data files never
  * rewrite, old files stay readable, dropped bytes never resurrect.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_evo").toString + "/t"

  test("rename is metadata-only: values survive, old and new files coexist") {
    val t = GraftTable.createAs(spark, tmp(),
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "price"))
    val filesBefore = t.currentFiles().map(_.path).toSet
    t.renameColumn("price", "cost")
    assert(t.currentFiles().map(_.path).toSet == filesBefore, "no rewrite")
    assert(t.toDF().columns.toSeq == Seq("id", "name", "cost"))
    // writes after the rename land under the physical name; reads unify
    t.append(Seq((3L, "c", 30.0)).toDF("id", "name", "cost"))
    assert(t.toDF().select(sum(col("cost"))).head().getDouble(0) == 60.0)
  }

  test("stats pruning works across a rename (predicate on the new name)") {
    val t = GraftTable.createAs(spark, tmp(),
      spark.range(1000).select(col("id"), (col("id") * 2).as("v")).repartition(4))
    t.cluster(Seq("v"), nFiles = 4)
    t.renameColumn("v", "value")
    val pruned = t.plannedFiles("value < 10")
    assert(pruned.size < t.currentFiles().size,
      s"expected file skipping on renamed column: ${pruned.size} of ${t.currentFiles().size}")
    assert(t.toDF(Some("value < 10")).count() == 5)
  }

  test("copy-on-write mutations work through the mapping (delete/update/merge)") {
    val t = GraftTable.createAs(spark, tmp(),
      (1L to 100L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "price")
        .repartition(4))
    t.renameColumn("price", "cost")
    t.delete("cost > 90.0")
    assert(t.toDF().count() == 90)
    t.update("id = 1", Map("cost" -> "111.0"))
    assert(t.toDF().filter(col("id") === 1).head().getAs[Double]("cost") == 111.0)
    t.mergeInto(Seq((2L, "upd", 222.0), (200L, "new", 200.0))
      .toDF("id", "name", "cost"), Seq("id"))
    val m = t.toDF().filter(col("id") === 2 || col("id") === 200)
      .select(col("name")).as[String].collect().toSet
    assert(m == Set("upd", "new"))
  }

  test("drop then re-add: old bytes never resurrect") {
    val t = GraftTable.createAs(spark, tmp(),
      Seq((1L, "secret", 5.0), (2L, "hidden", 6.0)).toDF("id", "label", "v"))
    t.dropColumn("label")
    assert(t.toDF().columns.toSeq == Seq("id", "v"))
    t.addColumn("label", StringType)
    // the re-added column reads NULL from old files, not the dropped bytes
    assert(t.toDF().filter(col("label").isNotNull).count() == 0)
    t.append(Seq((3L, 7.0, "fresh")).toDF("id", "v", "label"))
    assert(t.toDF().filter(col("label") === "fresh").count() == 1)
    assert(t.toDF().filter(col("label").isNotNull).count() == 1)
  }

  test("widen int->long and float->double reads old files through the wider type") {
    val t = GraftTable.createAs(spark, tmp(),
      Seq((1, 1.5f), (2, 2.5f)).toDF("n", "x"))
    t.widenColumn("n", LongType)
    t.widenColumn("x", DoubleType)
    val s = t.toDF().schema
    assert(s("n").dataType == LongType && s("x").dataType == DoubleType)
    // old (int32/float) files read through the widened schema
    assert(t.toDF().select(sum(col("n"))).head().getLong(0) == 3L)
    assert(t.toDF().select(sum(col("x"))).head().getDouble(0) == 4.0)
    // new files write the wide types and unify with the old
    t.append(Seq((3L, 3.5)).toDF("n", "x"))
    assert(t.toDF().select(sum(col("n"))).head().getLong(0) == 6L)
    assert(t.toDF().count() == 3)
  }

  test("rename chain that swaps two names resolves atomically") {
    val t = GraftTable.createAs(spark, tmp(),
      Seq((1L, 10.0, 100.0)).toDF("id", "a", "b"))
    t.renameColumn("a", "tmp_swap")
    t.renameColumn("b", "a")
    t.renameColumn("tmp_swap", "b")
    // logical a now reads physical b's values and vice versa
    val r = t.toDF().head()
    assert(r.getAs[Double]("a") == 100.0 && r.getAs[Double]("b") == 10.0)
    t.append(Seq((2L, 200.0, 20.0)).toDF("id", "a", "b"))
    assert(t.toDF().select(sum(col("a"))).head().getDouble(0) == 300.0)
    assert(t.toDF().select(sum(col("b"))).head().getDouble(0) == 30.0)
  }

  test("partition spec survives a source rename; pruning still applies") {
    val t = GraftTable.createAs(spark, tmp(),
      (1L to 40L).map(i => (i, i % 4)).toDF("id", "bucket_col"),
      partitionFields = Seq(PartitionField("bucket_col", "identity", "bucket_col")))
    t.renameColumn("bucket_col", "shard")
    assert(t.toDF(Some("shard = 2")).count() == 10)
    // new writes still partition correctly through the physical source
    t.append(Seq((100L, 2L)).toDF("id", "shard"))
    assert(t.toDF(Some("shard = 2")).count() == 11)
  }

  test("evolution refuses under pending merge-on-read deletes") {
    val t = GraftTable.createAs(spark, tmp(),
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.deleteMergeOnReadEquality(Seq(Tuple1(1L)).toDF("id"), Seq("id"))
    intercept[IllegalArgumentException](t.renameColumn("v", "w"))
    intercept[IllegalArgumentException](t.dropColumn("v"))
    t.materializeDeletes()
    t.renameColumn("v", "w")
    assert(t.toDF().columns.contains("w"))
  }

  test("changelog and time travel read correctly across a rename") {
    val t = GraftTable.createAs(spark, tmp(),
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    val s1 = t.meta.currentSnapshotId.get
    t.renameColumn("v", "val")
    t.append(Seq((3L, 3.0)).toDF("id", "val"))
    val s2 = t.meta.currentSnapshotId.get
    // changelog emits the CURRENT logical schema for old commits too
    val ch = t.changesBetween(s1, s2)
    assert(ch.columns.toSeq == Seq("id", "val", "_change_type"))
    assert(ch.count() == 1)
    // time travel reads each snapshot under ITS schema (Iceberg
    // snapshot-schema semantics): the pre-rename snapshot still says "v"
    assert(t.asOf(s1).columns.toSeq == Seq("id", "v") && t.asOf(s1).count() == 2)
    assert(t.asOf(s2).columns.toSeq == Seq("id", "val") && t.asOf(s2).count() == 3)
  }

  test("evolveSchema applies a whole op batch atomically (swap, drop+re-add)") {
    val t = GraftTable.createAs(spark, tmp(),
      Seq((1L, 10.0, "x1")).toDF("a", "b", "c"))
    // a<->b swap in ONE batch: no temp names, one schema version
    val v0 = t.meta.currentSchemaId
    t.evolveSchema(Seq(SchemaOp.Rename("a", "b"), SchemaOp.Rename("b", "a")))
    assert(t.meta.currentSchemaId == v0 + 1, "one batch = one schema id")
    assert(t.meta.schema.fieldNames.toSeq == Seq("b", "a", "c"))
    val r = t.toDF().select("b", "a").head()
    assert(r.getLong(0) == 1L && r.getDouble(1) == 10.0, "values follow the swap")
    // drop + re-add the same name in one batch: fresh physical, old bytes
    // can never resurrect
    t.evolveSchema(Seq(SchemaOp.Drop("c"),
      SchemaOp.Add("c", org.apache.spark.sql.types.StringType)))
    assert(t.toDF().select("c").head().isNullAt(0),
      "re-added column must not resurrect dropped bytes")
    // batch extraProperties ride the same metadata version
    val ver = t.meta.version
    t.evolveSchema(Seq(SchemaOp.Add("d", org.apache.spark.sql.types.LongType)),
      extraProperties = Map("my.cursor" -> "42"))
    assert(t.meta.version == ver + 1 && t.meta.properties("my.cursor") == "42")
  }

  test("changesOf emits each commit under its own schema on request (r8)") {
    val t = GraftTable.createAs(spark, tmp(),
      Seq((1L, 1.0)).toDF("id", "v"))
    val s1 = t.meta.currentSnapshotId.get
    t.renameColumn("v", "val")
    t.addColumn("note", org.apache.spark.sql.types.StringType)
    t.append(Seq((2L, 2.0, "n2")).toDF("id", "val", "note"))
    val s2 = t.meta.currentSnapshotId.get

    // the historical commit replays with the names/types its writer saw
    val old = t.changesOf(s1, underSnapshotSchema = true)
    assert(old.columns.toSeq == Seq("id", "v", "_change_type"))
    assert(old.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet ==
      Set((1L, 1.0, "insert")))
    // the post-evolution commit under its schema
    val neu = t.changesOf(s2, underSnapshotSchema = true)
    assert(neu.columns.toSeq == Seq("id", "val", "note", "_change_type"))
    assert(neu.count() == 1)
    // default stays the live-consumer view: CURRENT schema for any commit
    assert(t.changesOf(s1).columns.toSeq == Seq("id", "val", "note", "_change_type"))
  }

  test("changesBetweenBySnapshot serves a RANGE under per-commit schemas (r16)") {
    val t = GraftTable.createAs(spark, tmp(), Seq((1L, 1.0)).toDF("id", "v"))
    val s0 = t.meta.currentSnapshotId.get
    t.append(Seq((2L, 2.0)).toDF("id", "v"))         // commit A: old name
    t.renameColumn("v", "val")                       // metadata-only
    t.append(Seq((3L, 3.0)).toDF("id", "val"))       // commit B: new name
    t.deleteMergeOnRead("id = 2")                    // commit C: MOR delete
    val head = t.meta.currentSnapshotId.get

    val frames = t.changesBetweenBySnapshot(s0, head, underSnapshotSchema = true)
    assert(frames.size == 3)
    val Seq((_, a), (_, b), (_, c)) = frames
    // each frame carries the names ITS writer saw, never retroactive ones
    assert(a.columns.toSeq == Seq("id", "v", "_change_type"))
    assert(b.columns.toSeq == Seq("id", "val", "_change_type"))
    assert(c.columns.toSeq == Seq("id", "val", "_change_type"))
    assert(a.collect().map(r => (r.getLong(0), r.getString(2))).toSet ==
      Set((2L, "insert")))
    assert(c.collect().map(r => (r.getLong(0), r.getString(2))).toSet ==
      Set((2L, "delete")))
    // a consumer remaps a historical frame forward via SchemaDiff
    val ops = SchemaDiff.diff(
      t.meta.schemaAt(frames.head._1.schemaId), t.meta.schema)
    assert(ops == Seq(SchemaOp.Rename("v", "val")))
    // underSnapshotSchema=false reproduces changesBetween's uniform view
    val uniform = t.changesBetweenBySnapshot(s0, head)
    assert(uniform.forall(_._2.columns.toSeq == Seq("id", "val", "_change_type")))
    assert(uniform.map(_._2).reduce(_ unionAll _).collect().toSet ==
      t.changesBetween(s0, head).collect().toSet)
  }

  test("snapshot schemas: drop and widen are scoped to their commits") {
    val t = GraftTable.createAs(spark, tmp(),
      Seq((1, "x", 1.5f)).toDF("n", "label", "f"))
    val s1 = t.meta.currentSnapshotId.get
    t.dropColumn("label")
    t.widenColumn("n", org.apache.spark.sql.types.LongType)
    t.append(Seq((2L, 2.5f)).toDF("n", "f"))
    val s2 = t.meta.currentSnapshotId.get
    // the old snapshot still shows the dropped column and narrow type
    val old = t.asOf(s1)
    assert(old.columns.toSeq == Seq("n", "label", "f"))
    assert(old.schema("n").dataType == org.apache.spark.sql.types.IntegerType)
    assert(old.select(col("label")).as[String].collect().toSeq == Seq("x"))
    // the new snapshot reads the evolved shape
    val cur = t.asOf(s2)
    assert(cur.columns.toSeq == Seq("n", "f"))
    assert(cur.schema("n").dataType == org.apache.spark.sql.types.LongType)
    // schema history is persisted, not in-memory state
    val reloaded = GraftTable.load(spark, t.location)
    assert(reloaded.meta.schemasHistory.size == 3)
    assert(reloaded.asOf(s1).columns.contains("label"))
  }
}
