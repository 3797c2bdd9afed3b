package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.sources.Tables
import graft.tables._
import java.nio.file.Files

/** SURVEY §2.2 as driver-contract queries: each entry stands up a fresh
  * GraftTable under a temp dir, exercises one workshop capability, and
  * returns an observable result (rows-only check; the full semantics are
  * asserted in GraftTableSpec).
  *
  * Inputs are capped (`limit`) so these stay snapshot-lifecycle benchmarks
  * rather than raw-IO benchmarks at larger SFs.
  */
object TableOps {

  private def tmp(): String =
    Files.createTempDirectory("graft_top").toString + "/t"

  private def orders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).limit(20000)

  /** t01: CTAS import (reference README.md "Import: CTAS and in-place"). */
  def t01Ctas(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir))
    Seq((t.toDF().count(), t.meta.currentSnapshot.get.operation))
      .toDF("n_rows", "operation")
  }

  /** t02: in-place migration — no data files rewritten. */
  def t02Migrate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.migrateInPlace(spark, tmp(), s"$sfDir/orders.parquet")
    val inPlace = t.currentFiles().forall(_.path.contains("orders.parquet"))
    Seq((t.currentFiles().size, t.toDF().count(), inPlace))
      .toDF("n_files", "n_rows", "files_in_place")
  }

  /** t03: snapshot history table. */
  def t03History(spark: SparkSession, sfDir: String): DataFrame = {
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir).limit(5000))
    t.append(orders(spark, sfDir).limit(1000))
    t.append(orders(spark, sfDir).limit(500))
    t.history.orderBy(col("snapshot_id"))
  }

  /** t04: time travel (FOR SYSTEM_TIME AS OF). */
  def t04TimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir).limit(5000))
    val s1 = t.meta.currentSnapshotId.get
    t.append(orders(spark, sfDir).limit(1000))
    val s2 = t.meta.currentSnapshotId.get
    Seq((1, t.asOf(s1).count()), (2, t.asOf(s2).count()))
      .toDF("snapshot_seq", "n_rows")
  }

  /** t05: rollback (EXECUTE rollback). */
  def t05Rollback(spark: SparkSession, sfDir: String): DataFrame = {
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir).limit(5000))
    val s1 = t.meta.currentSnapshotId.get
    t.append(orders(spark, sfDir).limit(1000))
    t.rollback(s1)
    t.history.orderBy(col("snapshot_id"))
  }

  /** t06: expire_snapshots + orphan file cleanup. */
  def t06Expire(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir).limit(5000))
    t.truncate()
    t.append(orders(spark, sfDir).limit(1000))
    val before = t.meta.snapshots.size
    t.expireSnapshots(System.currentTimeMillis() + 1000)
    Seq((before, t.meta.snapshots.size, t.toDF().count()))
      .toDF("snapshots_before", "snapshots_after", "n_rows")
  }

  /** t07: MERGE INTO (reference update_iceberg_v2_examples.sql). */
  def t07Merge(spark: SparkSession, sfDir: String): DataFrame = {
    val base = orders(spark, sfDir)
    val t = GraftTable.createAs(spark, tmp(), base)
    val source = base.limit(100).withColumn("o_orderpriority", lit("0-MERGED"))
      .unionAll(base.limit(50)
        .withColumn("o_orderkey", col("o_orderkey") + 900000000L)
        .withColumn("o_orderpriority", lit("0-INSERTED")))
    t.mergeInto(source, Seq("o_orderkey"))
    t.toDF().groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** t08: copy-on-write DELETE / UPDATE / TRUNCATE. */
  def t08DeleteUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir))
    t.delete("o_orderstatus = 'O'")
    t.update("o_totalprice > 300000", Map("o_orderpriority" -> "'0-HIGH-VALUE'"))
    t.toDF().groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  /** t09: identity partitioning (PARTITIONED BY). */
  def t09IdentityPartition(spark: SparkSession, sfDir: String): DataFrame = {
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir),
      Seq(PartitionField("o_orderstatus", "identity", "status")))
    t.filesDf.groupBy(col("partition"))
      .agg(count(lit(1)).as("n_files"), sum(col("record_count")).as("n_rows"))
      .orderBy(col("partition"))
  }

  /** t10: transform partitioning (years(ts)) + partition pruning — the
    * workshop's "1 file of 238 scanned" observability.
    */
  def t10TransformPartition(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir),
      Seq(PartitionField("o_orderdate", "years", "order_year")))
    val filter = "o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'"
    val planned = t.plannedFiles(filter)
    Seq((t.currentFiles().size, planned.size, t.toDF(Some(filter)).count()))
      .toDF("total_files", "scanned_files", "n_rows")
  }

  /** t11: partition evolution — old files keep the old spec. */
  def t11PartitionEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val base = orders(spark, sfDir)
    val t = GraftTable.createAs(spark, tmp(), base.filter(col("o_orderkey") % 2 === 0))
    t.setPartitionSpec(Seq(PartitionField("o_orderdate", "years", "order_year")))
    t.append(base.filter(col("o_orderkey") % 2 === 1))
    t.filesDf.groupBy(col("spec_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("record_count")).as("n_rows"))
      .orderBy(col("spec_id"))
  }

  /** t12: min/max file skipping on a NON-partitioned table (reference
    * "Predicate pushdown and file pruning without partitioning").
    */
  def t12StatsPruning(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(),
      orders(spark, sfDir).repartitionByRange(8, col("o_orderkey")))
    val filter = "o_orderkey <= 1000"
    Seq((t.currentFiles().size, t.plannedFiles(filter).size, t.toDF(Some(filter)).count()))
      .toDF("total_files", "scanned_files", "n_rows")
  }

  /** t13: rewrite_data_files bin-pack compaction. */
  def t13Compaction(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir).repartition(16))
    val before = t.currentFiles().size
    t.compact(64L << 20)
    Seq((before, t.currentFiles().size, t.toDF().count(),
        t.meta.currentSnapshot.get.operation))
      .toDF("files_before", "files_after", "n_rows", "operation")
  }

  /** t14: schema evolution (ADD COLUMN) + metadata retention property. */
  def t14SchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir).limit(5000),
      properties = Map(TableFormat.PrevVersionsMax -> "2"))
    t.addColumn("quality_score", DoubleType)
    t.append(t.toDF().limit(100).withColumn("quality_score", lit(0.9)))
    Seq((t.toDF().filter(col("quality_score").isNull).count(),
        t.toDF().filter(col("quality_score").isNotNull).count()))
      .toDF("rows_null_newcol", "rows_with_newcol")
  }

  /** t15: merge-on-read delete — metadata-only delete commit, correct
    * reads, then materialization (Iceberg v2 delete-file semantics).
    */
  def t15MergeOnRead(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = GraftTable.createAs(spark, tmp(), orders(spark, sfDir))
    val filesBefore = t.currentFiles().size
    t.deleteMergeOnRead("o_orderstatus = 'O'")
    val filesAfterMor = t.currentFiles().size
    val rowsAfterMor = t.toDF().count()
    t.materializeDeletes()
    Seq((filesBefore, filesAfterMor, rowsAfterMor, t.toDF().count(),
        t.currentDeletes().size))
      .toDF("files_before", "files_after_mor", "rows_after_mor", "rows_after_rewrite",
        "remaining_predicates")
  }

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "t15_merge_on_read"        -> ((t15MergeOnRead _, "")),
    "t01_ctas_import"          -> ((t01Ctas _, "")),
    "t02_inplace_migrate"      -> ((t02Migrate _, "")),
    "t03_snapshots_history"    -> ((t03History _, "")),
    "t04_time_travel"          -> ((t04TimeTravel _, "")),
    "t05_rollback"             -> ((t05Rollback _, "")),
    "t06_expire_snapshots"     -> ((t06Expire _, "")),
    "t07_merge_into"           -> ((t07Merge _, "")),
    "t08_delete_update"        -> ((t08DeleteUpdate _, "")),
    "t09_identity_partitioning" -> ((t09IdentityPartition _, "")),
    "t10_transform_partitioning" -> ((t10TransformPartition _, "")),
    "t11_partition_evolution"  -> ((t11PartitionEvolution _, "")),
    "t12_file_pruning_stats"   -> ((t12StatsPruning _, "")),
    "t13_compaction"           -> ((t13Compaction _, "")),
    "t14_schema_evolution"     -> ((t14SchemaEvolution _, "")),
  )
}
