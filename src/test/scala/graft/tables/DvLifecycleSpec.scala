package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** DV lifecycle completion (VERDICT r10 "Next round #5"): stacked
  * deletion-vector files consolidate on disk via the encoded-bitmap
  * OR-fold (never exploding positions through a shuffle), and the
  * surrounding metadata consumers — partition stats, fastCount,
  * changelog — stay correct across every DV commit kind.
  */
class DvLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_dvlc").toString + "/t"
  private def orders(n: Int) = spark.read.parquet(s"$sf/orders.parquet")
    .orderBy(col("o_orderkey")).limit(n)

  test("stacked DVs compact to one file via the encoded OR-fold; rows unchanged") {
    val t = GraftTable.createAs(spark, tmp(), orders(2000).repartition(4))
    t.deleteMergeOnReadDV("o_orderstatus = 'F'")
    t.deleteMergeOnReadDV("o_totalprice > 250000")
    t.deleteMergeOnReadDV("o_orderkey % 11 = 0")
    val before = t.toDF().orderBy("o_orderkey").collect()
    val stacked = t.currentPositionDeletes()
    assert(stacked.size == 3 && stacked.forall(GraftTable.isDvFile))
    t.compactDeleteFiles()
    val after = t.currentPositionDeletes()
    // one consolidated DV file; per-data-file read invariant restored
    assert(after.size == 1 && after.forall(GraftTable.isDvFile))
    val dvRows = spark.read.parquet(after.head)
    val perFile = dvRows.groupBy(col("file_path")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(perFile == 1L, "exactly one bitmap row per data file after compaction")
    // visible rows byte-identical across the fold
    assert(t.toDF().orderBy("o_orderkey").collect().sameElements(before))
    // folded cardinality = union of the stacked bitmaps' rows
    val deleted = orders(2000).count() - t.toDF().count()
    val foldedCard = dvRows
      .agg(sum(graft.functions.F.bitmapCardinality(col("dv")))).head().getLong(0)
    assert(foldedCard == deleted)
    // read plan after compaction keeps the broadcast + codegen shape
    val plan = t.toDF().queryExecution.executedPlan.toString
    assert(plan.contains("graft_bitmap_contains") && plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("mixed classic + DV stacks still fold to the bitmap layout") {
    val t = GraftTable.createAs(spark, tmp(), orders(1500).repartition(3))
    t.deleteMergeOnReadPositions("o_orderstatus = 'F'") // classic row file
    t.deleteMergeOnReadDV("o_totalprice > 280000")       // bitmap file
    val before = t.toDF().orderBy("o_orderkey").collect()
    t.compactDeleteFiles()
    val after = t.currentPositionDeletes()
    assert(after.size == 1 && after.forall(GraftTable.isDvFile),
      "mixed stack must upgrade to one DV file")
    assert(t.toDF().orderBy("o_orderkey").collect().sameElements(before))
  }

  test("fastCount and changelog stay correct across deleteMergeOnReadDV") {
    val t = GraftTable.createAs(spark, tmp(), orders(1200).repartition(3))
    assert(t.fastCount().contains(1200L))
    val s0 = t.meta.currentSnapshotId.get
    t.deleteMergeOnReadDV("o_orderpriority = '1-URGENT'")
    val s1 = t.meta.currentSnapshotId.get
    // pending DV rows aren't knowable from stats: refuse, never lie
    assert(t.fastCount().isEmpty)
    // the changelog re-derives the DV commit's deleted rows exactly
    val urgent = orders(1200).filter(col("o_orderpriority") === "1-URGENT").count()
    val dels = t.changesBetween(s0, s1).filter(col("_change_type") === "delete")
    assert(dels.count() == urgent)
    // compaction is row-invisible: the changelog across it is empty
    t.deleteMergeOnReadDV("o_orderkey % 13 = 0")
    val s2 = t.meta.currentSnapshotId.get
    t.compactDeleteFiles()
    val s3 = t.meta.currentSnapshotId.get
    assert(s3 != s2, "compaction commits a snapshot")
    assert(t.changesBetween(s2, s3).count() == 0,
      "delete-file compaction must emit no visible change")
    // materialization restores the O(1) count with the right value
    val visible = t.toDF().count()
    t.materializeDeletes()
    assert(t.fastCount().contains(visible))
  }

  test("partition stats survive DV deletes and DV compaction (validity walk)") {
    val t = GraftTable.createAs(spark, tmp(), orders(1000),
      partitionFields = Seq(PartitionField("o_orderstatus", "identity", "status")))
    t.computePartitionStats()
    assert(t.partitionStats.nonEmpty)
    val stamped = t.partitionStats.get.entries
      .map(e => (e.partition, e.dataFileCount, e.dataRecordCount)).toSet
    // DV delete: file set untouched, data_* counters are pre-delete
    // semantics — the validity walk must cross the commit
    t.deleteMergeOnReadDV("o_orderkey % 5 = 0")
    assert(t.partitionStats.nonEmpty, "DV delete must not strand the payload")
    assert(t.partitionStats.get.entries
      .map(e => (e.partition, e.dataFileCount, e.dataRecordCount)).toSet == stamped)
    // ...and the compaction commit too (delete files moved, data files not)
    t.deleteMergeOnReadDV("o_orderkey % 7 = 0")
    t.compactDeleteFiles()
    assert(t.partitionStats.nonEmpty, "DV compaction must not strand the payload")
    val viaDf = t.partitionsDf.collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    assert(viaDf == stamped)
  }
}
