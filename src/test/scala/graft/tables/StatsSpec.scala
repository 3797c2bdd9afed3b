package graft.tables

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Persisted ANALYZE statistics (t42, Puffin shape): sketch buffers live
  * in a snapshot-stamped stats file, appends fold new rows in atomically,
  * row-preserving maintenance keeps them valid, row-rewriting commits
  * invalidate, and renames don't (physical keying).
  */
class StatsSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_stats").toString + "/t"

  private def orders(n: Int): DataFrame =
    Tables.orders(spark, sf).orderBy(col("o_orderkey")).limit(n)

  private def exactNdv(t: GraftTable, c: String): Long =
    t.toDF().filter(col(c).isNotNull).select(col(c)).distinct().count()

  test("NDV stays live and exact across appends (sketch fold)") {
    val t = GraftTable.createAs(spark, tmp(), orders(800))
    t.analyze(Seq("o_custkey", "o_orderstatus"))
    assert(t.columnNdv("o_custkey").contains(exactNdv(t, "o_custkey")))
    t.append(orders(200).withColumn("o_orderkey", col("o_orderkey") + 1000000L)
      .withColumn("o_custkey", col("o_custkey") + 500000L))
    assert(t.columnNdv("o_custkey").contains(exactNdv(t, "o_custkey")),
      "append must fold, not invalidate")
    assert(t.columnNdv("o_orderstatus").contains(exactNdv(t, "o_orderstatus")))
    // a second append keeps folding
    t.append(orders(100).withColumn("o_orderkey", col("o_orderkey") + 2000000L)
      .withColumn("o_custkey", col("o_custkey") + 900000L))
    assert(t.columnNdv("o_custkey").contains(exactNdv(t, "o_custkey")))
  }

  test("NULL values never count as a distinct value") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (4L, None))
      .toDF("k", "v")
    val t = GraftTable.createAs(spark, tmp(), df)
    t.analyze(Seq("v"))
    assert(t.columnNdv("v").contains(2L))
  }

  test("row-preserving maintenance keeps stats; row rewrites invalidate") {
    val t = GraftTable.createAs(spark, tmp(), orders(600).repartition(6))
    t.analyze(Seq("o_custkey"))
    val ndv = t.columnNdv("o_custkey")
    assert(ndv.nonEmpty)
    t.compact()
    assert(t.columnNdv("o_custkey") == ndv, "compaction is row-preserving")
    t.cluster(Seq("o_orderkey"))
    assert(t.columnNdv("o_custkey") == ndv, "clustering is row-preserving")
    t.delete("o_orderkey % 5 = 0")
    assert(t.columnNdv("o_custkey").isEmpty, "CoW rewrite must invalidate")
  }

  test("upsert and overwrite invalidate (no silent wrong answers)") {
    val t = GraftTable.createAs(spark, tmp(), orders(300))
    t.analyze(Seq("o_custkey"))
    t.upsertMergeOnRead(orders(20).withColumn("o_totalprice", lit(1.5)),
      Seq("o_orderkey"))
    assert(t.columnNdv("o_custkey").isEmpty)
    val t2 = GraftTable.createAs(spark, tmp(), orders(300))
    t2.analyze(Seq("o_custkey"))
    t2.overwrite(orders(50))
    assert(t2.columnNdv("o_custkey").isEmpty)
  }

  test("renames don't invalidate (sketches are keyed physically)") {
    val t = GraftTable.createAs(spark, tmp(), orders(400))
    t.analyze(Seq("o_custkey"))
    val ndv = t.columnNdv("o_custkey")
    t.renameColumn("o_custkey", "cust")
    assert(t.columnNdv("cust") == ndv)
    // and the fold keeps working under the new name
    t.append(orders(50).withColumn("o_orderkey", col("o_orderkey") + 1000000L)
      .withColumn("o_custkey", col("o_custkey") + 700000L)
      .withColumnRenamed("o_custkey", "cust"))
    assert(t.columnNdv("cust").contains(exactNdv(t, "cust")))
  }

  test("re-analyzing other columns at the same snapshot is additive") {
    val t = GraftTable.createAs(spark, tmp(), orders(500))
    t.analyze(Seq("o_custkey"))
    t.analyze(Seq("o_orderstatus"))
    assert(t.columnNdv("o_custkey").nonEmpty, "earlier columns survive")
    assert(t.columnNdv("o_orderstatus").nonEmpty)
  }

  test("stats drive the joinPruned strategy flip (IN-list vs plain join)") {
    import spark.implicits._
    val fact = GraftTable.createAs(spark, tmp(), orders(2000).repartition(8))
    fact.cluster(Seq("o_custkey"), nFiles = 8)

    // SMALL analyzed dim -> the IN-list file-skipping path fires
    val smallDim = GraftTable.createAs(spark, tmp(),
      orders(2000).select(col("o_custkey").as("k")).distinct()
        .orderBy(col("k")).limit(3))
    smallDim.analyze(Seq("k"))
    assert(smallDim.columnNdv("k").contains(3L))
    val pruned = fact.joinPruned(smallDim, "o_custkey", "k", maxKeys = 100)
    val scans = pruned.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.length
    }
    assert(scans.exists(_ < fact.currentFiles().size),
      s"IN-list path should scan a pruned fact file set, got $scans " +
        s"of ${fact.currentFiles().size}")
    assert(pruned.queryExecution.sparkPlan.toString.contains("In(o_custkey"),
      "IN-list must be pushed to the fact scan")

    // LARGE-NDV dim -> the same call flips to the plain join: no driver
    // collect probe, no hard failure (the DataFrame overload refuses)
    val bigDim = GraftTable.createAs(spark, tmp(),
      orders(2000).select(col("o_custkey").as("k")).distinct())
    bigDim.analyze(Seq("k"))
    assert(bigDim.columnNdv("k").exists(_ > 100))
    intercept[IllegalArgumentException](
      fact.joinPruned(bigDim.toDF(), "o_custkey", "k", maxKeys = 100))
    val plain = fact.joinPruned(bigDim, "o_custkey", "k", maxKeys = 100)

    // both strategies return the same rows as the reference join
    val ref = {
      val f = fact.toDF(); val d = bigDim.toDF()
      f.join(d, f("o_custkey") === d("k")).count()
    }
    assert(plain.count() == ref)
    val refSmall = {
      val f = fact.toDF(); val d = smallDim.toDF()
      f.join(d, f("o_custkey") === d("k")).count()
    }
    assert(pruned.count() == refSmall && refSmall > 0)

    // never-analyzed dim: fastCount (NDV upper bound) still drives it
    val unanalyzed = GraftTable.createAs(spark, tmp(),
      orders(2000).select(col("o_custkey").as("k")).distinct()
        .orderBy(col("k")).limit(5))
    assert(fact.joinPruned(unanalyzed, "o_custkey", "k", maxKeys = 100)
      .count() > 0)
  }

  // r7 regression: string bounds from EXTERNALLY-written files may be
  // truncated by the parquet writer (last byte incremented — an upper
  // bound, not a value in the data), so fastMinMax must refuse string
  // columns on migrated/add_files tables while numeric bounds still serve.
  test("fastMinMax refuses untrusted string bounds from external files") {
    val staged = Files.createTempDirectory("graft_stats_ext").toString + "/p"
    orders(300).write.parquet(staged)
    val t = GraftTable.migrateInPlace(spark, tmp(), staged)
    assert(t.fastMinMax("o_orderstatus").isEmpty,
      "external string bounds are not aggregate-exact")
    assert(t.fastMinMax("o_orderkey").nonEmpty,
      "numeric bounds from external files stay exact")

    // add_files onto a self-written table: ONE untrusted file poisons
    // string aggregates for the whole table, numerics still answer
    val t2 = GraftTable.createAs(spark, tmp(), orders(200))
    assert(t2.fastMinMax("o_orderstatus").nonEmpty)
    val staged2 = Files.createTempDirectory("graft_stats_ext2").toString + "/p"
    orders(100).withColumn("o_orderkey", col("o_orderkey") + 1000000L)
      .write.parquet(staged2)
    t2.addFiles(staged2)
    assert(t2.fastMinMax("o_orderstatus").isEmpty)
    assert(t2.fastMinMax("o_orderkey").nonEmpty)
  }

  test("orphan sweep removes superseded stats files, keeps the live one") {
    val t = GraftTable.createAs(spark, tmp(), orders(200))
    t.analyze(Seq("o_custkey"))
    t.append(orders(20).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    t.append(orders(20).withColumn("o_orderkey", col("o_orderkey") + 2000000L))
    val removed = t.removeOrphanFiles(System.currentTimeMillis() + 1000L)
    assert(removed.exists(_.contains("stats-")), "superseded stats swept")
    assert(t.columnNdv("o_custkey").contains(exactNdv(t, "o_custkey")),
      "live stats file survives the sweep")
  }

  // ------------------------------------------------ partition statistics

  private def liveParts(t: GraftTable): Seq[(Int, String, Long, Long)] =
    t.currentFiles().groupBy(f => (f.specId,
        f.partitionValues.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("/")))
      .toSeq.map { case ((sid, p), fs) =>
        (sid, p, fs.size.toLong, fs.map(_.recordCount).sum) }
      .sortBy(e => (e._1, e._2))

  test("partition stats: compute serves .partitions; appends fold without a rescan") {
    val t = GraftTable.createAs(spark, tmp(), orders(600),
      Seq(PartitionField("o_orderstatus", "identity", "status")))
    assert(t.partitionStats.isEmpty, "nothing persisted yet")
    t.computePartitionStats()
    val p0 = t.partitionStats.get
    assert(p0.entries.map(e => (e.specId, e.partition, e.dataFileCount, e.dataRecordCount))
      == liveParts(t), "persisted payload mirrors the manifests")
    // append re-stamps atomically: payload stays live and matches a fresh
    // manifest computation (fold arithmetic = recompute result)
    t.append(orders(200).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    val p1 = t.partitionStats.get
    assert(p1.snapshotId == t.meta.currentSnapshotId.get, "fold re-stamped")
    assert(p1.entries.map(e => (e.specId, e.partition, e.dataFileCount, e.dataRecordCount))
      == liveParts(t), "folded counters equal the manifest truth")
    assert(p1.entries.forall(_.totalSizeBytes > 0L))
    // .partitions serves the payload
    val viaDf = t.partitionsDf.collect()
      .map(r => (r.getInt(1), r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    assert(viaDf == liveParts(t))
  }

  test("partition stats: maintenance refreshes, MOR deletes traverse, CoW rewrites invalidate") {
    val t = GraftTable.createAs(spark, tmp(), orders(600),
      Seq(PartitionField("o_orderstatus", "identity", "status")))
    // two files per partition so compaction has something to merge
    t.append(orders(200).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    t.computePartitionStats()
    assert(t.partitionStats.nonEmpty)
    t.compact(64L << 20) // file counts/bytes move -> auto re-derived in the rewrite
    assert(t.partitionStats.nonEmpty, "maintenance must keep the payload live")
    assert(t.partitionStats.get.entries.map(e =>
      (e.specId, e.partition, e.dataFileCount, e.dataRecordCount)) == liveParts(t),
      "refreshed payload mirrors the post-compaction manifests")
    // a MOR delete predicate leaves the data-file set untouched: the
    // validity walk crosses it (data_* counters are pre-delete semantics)
    t.deleteMergeOnRead("o_orderkey <= 50")
    assert(t.partitionStats.nonEmpty, "MOR delete commits must not strand the payload")
    val viaDf = t.partitionsDf.collect()
      .map(r => (r.getInt(1), r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    assert(viaDf == liveParts(t))
    // a CoW rewrite moves the file set with no refresh hook -> stale,
    // fallback computes live, recompute heals
    t.materializeDeletes()
    t.delete("o_orderkey <= 100")
    assert(t.partitionStats.isEmpty, "CoW rewrites invalidate")
    val viaDf2 = t.partitionsDf.collect()
      .map(r => (r.getInt(1), r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    assert(viaDf2 == liveParts(t))
    t.computePartitionStats()
    assert(t.partitionStats.nonEmpty, "recompute heals")
  }

  test("partition stats: fold spans partition-spec evolution (per-spec entries)") {
    val base = orders(400)
    val t = GraftTable.createAs(spark, tmp(), base.filter(col("o_orderkey") % 2 === 0),
      Seq(PartitionField("o_orderstatus", "identity", "status")))
    t.computePartitionStats()
    t.setPartitionSpec(Seq(PartitionField("o_orderpriority", "identity", "prio")))
    // spec change is a metadata-only commit -> stats went stale; recompute
    // then append under the NEW spec folds entries of a second specId
    t.computePartitionStats()
    t.append(base.filter(col("o_orderkey") % 2 === 1))
    val p = t.partitionStats.get
    assert(p.entries.map(_.specId).distinct.size == 2,
      "entries must carry both specs' partitions")
    assert(p.entries.map(e => (e.specId, e.partition, e.dataFileCount, e.dataRecordCount))
      == liveParts(t))
  }

  test("partition stats: orphan sweep keeps the live file, removes superseded") {
    val t = GraftTable.createAs(spark, tmp(), orders(200),
      Seq(PartitionField("o_orderstatus", "identity", "status")))
    t.computePartitionStats()
    t.append(orders(20).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    t.append(orders(20).withColumn("o_orderkey", col("o_orderkey") + 2000000L))
    val removed = t.removeOrphanFiles(System.currentTimeMillis() + 1000L)
    assert(removed.exists(_.contains("partition-stats-")), "superseded payloads swept")
    assert(t.partitionStats.nonEmpty, "live payload survives the sweep")
    assert(t.partitionStats.get.entries.map(e =>
      (e.specId, e.partition, e.dataFileCount, e.dataRecordCount)) == liveParts(t))
  }
}
