package graft.tables

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Changelog-driven replication (t37): per-commit replay through
  * mergeBatch keeps a replica row-identical to the source, exactly-once.
  */
class ReplicatorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_rep").toString + "/t"

  private def orders(n: Int): DataFrame =
    Tables.orders(spark, sf).orderBy(col("o_orderkey")).limit(n)

  private def assertIdentical(a: GraftTable, b: GraftTable): Unit = {
    val (da, db) = (a.toDF(), b.toDF())
    assert(da.count() == db.count())
    assert(da.exceptAll(db).isEmpty && db.exceptAll(da).isEmpty,
      "replica diverged from source")
  }

  test("replica tracks append, CoW delete/update, MOR upsert, truncate") {
    val src = GraftTable.createAs(spark, tmp(), orders(500))
    val repLoc = tmp()
    TableReplicator.create(spark, repLoc, src, Seq("o_orderkey"))
    assertIdentical(src, GraftTable.load(spark, repLoc))

    src.append(orders(100).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    src.delete("o_orderkey % 4 = 0")
    src.update("o_orderkey = 1", Map("o_totalprice" -> "42.0"))
    src.upsertMergeOnRead(
      orders(50).withColumn("o_totalprice", lit(7.5)), Seq("o_orderkey"))
    assert(TableReplicator.sync(spark, repLoc) == 4)
    assertIdentical(src, GraftTable.load(spark, repLoc))

    src.truncate()
    TableReplicator.sync(spark, repLoc)
    assert(GraftTable.load(spark, repLoc).toDF().count() == 0)
  }

  test("sync is idempotent and exactly-once per commit") {
    val src = GraftTable.createAs(spark, tmp(), orders(200))
    val repLoc = tmp()
    TableReplicator.create(spark, repLoc, src, Seq("o_orderkey"))
    src.append(orders(30).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    assert(TableReplicator.sync(spark, repLoc) == 1)
    assert(TableReplicator.sync(spark, repLoc) == 0)
    assert(GraftTable.load(spark, repLoc).toDF().count() == 230)
  }

  test("row-preserving maintenance advances the cursor without data churn") {
    val src = GraftTable.createAs(spark, tmp(), orders(300).repartition(6))
    val repLoc = tmp()
    TableReplicator.create(spark, repLoc, src, Seq("o_orderkey"))
    src.compact()
    val repBefore = GraftTable.load(spark, repLoc)
    val snapBefore = repBefore.meta.currentSnapshotId
    assert(TableReplicator.sync(spark, repLoc) == 1)
    val rep = GraftTable.load(spark, repLoc)
    // cursor advanced, but no data commit happened on the replica
    assert(rep.meta.currentSnapshotId == snapBefore)
    assert(rep.meta.properties(TableReplicator.SrcSnapProp).toLong ==
      src.meta.currentSnapshotId.get)
  }

  test("a source rollback (or expired cursor) reconciles to current state") {
    val src = GraftTable.createAs(spark, tmp(), orders(100))
    val repLoc = tmp()
    TableReplicator.create(spark, repLoc, src, Seq("o_orderkey"))
    val s1 = src.meta.currentSnapshotId.get
    src.append(orders(10).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    assert(TableReplicator.sync(spark, repLoc) == 1)
    // rollback abandons the synced commit: the cursor is off the ancestry,
    // so sync self-heals by replacing the replica with the current state
    src.rollback(s1)
    src.append(orders(20).withColumn("o_orderkey", col("o_orderkey") + 2000000L))
    assert(TableReplicator.sync(spark, repLoc) == 1)
    assertIdentical(src, GraftTable.load(spark, repLoc))
    // back on the ancestry: subsequent syncs are incremental again
    src.append(orders(5).withColumn("o_orderkey", col("o_orderkey") + 3000000L))
    assert(TableReplicator.sync(spark, repLoc) == 1)
    assertIdentical(src, GraftTable.load(spark, repLoc))

    // expiration past the cursor heals the same way
    val src2 = GraftTable.createAs(spark, tmp(), orders(80))
    val rep2 = tmp()
    TableReplicator.create(spark, rep2, src2, Seq("o_orderkey"))
    src2.append(orders(10).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    src2.delete("o_orderkey % 3 = 0")
    src2.expireSnapshots(System.currentTimeMillis() + 1000L)
    assert(TableReplicator.sync(spark, rep2) == 1)
    assertIdentical(src2, GraftTable.load(spark, rep2))
  }
}
