package graft.tables

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import java.nio.file.Files

/** Incremental materialized-view maintenance (mv01): refresh folds the
  * base table's changelog into the aggregate instead of recomputing it,
  * groups die when their count hits zero, and the progress cursor commits
  * atomically with the delta.
  */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_mv").toString + "/t"

  private def orders(n: Int): DataFrame =
    Tables.orders(spark, sf).orderBy(col("o_orderkey")).limit(n)

  private def recompute(base: GraftTable): Set[(String, Long, BigDecimal)] =
    base.toDF().groupBy(col("o_orderstatus")).agg(
      count(lit(1)).as("cnt"),
      sum(coalesce(col("o_totalprice").cast(DecimalType(28, 6)),
        lit(0).cast(DecimalType(28, 6)))).cast(DecimalType(28, 6)).as("s"))
      .as[(String, Long, BigDecimal)].collect().toSet

  private def viewRows(v: IncrementalAggView): Set[(String, Long, BigDecimal)] =
    v.toDF().select(col("o_orderstatus"), col("cnt"),
      col("sum_o_totalprice").cast(DecimalType(28, 6)))
      .as[(String, Long, BigDecimal)].collect().toSet

  test("refresh tracks append, CoW delete, MOR upsert, and truncate exactly") {
    val base = GraftTable.createAs(spark, tmp(), orders(600))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    assert(viewRows(v) == recompute(base))

    base.append(orders(100).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    assert(v.refresh() == 100L)
    assert(viewRows(v) == recompute(base))

    base.delete("o_orderkey % 5 = 0")
    v.refresh()
    assert(viewRows(v) == recompute(base))

    base.upsertMergeOnRead(
      orders(50).withColumn("o_totalprice", lit(9999.25)), Seq("o_orderkey"))
    v.refresh()
    assert(viewRows(v) == recompute(base))

    base.truncate()
    v.refresh()
    assert(viewRows(v).isEmpty)
  }

  test("no-op refresh returns 0 and commits nothing") {
    val base = GraftTable.createAs(spark, tmp(), orders(100))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    val version = v.table.meta.version
    assert(v.refresh() == 0L)
    assert(v.table.meta.version == version)
  }

  test("refresh work is proportional to the delta, not the base table") {
    val base = GraftTable.createAs(spark, tmp(), orders(5000))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    base.append(orders(7).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    // 7 changelog rows processed — not 5007
    assert(v.refresh() == 7L)
  }

  test("a group whose count reaches zero is deleted from the view") {
    val base = GraftTable.createAs(spark, tmp(),
      Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 5.0))
        .toDF("o_orderkey", "o_orderstatus", "o_totalprice"))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    assert(viewRows(v).map(_._1) == Set("A", "B"))
    base.delete("o_orderstatus = 'B'")
    v.refresh()
    assert(viewRows(v).map(_._1) == Set("A"))
  }

  test("cursor advances atomically with the apply commit (one version)") {
    val base = GraftTable.createAs(spark, tmp(), orders(200))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    base.append(orders(20).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    val before = v.table.meta.version
    v.refresh()
    val m = v.table.meta
    // exactly one metadata version: delta apply + cursor ride together
    assert(m.version == before + 1)
    assert(m.properties(IncrementalAggView.BaseSnapProp).toLong ==
      base.meta.currentSnapshotId.get)
    assert(m.currentSnapshot.get.operation == "upsert-mor")
  }

  test("expired cursor self-heals via full recompute in one commit") {
    val base = GraftTable.createAs(spark, tmp(), orders(300))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    base.append(orders(50).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    base.delete("o_orderkey % 2 = 0")
    // expire everything older than the head: the cursor's snapshot is gone
    base.expireSnapshots(System.currentTimeMillis() + 1000L)
    assert(base.meta.snapshot(v.baseSnapshot).isEmpty, "cursor should be expired")
    val versionBefore = v.table.meta.version
    assert(v.refresh() > 0L)
    assert(viewRows(v) == recompute(base))
    // one commit: overwrite + cursor rode together
    assert(v.table.meta.version == versionBefore + 1)
    assert(v.baseSnapshot == base.meta.currentSnapshotId.get)
    // and the next refresh is a cheap no-op
    assert(v.refresh() == 0L)
  }

  test("a NULL group key is a real group across refreshes") {
    val base = GraftTable.createAs(spark, tmp(),
      Seq((1L, Option("A"), 10.0), (2L, Option.empty[String], 5.0))
        .toDF("o_orderkey", "o_orderstatus", "o_totalprice"))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    base.append(Seq((3L, Option.empty[String], 7.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice"))
    v.refresh()
    val rows = v.toDF().collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getDecimal(2).doubleValue()))
      .toMap
    // the NULL group folded in (old 5.0 + new 7.0), not dropped or split
    assert(rows(None) == (2L, 12.0), s"NULL group wrong: $rows")
    assert(rows(Some("A")) == (1L, 10.0))
    assert(v.toDF().count() == 2, "NULL group duplicated")
  }

  test("NULL measures count toward cnt and sum as zero") {
    val base = GraftTable.createAs(spark, tmp(),
      Seq((1L, "A", Some(10.0)), (2L, "A", None), (3L, "B", None))
        .toDF("o_orderkey", "o_orderstatus", "o_totalprice"))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    base.append(Seq((4L, "B", Option.empty[Double]))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice"))
    v.refresh()
    val rows = viewRows(v)
    assert(rows.find(_._1 == "A").get._2 == 2L)
    assert(rows.find(_._1 == "A").get._3 == BigDecimal("10.000000"))
    assert(rows.find(_._1 == "B").get._2 == 2L)
    assert(rows.find(_._1 == "B").get._3 == BigDecimal(0))
  }

  // ------------------------------------------------ schema evolution (t43)

  test("refresh survives renames of group and measure columns mid-stream") {
    val base = GraftTable.createAs(spark, tmp(), orders(400))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    base.renameColumn("o_orderstatus", "status")
    base.renameColumn("o_totalprice", "amount")
    base.append(orders(60).withColumn("o_orderkey", col("o_orderkey") + 1000000L)
      .withColumnRenamed("o_orderstatus", "status")
      .withColumnRenamed("o_totalprice", "amount"))
    assert(v.refresh() == 60L)
    val fresh = IncrementalAggView.load(spark, v.table.location)
    assert(fresh.groupCols == Seq("status"))
    assert(fresh.sumCols == Seq("amount"))
    val expected = base.toDF().groupBy(col("status")).agg(
      count(lit(1)).as("cnt"),
      sum(coalesce(col("amount").cast(DecimalType(28, 6)),
        lit(0).cast(DecimalType(28, 6)))).cast(DecimalType(28, 6)).as("s"))
      .as[(String, Long, BigDecimal)].collect().toSet
    val got = fresh.toDF().select(col("status"), col("cnt"),
      col("sum_amount").cast(DecimalType(28, 6)))
      .as[(String, Long, BigDecimal)].collect().toSet
    assert(got == expected)
    // still incremental afterwards
    base.append(orders(5).withColumn("o_orderkey", col("o_orderkey") + 2000000L)
      .withColumnRenamed("o_orderstatus", "status")
      .withColumnRenamed("o_totalprice", "amount"))
    assert(fresh.refresh() == 5L)
  }

  test("renames/drops of untracked columns are cursor-advancing no-ops") {
    val base = GraftTable.createAs(spark, tmp(), orders(100))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    val colsBefore = v.table.meta.schema.fieldNames.toSeq
    base.renameColumn("o_orderpriority", "prio")
    base.dropColumn("o_custkey")
    assert(v.refresh() == 0L) // schema cursor advanced, no rows to fold
    assert(v.table.meta.schema.fieldNames.toSeq == colsBefore)
    // and row commits after the no-op evolution still fold in
    base.append(orders(10).withColumn("o_orderkey", col("o_orderkey") + 1000000L)
      .withColumnRenamed("o_orderpriority", "prio").drop("o_custkey"))
    assert(v.refresh() == 10L)
    assert(viewRows(v).toSeq.map(_._2).sum == 110L)
  }

  test("a dropped group or measure column refuses loudly") {
    val base = GraftTable.createAs(spark, tmp(), orders(100))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    base.dropColumn("o_totalprice")
    val e = intercept[IllegalStateException](v.refresh())
    assert(e.getMessage.contains("recreate the view"))
  }

  test("filtered view maintains exactly as rows move in and out of the predicate") {
    val base = GraftTable.createAs(spark, tmp(),
      Seq((1L, "A", 10.0), (2L, "A", 200.0), (3L, "B", 5.0), (4L, "B", 300.0))
        .toDF("k", "grp", "v"))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("grp"), Seq("v"), filter = Some("v >= 100"))
    def viewMap(): Map[String, (Long, Double)] =
      v.toDF().collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    assert(viewMap() == Map("A" -> (1L, 200.0), "B" -> (1L, 300.0)))

    // append: only matching rows fold in
    base.append(Seq((5L, "A", 150.0), (6L, "A", 1.0)).toDF("k", "grp", "v"))
    v.refresh()
    assert(viewMap() == Map("A" -> (2L, 350.0), "B" -> (1L, 300.0)))
    // UPDATE moving a row OUT of the predicate set: bare -1 adjustment
    base.update("k = 2", Map("v" -> "50.0"))
    v.refresh()
    assert(viewMap() == Map("A" -> (1L, 150.0), "B" -> (1L, 300.0)))
    // and INTO it: bare +1
    base.update("k = 3", Map("v" -> "500.0"))
    v.refresh()
    assert(viewMap() == Map("A" -> (1L, 150.0), "B" -> (2L, 800.0)))
    // a group emptied of matching rows dies
    base.delete("grp = 'B' AND v >= 100")
    v.refresh()
    assert(viewMap() == Map("A" -> (1L, 150.0)))
  }

  test("renaming a filter column rewrites the stored predicate; dropping refuses") {
    val base = GraftTable.createAs(spark, tmp(),
      Seq((1L, "A", 10.0), (2L, "A", 200.0)).toDF("k", "grp", "v"))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("grp"), Nil, filter = Some("v >= 100"))
    base.renameColumn("v", "amount")
    base.append(Seq((3L, "A", 500.0)).toDF("k", "grp", "amount"))
    assert(v.refresh() == 1L, "only the matching appended row folds")
    val fresh = IncrementalAggView.load(spark, v.table.location)
    assert(fresh.filterSql.exists(_.contains("amount")),
      s"predicate must follow the rename, got ${fresh.filterSql}")
    assert(fresh.toDF().collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("A", 2L)))
    // dropping the filter column kills maintainability — loudly
    val base2 = GraftTable.createAs(spark, tmp(),
      Seq((1L, "A", 10.0, "x")).toDF("k", "grp", "v", "aux"))
    val v2 = IncrementalAggView.create(spark, tmp(), base2,
      Seq("grp"), Nil, filter = Some("v >= 5"))
    base2.dropColumn("v")
    val e = intercept[IllegalStateException](v2.refresh())
    assert(e.getMessage.contains("filters"))
  }

  test("widened group column widens the view's column and keeps counting") {
    val base = GraftTable.createAs(spark, tmp(),
      Seq((1L, 1, 10.0), (2L, 1, 20.0), (3L, 2, 5.0))
        .toDF("k", "grp", "val"))
    val v = IncrementalAggView.create(spark, tmp(), base,
      Seq("grp"), Seq("val"))
    base.widenColumn("grp", org.apache.spark.sql.types.LongType)
    base.append(Seq((4L, 2L, 7.0), (5L, 3L, 1.0)).toDF("k", "grp", "val"))
    assert(v.refresh() == 2L)
    val got = v.toDF().select(col("grp").cast("long"), col("cnt"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
    assert(v.table.meta.schema("grp").dataType ==
      org.apache.spark.sql.types.LongType)
  }
}
