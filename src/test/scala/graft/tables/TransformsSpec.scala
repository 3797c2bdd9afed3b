package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Write + prune + read-back correctness for every partition transform. */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_tf").toString + "/t"
  private def orders = spark.read.parquet(s"$sf/orders.parquet")
  private def events = graft.sources.Tables.events(spark, sf)

  private def roundTrip(t: GraftTable, filter: String, expected: Long): Unit = {
    val all = t.currentFiles().size
    val planned = t.plannedFiles(filter).size
    assert(planned <= all)
    assert(t.toDF(Some(filter)).count() == expected, s"filter: $filter")
  }

  test("months transform prunes and preserves results") {
    val t = GraftTable.createAs(spark, tmp(), orders,
      Seq(PartitionField("o_orderdate", "months", "om")))
    val f = "o_orderdate >= TIMESTAMP '1996-03-01' AND o_orderdate < TIMESTAMP '1996-05-01'"
    val expected = orders.filter($"o_orderdate" >= "1996-03-01" && $"o_orderdate" < "1996-05-01").count()
    roundTrip(t, f, expected)
    assert(t.plannedFiles(f).size < t.currentFiles().size, "months should prune")
  }

  test("days transform prunes on timestamps") {
    val t = GraftTable.createAs(spark, tmp(), events.limit(3000),
      Seq(PartitionField("ts", "days", "d")))
    val f = "ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-07'"
    val expected = events.limit(3000)
      .filter($"ts" >= "2024-01-05" && $"ts" < "2024-01-07").count()
    roundTrip(t, f, expected)
    assert(t.plannedFiles(f).size < t.currentFiles().size, "days should prune")
  }

  test("hours transform partitions and reads back exactly") {
    val t = GraftTable.createAs(spark, tmp(), events.limit(1000),
      Seq(PartitionField("ts", "hours", "h")))
    assert(t.toDF().count() == 1000)
    val f = "ts < TIMESTAMP '2024-01-01 03:00:00'"
    val expected = events.limit(1000).filter($"ts" < "2024-01-01 03:00:00").count()
    roundTrip(t, f, expected)
  }

  test("bucket transform distributes and never loses rows") {
    val t = GraftTable.createAs(spark, tmp(), orders,
      Seq(PartitionField("o_custkey", "bucket[8]", "cb")))
    assert(t.currentFiles().map(_.partitionValues("cb")).distinct.size == 8)
    assert(t.toDF().count() == orders.count())
    // equality predicate: conservative (no pruning) but exact results
    val expected = orders.filter($"o_custkey" === 7).count()
    assert(t.toDF(Some("o_custkey = 7")).count() == expected)
  }

  test("truncate transform on strings and numbers") {
    val ts = GraftTable.createAs(spark, tmp(), orders,
      Seq(PartitionField("o_orderpriority", "truncate[1]", "pfx")))
    assert(ts.toDF().count() == orders.count())
    val expected = orders.filter($"o_orderpriority" === "1-URGENT").count()
    val f = "o_orderpriority = '1-URGENT'"
    assert(ts.plannedFiles(f).size < ts.currentFiles().size, "string truncate should prune")
    assert(ts.toDF(Some(f)).count() == expected)

    val tn = GraftTable.createAs(spark, tmp(), orders,
      Seq(PartitionField("o_custkey", "truncate[50]", "ck")))
    val fn = "o_custkey >= 100 AND o_custkey < 150"
    val expectedN = orders.filter($"o_custkey" >= 100 && $"o_custkey" < 150).count()
    assert(tn.plannedFiles(fn).size < tn.currentFiles().size, "numeric truncate should prune")
    assert(tn.toDF(Some(fn)).count() == expectedN)
  }

  test("IN-list and null-count pruning") {
    val t = GraftTable.createAs(spark, tmp(), orders,
      Seq(PartitionField("o_orderstatus", "identity", "st")))
    val all = t.currentFiles().size
    val planned = t.plannedFiles("o_orderstatus IN ('F', 'P')")
    assert(planned.size < all, "IN-list should prune partitions")
    assert(planned.forall(f => Set("F", "P").contains(f.partitionValues("st"))))
    val expected = orders.filter($"o_orderstatus".isin("F", "P")).count()
    assert(t.toDF(Some("o_orderstatus IN ('F', 'P')")).count() == expected)

    // no column is ever null in orders -> IS NULL prunes every file
    val t2 = GraftTable.createAs(spark, tmp(), orders)
    assert(t2.plannedFiles("o_orderpriority IS NULL").isEmpty)
    assert(t2.toDF(Some("o_orderpriority IS NULL")).count() == 0)
    assert(t2.plannedFiles("o_orderpriority IS NOT NULL").nonEmpty)
  }

  test("null partition values round-trip (identity on nullable col)") {
    val df = orders.limit(100)
      .withColumn("maybe", when($"o_orderkey" % 2 === 0, $"o_orderstatus"))
    val t = GraftTable.createAs(spark, tmp(), df,
      Seq(PartitionField("maybe", "identity", "mb")))
    assert(t.toDF().count() == 100)
    assert(t.toDF().filter($"maybe".isNull).count() == df.filter($"maybe".isNull).count())
    // predicate on the partition column still returns exact results
    val expected = df.filter($"maybe" === "O").count()
    assert(t.toDF(Some("maybe = 'O'")).count() == expected)
  }
}
