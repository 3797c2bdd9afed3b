package graft.tables

import graft.SparkSpec
import graft.sources.GraftSql
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The reference's own documented engine limitations
  * (reference limitations.md), each spec'd as WORKING here — the point of
  * re-expressing the workshop Spark-first is that these stop being
  * limitations.
  */
class LimitationsSpec extends SparkSpec {
  import spark.implicits._

  test("limitations.md #1: predicate on a post-evolution column reads old files (Impala errors)") {
    // CREATE (c1 INT); INSERT; ADD COLUMN ts TIMESTAMP; INSERT; filter on ts
    val g = new GraftSql(spark, Files.createTempDirectory("graft_lim1").toString)
    g.sql("CREATE TABLE bar (c1 INT)")
    g.sql("INSERT INTO bar VALUES (1)")
    g.sql("ALTER TABLE bar ADD COLUMN ts TIMESTAMP")
    g.sql("INSERT INTO bar VALUES (2, \"2022-01-01 00:00:00\")")
    val out = g.sql("SELECT * FROM bar WHERE ts >= \"2022-01-01\"")
    assert(out.count() == 1) // no SchemaNode error; old file contributes null ts
    assert(g.sql("SELECT * FROM bar").count() == 2)
  }

  test("limitations.md #2: partition pruning is exact, not 1/1 (Impala shows all-partitions)") {
    val t = GraftTable.createAs(spark,
      Files.createTempDirectory("graft_lim2").toString + "/t",
      Seq(1, 2, 3).toDF("c1"),
      Seq(PartitionField("c1", "identity", "c1_p")))
    assert(t.currentFiles().map(_.partitionValues("c1_p")).toSet == Set("1", "2", "3"))
    // the scan plan knows it reads exactly 2 of 3 partitions
    val planned = t.plannedFiles("c1 BETWEEN 1 AND 2")
    assert(planned.size == 2, s"expected 2/3 partitions, planned ${planned.size}")
    assert(t.toDF(Some("c1 BETWEEN 1 AND 2")).count() == 2)
  }

  test("limitations.md #3: in-place migration keeps timestamp bounds (Hive loses them)") {
    // three single-day files, migrated in place — footer-derived stats must
    // carry timestamp min/max so the planner can skip files
    val src = Files.createTempDirectory("graft_lim3").toString + "/src"
    Seq("2022-01-01 00:00:00", "2022-01-02 00:00:00", "2022-01-03 00:00:00")
      .zipWithIndex.foreach { case (ts, i) =>
        Seq(ts).toDF("s").select($"s".cast("timestamp").as("t"))
          .coalesce(1).write.mode(if (i == 0) "overwrite" else "append").parquet(src)
      }
    val t = GraftTable.migrateInPlace(spark,
      Files.createTempDirectory("graft_lim3t").toString + "/t", src)
    val all = t.currentFiles()
    assert(all.size == 3)
    assert(all.forall(_.stats.contains("t")), "timestamp bounds must come from footers")
    val planned = t.plannedFiles("t < TIMESTAMP '2022-01-02 00:00:00'")
    assert(planned.size == 1, s"expected 1/3 files, planned ${planned.size}")
    assert(t.toDF(Some("t < TIMESTAMP '2022-01-02 00:00:00'")).count() == 1)
  }
}
