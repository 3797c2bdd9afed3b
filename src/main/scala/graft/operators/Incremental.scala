package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.tables.{GraftTable, IncrementalAggView}
import java.nio.file.Files

/** SURVEY §2.2 — mv01: incremental materialized-view maintenance.
  * A grouped count+sum aggregate over a versioned table is kept current by
  * folding the row-level changelog of each commit into the stored view
  * ([[graft.tables.IncrementalAggView]]) — the capability the reference's
  * stack gets from a streaming engine over Iceberg CDC, re-expressed as
  * batch-incremental refresh with an exactly-once cursor.
  *
  * The gate drives the base table through the three commit shapes the
  * changelog distinguishes (append manifest-diff, copy-on-write delete
  * file-diff, merge-on-read upsert), refreshing after each, and emits the
  * final view rows plus the per-refresh changelog row counts — all
  * input-derivable, so DuckDB recomputes them from the same capped input.
  */
object Incremental {

  private def tmp(): String =
    Files.createTempDirectory("graft_mv").toString + "/t"

  private def orders(spark: SparkSession, sfDir: String, n: Int): DataFrame =
    Tables.orders(spark, sfDir).orderBy(col("o_orderkey")).limit(n)

  private def cappedSql(n: Int): String =
    s"(SELECT * FROM orders ORDER BY o_orderkey LIMIT $n)"

  def mv01IncrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val base = GraftTable.createAs(spark, tmp(), orders(spark, sfDir, 3000))
    val mv = IncrementalAggView.create(spark, tmp(), base,
      Seq("o_orderstatus"), Seq("o_totalprice"))

    base.append(orders(spark, sfDir, 500)
      .withColumn("o_orderkey", col("o_orderkey") + 900000000L))
    val r1 = mv.refresh()
    base.delete("o_orderkey % 7 = 0")
    val r2 = mv.refresh()
    base.upsertMergeOnRead(orders(spark, sfDir, 200)
      .withColumn("o_totalprice", lit(1111.5)), Seq("o_orderkey"))
    val r3 = mv.refresh()

    mv.toDF()
      .select(col("o_orderstatus"), col("cnt"),
        col("sum_o_totalprice").cast("double").as("sum_price"))
      .withColumn("chg_append", lit(r1))
      .withColumn("chg_delete", lit(r2))
      .withColumn("chg_upsert", lit(r3))
  }

  /** The oracle replays the same commit sequence in SQL: base ∪ shifted
    * append, minus the CoW-deleted keys, with the upsert keys replaced.
    * Changelog row counts: the append contributes its 500 inserts; the
    * delete one 'delete' row per matching key; the upsert one 'delete' per
    * key still live plus its 200 inserts.
    */
  val mv01Oracle: String =
    s"""WITH base0 AS (
       |  SELECT * FROM ${cappedSql(3000)}
       |  UNION ALL
       |  SELECT * REPLACE (o_orderkey + 900000000 AS o_orderkey)
       |  FROM ${cappedSql(500)}
       |), afterdel AS (
       |  SELECT * FROM base0 WHERE o_orderkey % 7 <> 0
       |), ups AS (
       |  SELECT * REPLACE (1111.5 AS o_totalprice) FROM ${cappedSql(200)}
       |), final AS (
       |  SELECT * FROM afterdel
       |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM ups)
       |  UNION ALL SELECT * FROM ups
       |)
       |SELECT o_orderstatus, COUNT(*) AS cnt,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
       |  (SELECT COUNT(*) FROM ${cappedSql(500)}) AS chg_append,
       |  (SELECT COUNT(*) FROM base0 WHERE o_orderkey % 7 = 0) AS chg_delete,
       |  (SELECT COUNT(*) FROM afterdel
       |     WHERE o_orderkey IN (SELECT o_orderkey FROM ups))
       |    + (SELECT COUNT(*) FROM ups) AS chg_upsert
       |FROM final GROUP BY o_orderstatus""".stripMargin

  val entries: Map[String, graft.Gate.Entry] = Map(
    "mv01_incremental_agg" -> graft.Gate(mv01IncrementalAgg _, mv01Oracle),
  )
}
