package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational query surface (SURVEY §2.1) — the workshop's query shapes
  * generalized over the test star schema. Pure DataFrame API: Catalyst owns
  * pushdown, pruning, join strategy; AQE owns runtime shuffle sizing.
  *
  * Money/ratio aggregates are computed over DECIMAL so results are
  * bit-identical to the DuckDB oracle (double summation order would differ).
  */
object Relational {

  private def dec(c: Column, scale: Int = 2): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(18, scale))

  /** q01: TPC-H Q1-shape pricing summary. Workshop analogue: group-by
    * aggregates over the fact table (reference README.md "Partitioning").
    */
  def q01PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum((dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("decimal(38,6)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
