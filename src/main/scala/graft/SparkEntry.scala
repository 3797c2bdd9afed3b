package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  private def allEntries: Map[String, ((SparkSession, String) => DataFrame, String)] =
    Relational.entries ++ TemporalJoins.entries ++ TextAnalysis.entries ++
      Dedup.entries ++ Similarity.entries ++ Multimodal.entries ++
      TableOps.entries ++ TableOpsExt.entries ++ SkewJoins.entries ++
      Incremental.entries ++ graft.streaming.Streams.entries

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (empty
    * oracle string → rows-only check).
    */
  def oracleSql: Map[String, String] =
    allEntries.collect { case (k, (_, sql)) if sql.nonEmpty => k -> sql }
}
