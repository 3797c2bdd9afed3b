package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators for training-data pipelines (SURVEY §2.3).
  *
  * The exact variants are hash-groupBy dedups: one shuffle on the dedup
  * key, map-side partial aggregation, no row ever leaves its reducer — the
  * shape that scales linearly to 100 TB. The corpus is self-doubled with
  * shifted ids so the op is observable on the driver's dup-free testdata.
  */
object Dedup {

  /** The test corpus doubled: every text appears twice under two doc_ids. */
  private def doubledCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"), col("source"))
    d.unionAll(d.select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"), col("source")))
  }

  // ---------------------------------------------------------------- d01

  /** d01: exact dedup on text — keep the lowest doc_id per distinct text,
    * count copies. */
  def d01DedupExact(spark: SparkSession, sfDir: String): DataFrame =
    doubledCorpus(spark, sfDir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  val d01Oracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
      |SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      |FROM corpus GROUP BY text ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d02

  /** d02: composite-key dedup stats per source (docs vs distinct texts vs
    * surviving rows after keep-first dedup). */
  def d02DedupExactMulti(spark: SparkSession, sfDir: String): DataFrame =
    doubledCorpus(spark, sfDir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"),
        (count(lit(1)) - countDistinct(col("text"))).as("n_duplicates"))
      .orderBy(col("source"))

  val d02Oracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text, source FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT text) AS n_distinct_texts,
      |  COUNT(*) - COUNT(DISTINCT text) AS n_duplicates
      |FROM corpus GROUP BY source ORDER BY source""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "d01_dedup_exact"       -> ((d01DedupExact _, d01Oracle)),
    "d02_dedup_exact_multi" -> ((d02DedupExactMulti _, d02Oracle)),
  )
}
