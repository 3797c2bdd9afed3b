package graft.sources

import org.apache.spark.sql.SparkSession
import graft.functions.GraftExtensions

/** SQL-surface bootstrap: the reference workshop drives everything through
  * SQL, so graft exposes the same — every test table becomes a temp view
  * and the graft functions are registered, after which the full query
  * surface is available via `spark.sql(...)`.
  */
object Catalog {

  /** Register all test tables under `sfDir` as temp views + graft SQL
    * functions. Returns the session for chaining.
    */
  def registerAll(spark: SparkSession, sfDir: String): SparkSession = {
    Tables.all.foreach { name =>
      Tables.load(spark, sfDir, name).createOrReplaceTempView(name)
    }
    GraftExtensions.register(spark)
    spark
  }
}
