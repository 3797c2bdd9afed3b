package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Manual key-salting for skew joins (SURVEY §5). AQE's skew-join split
  * handles most cases at runtime; explicit salting is the deterministic
  * fallback for pathological hot keys (the `null`/`unknown` user, the
  * boilerplate document) when both sides are too big to broadcast.
  */
object SkewJoins {

  /** Inner equi-join with a salted key: the left (skewed) side gets a
    * deterministic per-row salt in [0, salt); the right side is replicated
    * `salt` times. Hot keys spread across `salt` reducers; results are
    * identical to the plain join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt >= 1)
    // deterministic salt from the full row hash (no rand(): results must be
    // stable under retries/speculative execution)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${salt - 1})")))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** x07 as a driver-gate query: the salted fact⋈dim join must produce
    * results identical to the plain join — the oracle IS the plain join.
    */
  def x07SaltedJoinGate(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).withColumnRenamed("l_orderkey", "o_orderkey")
    val ord = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderstatus"))
    saltedJoin(li, ord, "o_orderkey", 8)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  val x07Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val entries: Map[String, graft.Gate.Entry] = Map(
    "x07_salted_join" -> graft.Gate(x07SaltedJoinGate _, x07Oracle),
  )
}
