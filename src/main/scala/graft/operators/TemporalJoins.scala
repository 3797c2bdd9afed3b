package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Temporal join operators Spark lacks natively, composed Spark-first
  * (SURVEY §2.1 extension): as-of (point-in-time) join and bucketed range
  * join. Neither materializes a theta-join: the as-of join is one
  * union+window shuffle, the range join explodes bounded time buckets and
  * equi-joins on them — both shapes scale linearly with input at 100 TB.
  */
object TemporalJoins {

  /** As-of join via union + last-non-null window: for every left row, the
    * latest right value with rightTime <= leftTime for the same key. Right
    * rows must be unique per (key, time) — pre-aggregate if not. One
    * shuffle on (key); no per-row range scan.
    */
  def asofJoin(
      left: DataFrame, leftTimeMs: String,
      right: DataFrame, rightTimeMs: String,
      key: String, valueCol: String): DataFrame = {
    val lTagged = left.select(
      col(key), col(leftTimeMs).as("__t"), lit(null).cast("double").as("__v"),
      lit(0).as("__is_ref"), struct(left.columns.map(col): _*).as("__row"))
    val rTagged = right.select(
      col(key), col(rightTimeMs).as("__t"), col(valueCol).cast("double").as("__v"),
      lit(1).as("__is_ref"), lit(null).cast(lTagged.schema("__row").dataType).as("__row"))
    // reference rows sort before same-instant left rows (asof is inclusive)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__is_ref").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__is_ref") === 0)
      .select(col("__row.*"), col("__asof").as(valueCol))
  }

  /** q18: as-of join — every event picks up the value of the user's most
    * recent purchase at or before its timestamp (inner semantics; events
    * before any purchase are dropped). Time math on epoch millis so both
    * engines floor identically from their native precision.
    */
  def q18AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ems"))
    val checkpoints = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), unix_millis(col("ts")).as("cms"))
      .agg(max(col("value")).as("cp_value"))
    asofJoin(ev, "ems", checkpoints, "cms", "user_id", "cp_value")
      .filter(col("cp_value").isNotNull)
      .select(col("event_id"), col("cp_value"))
      .orderBy(col("event_id"))
  }

  val q18Oracle: String =
    """WITH cp AS (
      |  SELECT user_id, epoch_ms(ts) AS cms, MAX(value) AS cp_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |e AS (SELECT event_id, user_id, epoch_ms(ts) AS ems FROM events)
      |SELECT e.event_id, cp.cp_value
      |FROM e ASOF JOIN cp ON e.user_id = cp.user_id AND e.ems >= cp.cms
      |ORDER BY e.event_id""".stripMargin

  /** q19: bucketed range join — count each user's events inside a 45-minute
    * window after every purchase. Ranges explode into the (bounded number
    * of) 15-minute buckets they cover; events equi-join on (user, bucket),
    * then the exact interval filter applies. No inequality join, no
    * broadcast of the big side.
    */
  def q19RangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val bucketMs = 900000L // 15 min
    val spanMs = 2700000L  // 45 min
    val ranges = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("start_ms")).distinct()
      .withColumn("end_ms", col("start_ms") + spanMs)
    val exploded = ranges.withColumn("bucket",
      explode(expr(s"sequence(start_ms div $bucketMs, (end_ms - 1) div $bucketMs)")))
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ems"))
      .withColumn("bucket", expr(s"ems div $bucketMs"))
    exploded.join(ev, Seq("user_id", "bucket"), "left")
      .withColumn("hit",
        when(col("ems") >= col("start_ms") && col("ems") < col("end_ms"), col("event_id")))
      .groupBy(col("user_id"), col("start_ms"))
      .agg(count(col("hit")).as("n_events"))
      .orderBy(col("user_id"), col("start_ms"))
  }

  val q19Oracle: String =
    """WITH r AS (
      |  SELECT DISTINCT user_id, epoch_ms(ts) AS start_ms,
      |    epoch_ms(ts) + 2700000 AS end_ms
      |  FROM events WHERE event_type = 'purchase'),
      |e AS (SELECT user_id, event_id, epoch_ms(ts) AS ems FROM events)
      |SELECT r.user_id, r.start_ms, COUNT(e.event_id) AS n_events
      |FROM r LEFT JOIN e
      |  ON e.user_id = r.user_id AND e.ems >= r.start_ms AND e.ems < r.end_ms
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val entries: Map[String, graft.Gate.Entry] = Map(
    "q18_asof_join"  -> graft.Gate(q18AsofJoin _, q18Oracle),
    "q19_range_join" -> graft.Gate(q19RangeJoin _, q19Oracle),
  )
}
