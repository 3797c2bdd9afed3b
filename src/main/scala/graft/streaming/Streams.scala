package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType, DoubleType, StringType}
import graft.tables.GraftTable

/** Structured Streaming operators (SURVEY §2.7) — the streaming twins of
  * the batch operators (q15 windowed agg, q14 sessionization, d01 dedup).
  * All take unbounded DataFrames from any `readStream` source; state is
  * bounded by watermarks / explicit session state.
  */
object Streams {

  /** st01: tumbling-window aggregate with a watermark (late events beyond
    * 1 hour are dropped; state is bounded). Batch twin: Relational.q15.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** st03: streaming exact dedup — dropDuplicates keyed on the dedup key
    * with a watermark bounding the dedup state. Batch twin: Dedup.d01.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** st01 as a driver-gate query: run the REAL streaming pipeline (file
    * source → watermark → window agg → memory sink) over the events table
    * and return the closed windows. A far-future flush file advances the
    * watermark so every real window emits; the result is then
    * value-identical to the batch q15 oracle (decimal sums, same windows).
    */
  def st01StreamingGate(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_gate").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/batch1.parquet"))

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
    val name = s"st01_gate_${java.util.UUID.randomUUID().toString.take(8)}"
    // state partitioning is pinned at stream start: 8 partitions means 8
    // state-store checkpoint commits per micro-batch instead of 32 — the
    // dominant cost of this short-lived query. (A long-lived production
    // stream would size this to state volume instead.)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try agg.writeStream.format("memory").queryName(name).outputMode("append").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try {
      q.processAllAvailable()
      // flush: one far-future event closes every real window
      import spark.implicits._
      Seq((-1L, 3000000000000000000L, -1L, "flush", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
      .filter(col("event_type") =!= "flush")
      .orderBy(col("hour_start"), col("event_type"))
  }

  /** Same result shape as Relational.q15 — the batch oracle IS the
    * streaming oracle.
    */
  val st01GateOracle: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, event_type,
      |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "st01_stream_windowed_agg" -> ((st01StreamingGate _, st01GateOracle)),
  )

  /** st04: stream into a versioned table — each micro-batch becomes one
    * GraftTable snapshot (append), giving exactly the workshop's
    * commit-per-write history plus time travel over a live stream.
    * Empty batches commit nothing.
    */
  def writeToTable(stream: DataFrame, table: GraftTable, queryName: String): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { table.append(batch); () }
      }
      .start()

  /** st05: continuous CDC upsert into a versioned table — each micro-batch
    * lands as ONE merge-on-read upsert commit (equality-delete the batch
    * keys + append the batch rows, O(batch) work, no table scan), the
    * Flink-CDC-into-Iceberg ingestion shape. Read-side debt is paid by
    * maintenance (`materializeDeletes` / `compactDeleteFiles`).
    *
    * A micro-batch may carry several updates to one key (they share a
    * sequence number, so all would survive the equality delete); the batch
    * is reduced to the LAST row per key — by `seqCol` descending when
    * given, else an arbitrary winner — before the commit, preserving the
    * "latest value per key wins" CDC contract.
    */
  def upsertToTable(stream: DataFrame, table: GraftTable, keyCols: Seq[String],
      queryName: String, seqCol: Option[String] = None): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val latest = seqCol match {
            case Some(c) =>
              val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(c).desc)
              batch.withColumn("__graft_rn", row_number().over(w))
                .filter(col("__graft_rn") === 1).drop("__graft_rn")
            case None => batch.dropDuplicates(keyCols)
          }
          table.upsertMergeOnRead(latest, keyCols); ()
        }
      }
      .start()

  // ------------------------------------------------------- sessionization

  case class Ev(user_id: Long, ts_ms: Long)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** st02: gap-based sessionization with explicit state
    * (flatMapGroupsWithState): a session closes when the next event for
    * the user arrives more than `gapMs` later; the closed session is
    * emitted downstream. Batch twin: Relational.q14.
    */
  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.ts_ms)
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ts_ms - s.last > gapMs =>
                closed += Session(userId, s.start, s.last, s.n)
                cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
              case Some(s) =>
                cur = Some(s.copy(last = math.max(s.last, e.ts_ms), n = s.n + 1))
              case None =>
                cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
