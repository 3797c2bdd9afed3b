package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("st01 streaming windowed agg matches batch computation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = Streams.windowedAgg(events).writeStream
      .format("memory").queryName("st01_out").outputMode("append").start()
    try {
      input.addData(
        (ts(5), "click", 1.0), (ts(10), "click", 2.0), (ts(20), "view", 3.0))
      q.processAllAvailable()
      // advance event time well past the watermark so the 10:00 window closes
      input.addData((Timestamp.valueOf("2024-01-01 13:00:00"), "click", 9.0))
      q.processAllAvailable()
      val out = spark.table("st01_out")
        .select($"hour_start", $"event_type", $"n", $"sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(out.contains((Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L, 3.0)))
      assert(out.contains((Timestamp.valueOf("2024-01-01 10:00:00"), "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("st02 flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Ev]
    val q = Streams.sessionize(input.toDS(), gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("st02_out").outputMode("append").start()
    try {
      val base = 1700000000000L
      input.addData(
        Streams.Ev(1L, base), Streams.Ev(1L, base + 60000),             // session A
        Streams.Ev(2L, base))
      q.processAllAvailable()
      input.addData(
        Streams.Ev(1L, base + 2 * 3600 * 1000),                        // closes A, opens B
        Streams.Ev(2L, base + 3 * 3600 * 1000))                        // closes user-2 session
      q.processAllAvailable()
      val out = spark.table("st02_out").as[Streams.Session].collect().toSet
      assert(out.contains(Streams.Session(1L, base, base + 60000, 2)))
      assert(out.contains(Streams.Session(2L, base, base, 1)))
    } finally q.stop()
  }

  test("st03 streaming dedup drops duplicate ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("event_id", "ts", "value")
    val q = Streams.dedupStream(events).writeStream
      .format("memory").queryName("st03_out").outputMode("append").start()
    try {
      input.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0), (1L, ts(2), 1.0))
      q.processAllAvailable()
      input.addData((1L, ts(3), 1.0), (3L, ts(4), 3.0))
      q.processAllAvailable()
      val ids = spark.table("st03_out").select($"event_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }
}
