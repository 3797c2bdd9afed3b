package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, unix_millis}

/** STATEFUL streaming chunk probe — the sibling of [[StreamScaleProbe]]
  * (which pins the stateless append path): does the SESSIONIZER's
  * per-batch cost track the batch as state accumulates, or does live
  * state tax every later batch?
  *
  * Method: the events corpus is staged ONCE as `nFiles` contiguous
  * TIME-RANGE chunks (repartitionByRange on event time, sorted within;
  * files land in the watch dir with strictly increasing mtimes so the
  * file source replays them in event-time order). The same staged bytes
  * run through [[graft.streaming.Streams.sessionize]]
  * (flatMapGroupsWithState) twice: one mega-batch vs one-file batches.
  * Ordered arrival makes the closed-session multiset IDENTICAL across
  * chunkings (a session closes exactly when a later-than-gap event
  * arrives, whichever batch carries it) — the probe REQUIREs equal
  * session counts, so the cost series is measured on semantically equal
  * work. Per-batch `triggerExecution` and the state store's
  * `numRowsTotal` series come from the query progress events.
  *
  * The scale claim this pins: state rows plateau at the live-user
  * population (they do NOT grow with batch count), and per-batch wall
  * tracks batch events + touched state, never the corpus.
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES", "16").toInt
    val spark = GraftSession.tune(SparkSession.builder().master(s"local[$cpus]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // recentProgress retains only numRecentProgressUpdates entries
    // (default 100): at SPARK_GRAFT_PROBE_FILES > 100 the batch_sec /
    // state_rows series would silently truncate to the tail (r19 ADVICE
    // #3). Sized to the one-file-per-batch run plus slack, checked by a
    // require on the collected series below.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      math.max(100, nFiles + 16).toString)
    import spark.implicits._

    // through the schema-normalizing loader (raw driver parquet may carry
    // TIMESTAMP_NTZ — the same reason the st gates never read it raw)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
    val staged = TempDirs.create("graft_state_probe_src").toString
    ev.repartitionByRange(nFiles, col("ts_ms"))
      .sortWithinPartitions("ts_ms")
      .write.mode("overwrite").parquet(staged)
    // range partition i holds the i-th time slice and writes part-0000i:
    // filename order IS event-time order
    val parts = new java.io.File(staged).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val schema = spark.read.parquet(staged).schema
    val nEvents = ev.count()

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val results = Seq(nFiles, 1).map { perTrigger =>
      val dir = TempDirs.create("graft_state_probe_in").toString
      parts.zipWithIndex.foreach { case (f, i) =>
        val tgt = java.nio.file.Paths.get(dir, f"b$i%03d.parquet")
        java.nio.file.Files.copy(f.toPath, tgt)
        // strictly increasing mtimes: the file source replays in order
        tgt.toFile.setLastModified(1700000000000L + i * 60000L); ()
      }
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", perTrigger.toString).parquet(dir)
        .as[graft.streaming.Streams.Ev]
      val outDir = TempDirs.create("graft_state_probe_out").toString
      val t0 = System.nanoTime()
      val q = graft.streaming.Streams.sessionize(stream, 1800000L).toDF()
        .writeStream.format("parquet")
        .option("path", s"$outDir/data")
        .option("checkpointLocation", s"$outDir/ckpt")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      // truncation must fail loudly, never skew the ledger silently: the
      // one-file-per-batch run produces exactly nFiles data batches
      require(perTrigger != 1 || progress.size == nFiles,
        s"progress series truncated or batch count off: " +
          s"got ${progress.size} data batches, expected $nFiles — raise " +
          "spark.sql.streaming.numRecentProgressUpdates")
      val batchSec = progress.map(p =>
        p.durationMs.getOrDefault("triggerExecution", 0L) / 1e3)
      val stateRows = progress.map(p =>
        p.stateOperators.headOption.map(_.numRowsTotal).getOrElse(-1L))
      val sessions = spark.read
        .schema("user_id LONG, start_ms LONG, end_ms LONG, n_events LONG")
        .parquet(s"$outDir/data").count()
      (perTrigger, wall, batchSec, stateRows, sessions)
    }
    // semantic pin: ordered arrival ⇒ both chunkings close the same sessions
    val counts = results.map(_._5).distinct
    require(counts.size == 1,
      s"chunked sessionization diverged from single-batch: $counts")

    val detail = results.map { case (c, wall, bs, sr, sess) =>
      s"""{"max_files_per_trigger":$c,"wall_sec":${fmt(wall)},""" +
        s""""n_batches":${bs.size},"closed_sessions":$sess,""" +
        s""""batch_sec":[${bs.map(fmt).mkString(",")}],""" +
        s""""state_rows":[${sr.mkString(",")}]}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"stream_state_probe","sf":"$sfDir","n_files":$nFiles,""" +
        s""""events":$nEvents,"runs":$detail}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "stream_state_probe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
